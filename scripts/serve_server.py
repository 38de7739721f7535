#!/usr/bin/env python
"""Streaming VAD TCP server.

Serves a trained checkpoint over TCP, one connection per stream. Audio
mode (AudioVAD): raw float32 LE PCM in. Audio-visual mode (AVVAD,
--modality av): framed messages ([type][u32 len][payload], A = float32
PCM, P = int16 PCM, V = 67x67 float32 lip frames, U = uint8 lip frames)
interleaved per connection. Video-only mode (VideoVAD, --modality
video): the framed protocol restricted to V/U messages. All emit raw
float32 LE per-frame speech probabilities (see avvad_tpu.server for the
wire protocol). A serving capability the reference lacks entirely (its
closest analogue is the batch prediction writer,
evaluate_audio_net.py:107-180).

Example:
  python scripts/serve_server.py --checkpoint runs/audio --port 7474 \
      --streams 32 --block-frames 16
  python scripts/serve_server.py --modality av --checkpoint runs/av \
      --streams 16
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--modality", choices=["audio", "video", "av"],
                   default="audio")
    p.add_argument("--checkpoint",
                   help="AudioVAD/AVVAD checkpoint (model dir or epoch dir)")
    p.add_argument("--artifact",
                   help="serve from an exported multistream artifact "
                        "(export.export_multistream_server) instead of a "
                        "checkpoint: no model code, no restore; geometry "
                        "(streams/block/modality) comes from the artifact")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7474)
    p.add_argument("--streams", type=int, default=32,
                   help="max concurrent connections (one device batch row each)")
    p.add_argument("--block-frames", type=int, default=16,
                   help="frames per device step (latency/throughput knob)")
    p.add_argument("--lstm-hidden", type=int, default=1024)
    p.add_argument("--lstm-layers", type=int, default=2)
    p.add_argument("--y-dim", type=int, default=1)
    p.add_argument("--mcb", action=argparse.BooleanOptionalAction, default=True,
                   help="AV fusion: MCB (default) or concat")
    p.add_argument("--mcb-hoist", action="store_true",
                   help="pre-fold MCB sketches into the DFT bases "
                        "(identical math, fewer per-tick matmuls; av only)")
    p.add_argument("--audio-span", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="span audio wire: ship each tick's raw contiguous "
                        "sample span to the device (~3.4x less audio "
                        "payload; on-device framing, bit-exact; audio/av). "
                        "Default ON for audio/av: the server's sync ticks "
                        "measured 46.1 -> 41.5 ms at 32 streams "
                        "(BENCH_NOTES round-3 hardware results)")
    p.add_argument("--audio-int16", action="store_true",
                   help="int16 PCM device wire (requires the span audio "
                        "wire): half the audio payload, bit-exact for "
                        "16-bit sources; clients should send type-P "
                        "(int16) audio messages, or raw int16 in audio "
                        "mode — float A payloads are quantized "
                        "server-side")
    p.add_argument("--hop-dft", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="hop-block DFT frontend on the span (implies "
                        "--audio-span; ~4x fewer frontend matmul FLOPs, "
                        "probability-exact — QUALITY.md). Default ON for "
                        "audio/av: sync ticks measured 41.5 -> 33.7 ms")
    p.add_argument("--video-fps", type=float, default=0.0,
                   help="video/av: ingest camera-rate video (e.g. 30) — "
                        "clients send source-rate lip frames, the tower "
                        "runs on each block's unique frames, features "
                        "gather onto the 62.5 fps timeline on device "
                        "(bit-exact vs pre-upsampled feeding, ~2.08x less "
                        "video payload and tower compute at 30 fps)")
    p.add_argument("--pipelined", action="store_true",
                   help="two-deep pipelined ticks: results ship one block "
                        "later, consecutive ticks' transfers and compute "
                        "overlap (~25-42%% lower tick wall time measured "
                        "at 32 streams; see BENCH_NOTES round 4)")
    p.add_argument("--data-parallel", type=int, default=0,
                   help="shard streams over a data-axis mesh of this size "
                        "(must divide --streams; per-stream ticks need no "
                        "collectives)")
    args = p.parse_args()
    if not args.checkpoint and not args.artifact:
        p.error("one of --checkpoint / --artifact is required")
    # span + hop-DFT default ON for the modalities they apply to (the
    # server's ticks are always sync, where both measured strictly
    # faster); video-only servers have no audio wire
    if args.audio_span is None:
        args.audio_span = args.modality != "video"
    if args.hop_dft is None:
        args.hop_dft = args.modality != "video"
    if args.hop_dft and not args.audio_span:
        p.error("--hop-dft requires the span audio wire (drop "
                "--no-audio-span or pass --no-hop-dft)")
    if args.audio_int16 and not args.audio_span:
        p.error("--audio-int16 requires the span audio wire")
    if args.audio_int16 and args.modality == "video":
        p.error("--audio-int16 applies to audio/av modalities only")
    if args.audio_span and args.modality == "video":
        p.error("--audio-span applies to audio/av modalities only")

    import jax
    import jax.numpy as jnp

    from avvad_tpu.server import VADServer
    from avvad_tpu.train import create_train_state
    from avvad_tpu.train.checkpoint import restore_checkpoint
    from avvad_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    if args.artifact:
        from avvad_tpu.export import load_multistream_server

        streamer = load_multistream_server(args.artifact)
        server = VADServer(streamer, host=args.host, port=args.port,
                       pipelined=args.pipelined)
        print(f"listening on {server.address[0]}:{server.address[1]} "
              f"(artifact {args.artifact}: {streamer.n} stream slots, "
              f"block={streamer.block_frames} frames)")
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            server.close()
        return

    if args.modality == "audio":
        from avvad_tpu.models import AudioVAD
        from avvad_tpu.serve import MultiStreamVAD

        model = AudioVAD(y_dim=args.y_dim, lstm_hidden_size=args.lstm_hidden,
                         lstm_layers=args.lstm_layers)
        example = (jnp.zeros((1, 8, 513)),)
        make_streamer = MultiStreamVAD
    elif args.modality == "video":
        from avvad_tpu.models import VideoVAD
        from avvad_tpu.serve import MultiStreamVideoVAD

        model = VideoVAD(y_dim=args.y_dim, lstm_hidden_size=args.lstm_hidden,
                         lstm_layers=args.lstm_layers)
        example = (jnp.zeros((1, 8, 67, 67)),)
        make_streamer = MultiStreamVideoVAD
    else:
        from avvad_tpu.models import AVVAD
        from avvad_tpu.serve import MultiStreamAVVAD

        model = AVVAD(y_dim=args.y_dim, lstm_hidden_size=args.lstm_hidden,
                      lstm_layers=args.lstm_layers, use_mcb=args.mcb)
        example = (jnp.zeros((1, 8, 513)), jnp.zeros((1, 8, 67, 67)))
        make_streamer = MultiStreamAVVAD

    state = create_train_state(model, jax.random.PRNGKey(0), example)
    state, norm_stats, epoch = restore_checkpoint(args.checkpoint, state,
                                                  with_opt=False)
    print(f"serving checkpoint epoch {epoch} "
          f"(norm stats: {sorted(norm_stats) if norm_stats else None})")

    variables = state.variables()
    if args.mcb_hoist:
        if args.modality != "av" or not args.mcb:
            p.error("--mcb-hoist requires --modality av with --mcb")
        from avvad_tpu.models.mcb import fold_sketch_collection

        model = model.clone(mcb_folded_vars=True)
        variables = fold_sketch_collection(variables)
        print("MCB sketches pre-folded (hoisted fold)")

    mesh = None
    if args.data_parallel:
        from avvad_tpu.parallel import make_mesh

        mesh = make_mesh(n_data=args.data_parallel, n_model=1)
        print(f"serving mesh: streams sharded over {args.data_parallel} "
              "devices")
    wire_kw = ({"span_wire": args.audio_span, "hop_dft": args.hop_dft,
                "audio_int16": args.audio_int16}
               if args.modality != "video" else {})
    if args.video_fps:
        if args.modality == "audio":
            p.error("--video-fps applies to the video/av modalities only")
        wire_kw["video_fps"] = args.video_fps
    streamer = make_streamer(model, variables, n_streams=args.streams,
                             norm_stats=norm_stats,
                             block_frames=args.block_frames, mesh=mesh,
                             **wire_kw)
    server = VADServer(streamer, host=args.host, port=args.port,
                       pipelined=args.pipelined)
    print(f"listening on {server.address[0]}:{server.address[1]} "
          f"({args.modality}, {args.streams} stream slots, "
          f"block={args.block_frames} frames)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.close()


if __name__ == "__main__":
    main()
