"""Export a trained checkpoint as a self-contained serving artifact.

Builds the full raw-input serving program (on-device STFT frontend +
model, weights baked in) at fixed serving shapes and serializes it with
``jax.export`` into a single zip artifact — deployment then needs only
jax + the artifact, no model code and no checkpoint restore (see
avvad_tpu/export.py). Replaces the reference's ship-Python-code +
torch.load deployment (evaluate_AV_net.py:252-290) with the XLA-native
compile-once model.

Example:
  python scripts/export_serving.py --modality av --checkpoint runs/av \
      --batch 64 --frames 512 --out av_serving.avvadx
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    # the ambient TPU-tunnel sitecustomize pins jax_platforms
    # programmatically; honor an explicit env override (e.g. cpu CI)
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--modality", choices=["audio", "raw-audio", "video", "av"],
                   required=True)
    p.add_argument("--checkpoint", required=True, help="Orbax checkpoint dir")
    p.add_argument("--out", required=True, help="artifact path (.avvadx zip)")
    p.add_argument("--batch", type=int, nargs="+", default=[64],
                   help="serving batch size(s); one artifact entry each")
    p.add_argument("--frames", type=int, default=512,
                   help="STFT frames per utterance (static serving length)")
    p.add_argument("--video-fps", type=float, default=0.0,
                   help="if > 0, export the unique-frame serving layout: "
                        "video input at this source rate plus a baked "
                        "fps-resample gather onto the 62.5 fps timeline")
    p.add_argument("--lstm-hidden", type=int, default=1024)
    p.add_argument("--lstm-layers", type=int, default=2)
    p.add_argument("--y-dim", type=int, default=1,
                   help="label dimension of the trained head (must match "
                        "the checkpoint, e.g. 2 for 2-class IBM labels)")
    p.add_argument("--mcb", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--mcb-hoist", action="store_true",
                   help="pre-fold MCB sketches (identical math, fewer "
                        "per-step matmuls)")
    p.add_argument("--hop-dft", action="store_true",
                   help="hop-block DFT frontend (exact, ~4x fewer "
                        "frontend matmul FLOPs)")
    p.add_argument("--pallas-lstm", action="store_true",
                   help="Pallas LSTM kernel — native-platform artifacts "
                        "only (Mosaic custom calls are not portable)")
    p.add_argument("--lstm-state-quant", choices=["none", "bf16", "int8"],
                   default="none",
                   help="quantized LSTM recurrence state (requires "
                        "--pallas-lstm; quality gates in QUALITY.md)")
    p.add_argument("--tower-int8", action="store_true",
                   help="W8A8 video tower (video/av; the shipped serving "
                        "config uses static mode)")
    p.add_argument("--tower-quant-mode", default="static",
                   choices=["dynamic", "static"],
                   help="static bakes calibrated activation scales into "
                        "the artifact (needs --data-root for calibration)")
    p.add_argument("--tower-stem-int8", action="store_true")
    p.add_argument("--data-root", default="data",
                   help="processed-data root for static-int8 calibration")
    p.add_argument("--dataset-size", choices=["subset", "complete"],
                   default="subset")
    p.add_argument("--labels", default="vad_labels")
    p.add_argument("--calibrate-split", default="train")
    p.add_argument("--calibrate-utts", type=int, default=8)
    p.add_argument("--platforms", default="",
                   help="comma-separated lowering platforms (e.g. cpu,tpu); "
                        "default: the current backend")
    args = p.parse_args()
    if args.mcb_hoist and (args.modality != "av" or not args.mcb):
        p.error("--mcb-hoist requires --modality av with --mcb")
    if args.lstm_state_quant != "none" and not args.pallas_lstm:
        p.error("--lstm-state-quant requires --pallas-lstm")
    if args.tower_int8 and args.modality not in ("video", "av"):
        p.error("--tower-int8 requires --modality video/av")
    if args.tower_stem_int8 and not args.tower_int8:
        p.error("--tower-stem-int8 requires --tower-int8")
    return args


def main():
    args = parse_args()
    from avvad_tpu.export import ServingArtifact, make_waveform_serving_fn
    from avvad_tpu.models import AVVAD, AudioVAD, RawAudioVAD, VideoVAD
    from avvad_tpu.train import create_train_state, restore_checkpoint

    fs, hop = 16000, 256
    t = args.frames
    n_samples = hop * (t - 1) + 1024

    if args.modality == "audio":
        model = AudioVAD(y_dim=args.y_dim,
                         lstm_hidden_size=args.lstm_hidden,
                         lstm_layers=args.lstm_layers,
                         use_pallas_lstm=args.pallas_lstm)
        example_init = (jnp.zeros((1, 8, 513)),)
    elif args.modality == "raw-audio":
        model = RawAudioVAD(y_dim=args.y_dim,
                            lstm_hidden_size=args.lstm_hidden,
                            lstm_layers=args.lstm_layers, out_frames=t)
        example_init = (jnp.zeros((1, n_samples)),)
    elif args.modality == "video":
        model = VideoVAD(y_dim=args.y_dim,
                         lstm_hidden_size=args.lstm_hidden,
                         lstm_layers=args.lstm_layers,
                         use_pallas_lstm=args.pallas_lstm,
                         lstm_state_quant=args.lstm_state_quant,
                         tower_int8=args.tower_int8,
                         tower_quant_mode=args.tower_quant_mode,
                         tower_stem_int8=args.tower_stem_int8)
        example_init = (jnp.zeros((1, 4, 67, 67)),)
    else:
        model = AVVAD(y_dim=args.y_dim,
                      lstm_hidden_size=args.lstm_hidden,
                      lstm_layers=args.lstm_layers, use_mcb=args.mcb,
                      use_pallas_lstm=args.pallas_lstm,
                      lstm_state_quant=args.lstm_state_quant,
                      tower_int8=args.tower_int8,
                      tower_quant_mode=args.tower_quant_mode,
                      tower_stem_int8=args.tower_stem_int8,
                      mcb_folded_vars=False)
        example_init = (jnp.zeros((1, 4, 513)), jnp.zeros((1, 4, 67, 67)))

    state = create_train_state(model, jax.random.PRNGKey(0), example_init)
    state, norm_stats, epoch = restore_checkpoint(args.checkpoint, state,
                                                  with_opt=False)
    print(f"restored checkpoint epoch {epoch}")

    if args.tower_int8 and args.tower_quant_mode == "static":
        # bake calibrated activation scales into the artifact (the shipped
        # serving config), mirroring scripts/evaluate.py's calibration
        from avvad_tpu.data import AudioVisualSource, VideoSequenceSource
        from avvad_tpu.evaluate import calibrate_quant_scales

        processed = os.path.join(args.data_root, args.dataset_size,
                                 "processed/")
        if args.modality == "video":
            cal_source = VideoSequenceSource(processed, args.calibrate_split,
                                             args.labels)
        else:
            cal_source = AudioVisualSource(processed, args.calibrate_split,
                                           args.dataset_size, args.labels)
        state = calibrate_quant_scales(state, model, cal_source,
                                       args.modality, norm_stats=norm_stats,
                                       n_utts=args.calibrate_utts)
        print(f"calibrated int8 scales on {args.calibrate_utts} "
              f"{args.calibrate_split} utterances")
    variables = state.variables()

    if args.mcb_hoist and args.modality == "av" and args.mcb:
        from avvad_tpu.models.mcb import fold_sketch_collection

        model = model.clone(mcb_folded_vars=True)
        variables = fold_sketch_collection(variables)

    frame_idx = None
    t_video = t
    if args.video_fps > 0 and args.modality in ("video", "av"):
        from avvad_tpu.processing.video import fps_resample_indices

        frame_rate = fs / hop
        t_src = int(np.ceil(t * args.video_fps / frame_rate))
        while len(fps_resample_indices(t_src, args.video_fps,
                                       frame_rate)) < t:
            t_src += 1
        frame_idx = jnp.asarray(
            fps_resample_indices(t_src, args.video_fps, frame_rate)[:t])
        t_video = t_src

    fn = make_waveform_serving_fn(model, variables, t_frames=t,
                                  hop_dft=args.hop_dft,
                                  norm_stats=norm_stats,
                                  video_frame_indices=frame_idx)

    def example(b):
        wave = jnp.zeros((b, n_samples), dtype=jnp.float32)
        video = jnp.zeros((b, t_video, 67, 67), dtype=jnp.float32)
        if args.modality in ("audio", "raw-audio"):
            return (wave,)
        if args.modality == "video":
            return (video,)
        return (wave, video)

    platforms = [s for s in args.platforms.split(",") if s] or None
    artifact = ServingArtifact.build(
        {f"b{b}": (fn, example(b)) for b in args.batch},
        meta={"modality": args.modality, "frames": t,
              "n_samples": n_samples, "video_frames": t_video,
              "checkpoint": os.path.abspath(args.checkpoint),
              "epoch": int(epoch) if epoch is not None else None,
              "hop_dft": args.hop_dft, "mcb_hoist": args.mcb_hoist,
              "tower_int8": args.tower_int8,
              "tower_quant_mode": (args.tower_quant_mode
                                   if args.tower_int8 else None),
              "lstm_state_quant": args.lstm_state_quant,
              "video_fps": args.video_fps or None},
        platforms=platforms)
    artifact.save(args.out)
    sizes = {n: artifact.input_shapes(n) for n in artifact.entries}
    print(f"wrote {args.out}: entries {sizes}")


if __name__ == "__main__":
    main()
