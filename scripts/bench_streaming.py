"""Streaming-serving latency benchmark: MultiStreamVAD server ticks.

Measures the per-tick wall time of N concurrent real-time streams pushing
16 kHz PCM through the audio VAD (block = `--block-frames` STFT frames,
256 ms of audio at the default 16), in the two serving modes:

- sync   : fetch=True — every tick synchronizes and returns numpy
           probabilities (lowest per-stream latency; what a
           request/response front does);
- lazy   : fetch=False — ticks leave results on device and the dispatch
           queue pipelines across ticks (throughput mode; results are
           fetched one tick late, adding one block of latency).

Also reports the host-side block-assembly cost alone (native hub vs the
pure-Python fallback), isolating VERDICT r1 weak-#6.

Usage: python scripts/bench_streaming.py [--streams 32] [--ticks 40]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from avvad_tpu.models import AudioVAD
from avvad_tpu.serve import MultiStreamVAD
from avvad_tpu.server import quantize_pcm_int16


def make_server(n_streams: int, block_frames: int, native: bool,
                span_wire: bool = False, hop_dft: bool = False,
                audio_int16: bool = False):
    model = AudioVAD(y_dim=1, lstm_hidden_size=1024, lstm_layers=2,
                     use_pallas_lstm=True)
    feats = jnp.zeros((n_streams, block_frames, 513), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), feats)
    return MultiStreamVAD(model, variables, n_streams,
                          block_frames=block_frames, native=native,
                          span_wire=span_wire, hop_dft=hop_dft,
                          audio_int16=audio_int16)


def run(server: MultiStreamVAD, n_ticks: int, chunk: np.ndarray,
        mode) -> float:
    """Feed every stream one block of audio per tick; returns s/tick.
    mode: True = sync fetch per tick, False = lazy (defer all fetches),
    "pipelined" = two-deep tick_pipelined (fetch tick N-1 each tick)."""
    n = server.n
    # warm up / compile (the first block additionally needs the window
    # overlap primed: nfft - hop samples beyond block_frames * hop)
    for i in range(n):
        server.feed(i, chunk)
        server.feed(i, chunk)
    out = server.tick(fetch=True)
    assert len(out) == n

    t0 = time.perf_counter()
    last = None
    for _ in range(n_ticks):
        for i in range(n):
            server.feed(i, chunk)
        if mode == "pipelined":
            last = server.tick_pipelined()
        else:
            last = server.tick(fetch=mode)
    if mode == "pipelined":
        last = server.flush_pipelined()
    # value fetch is the only reliable barrier on this backend
    _ = np.asarray(last[0])
    return (time.perf_counter() - t0) / n_ticks


def make_av_server(n_streams: int, block_frames: int, int8: bool = False,
                   u8_wire: bool = False, pallas_tower: bool = False,
                   mcb_hoist: bool = False, span_wire: bool = False,
                   hop_dft: bool = False, video_fps: float = 0.0,
                   audio_int16: bool = False):
    from avvad_tpu.models import AVVAD
    from avvad_tpu.serve import MultiStreamAVVAD

    model = AVVAD(y_dim=1, lstm_hidden_size=1024, lstm_layers=2,
                  use_mcb=True, use_pallas_lstm=True,
                  tower_int8=int8,
                  tower_quant_mode="static" if int8 else "dynamic",
                  tower_pallas=pallas_tower)
    audio0 = jnp.zeros((1, 8, 513))
    video0 = jnp.zeros((1, 8, 67, 67))
    variables = model.init(jax.random.PRNGKey(0), audio0, video0)
    if int8:
        # record static activation scales on a representative block
        from avvad_tpu.models.quantize import calibrate

        rng = np.random.default_rng(0)
        cal_a = jnp.asarray(rng.normal(size=(1, block_frames, 513))
                            .astype(np.float32))
        cal_v = jnp.asarray(
            rng.uniform(0, 255, size=(1, block_frames, 67, 67))
            .astype(np.float32))
        cal = model.clone(tower_quant_mode="calibrate", tower_pallas=False)
        variables = calibrate(cal, variables, [(cal_a, cal_v)], train=False)
    if mcb_hoist:
        # pre-fold the MCB sketches (exact; hoists the per-tick constant
        # fold matmuls — see models/mcb.fold_sketch_collection)
        from avvad_tpu.models.mcb import fold_sketch_collection

        model = model.clone(mcb_folded_vars=True)
        variables = fold_sketch_collection(variables)
    return MultiStreamAVVAD(model, variables, n_streams,
                            block_frames=block_frames, video_uint8=u8_wire,
                            span_wire=span_wire, hop_dft=hop_dft,
                            video_fps=video_fps or None,
                            audio_int16=audio_int16)


def run_av(server, n_ticks: int, chunk: np.ndarray,
           vchunk: np.ndarray, video_fps: float = 0.0,
           mode=True) -> float:
    n = server.n
    bf = server.block_frames
    # camera-rate servers consume video_fps/62.5 source frames per output
    # frame; pace the feed so every stream stays exactly one block ahead
    ratio = (video_fps or 62.5) / 62.5
    fed = [0]

    def vfeed(total_blocks):
        want = int(np.ceil(total_blocks * bf * ratio)) + 2
        k, fed[0] = want - fed[0], want
        return k

    vstock = np.concatenate([vchunk, vchunk])
    k0 = vfeed(2)
    for i in range(n):
        server.feed(i, pcm=np.concatenate([chunk, chunk]),
                    video_frames=vstock[:k0])
    out = server.tick(fetch=True)
    assert len(out) == n
    t0 = time.perf_counter()
    last = None
    for t in range(n_ticks):
        vf = vstock[:vfeed(3 + t)]
        for i in range(n):
            server.feed(i, pcm=chunk, video_frames=vf)
        if mode == "pipelined":
            last = server.tick_pipelined()
        else:
            last = server.tick(fetch=mode)
    if mode == "pipelined":
        last = server.flush_pipelined()
    _ = np.asarray(last[0])
    return (time.perf_counter() - t0) / n_ticks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=32)
    ap.add_argument("--ticks", type=int, default=40)
    ap.add_argument("--block-frames", type=int, default=16)
    ap.add_argument("--av", action="store_true",
                    help="also time MultiStreamAVVAD ticks (ResNet tower + "
                         "MCB fusion per block)")
    ap.add_argument("--av-int8", action="store_true",
                    help="AV tick with the calibrated static-int8 tower")
    ap.add_argument("--av-u8", action="store_true",
                    help="AV tick with the uint8 video wire (1/4 the "
                         "host->device video payload, on-device dequant)")
    ap.add_argument("--av-pallas", action="store_true",
                    help="AV tick with the fused Pallas int8 block kernels "
                         "(implies --av-int8)")
    ap.add_argument("--av-mcb-hoist", action="store_true",
                    help="AV tick with pre-folded MCB sketches (exact)")
    ap.add_argument("--audio-span", action="store_true",
                    help="span audio wire: ship the raw contiguous sample "
                         "span per tick (~3.4x less audio payload; framing "
                         "on device, bit-exact) — applies to the audio tick "
                         "and any AV tick")
    ap.add_argument("--hop-dft", action="store_true",
                    help="hop-block DFT frontend on the span (implies "
                         "--audio-span; ~4x fewer frontend matmul FLOPs)")
    ap.add_argument("--audio-int16", action="store_true",
                    help="int16 PCM span wire (implies --audio-span): half "
                         "the audio payload, bit-exact for 16-bit sources")
    ap.add_argument("--av-video-fps", type=float, default=0.0,
                    help="camera-rate AV video wire (e.g. 30): source-rate "
                         "frames on the wire, tower on unique frames, "
                         "feature gather on device (implies --av)")
    args = ap.parse_args()
    if args.av_video_fps:
        args.av = True
    if args.hop_dft:
        args.audio_span = True
    if args.audio_int16:
        args.audio_span = True
    if args.av_pallas:
        args.av_int8 = True
    if args.av_int8 or args.av_u8:
        args.av = True

    hop, nfft = 256, 1024
    block_sec = args.block_frames * hop / 16000.0
    rng = np.random.default_rng(0)
    # one block of fresh audio per stream per tick
    chunk = rng.normal(size=args.block_frames * hop).astype(np.float32) * 0.1
    # int16 wire benches feed the same samples quantized to the int16 grid
    chunk_i = quantize_pcm_int16(chunk)
    wire_chunk = chunk_i if args.audio_int16 else chunk

    # host-side assembly alone (no device): native hub vs python fallback
    for native in (True, False):
        srv = make_server(args.streams, args.block_frames, native=native)
        kind = "native" if srv._hub.is_native else "python"
        for i in range(args.streams):
            srv.feed(i, np.concatenate([chunk, chunk]))
        t0 = time.perf_counter()
        reps = 50
        for _ in range(reps):
            for i in range(args.streams):
                srv.feed(i, chunk)
            srv._hub.assemble()
        dt = (time.perf_counter() - t0) / reps
        print(f"host assembly ({kind:6s}): {dt * 1e3:7.2f} ms/tick")

    srv = make_server(args.streams, args.block_frames, native=True,
                      span_wire=args.audio_span, hop_dft=args.hop_dft,
                      audio_int16=args.audio_int16)
    wire = "".join([" span" if args.audio_span else "",
                    " hop-dft" if args.hop_dft else "",
                    " i16" if args.audio_int16 else ""])
    for mode, fetch in (("sync", True), ("pipelined", "pipelined"),
                        ("lazy", False)):
        srv.reset()
        dt = run(srv, args.ticks, wire_chunk, fetch)
        agg = args.streams * block_sec / dt
        budget = block_sec / dt
        print(f"tick ({mode}{wire}): {dt * 1e3:6.1f} ms | {args.streams} "
              f"streams x {block_sec * 1e3:.0f} ms blocks -> {agg:6.1f}x "
              f"aggregate real time | latency budget headroom {budget:4.1f}x")

    if args.av:
        vchunk = rng.uniform(
            0, 255, size=(args.block_frames, 67, 67)).astype(np.float32)
        av = make_av_server(args.streams, args.block_frames,
                            int8=args.av_int8, u8_wire=args.av_u8,
                            pallas_tower=args.av_pallas,
                            mcb_hoist=args.av_mcb_hoist,
                            span_wire=args.audio_span, hop_dft=args.hop_dft,
                            video_fps=args.av_video_fps,
                            audio_int16=args.audio_int16)
        tag = "".join([" int8" if args.av_int8 else "",
                       " pallas" if args.av_pallas else "",
                       " u8" if args.av_u8 else "",
                       " mcb-hoist" if args.av_mcb_hoist else "",
                       wire,
                       f" cam{args.av_video_fps:g}" if args.av_video_fps
                       else ""]) or " f32"
        for mode, fetch in (("sync", True), ("pipelined", "pipelined")):
            av.reset()
            dt = run_av(av, args.ticks, wire_chunk, vchunk,
                        video_fps=args.av_video_fps, mode=fetch)
            agg = args.streams * block_sec / dt
            budget = block_sec / dt
            print(f"tick (AV {mode}{tag}): {dt * 1e3:6.1f} ms | "
                  f"{args.streams} streams x {block_sec * 1e3:.0f} ms "
                  f"blocks -> {agg:6.1f}x aggregate real time | "
                  f"latency budget headroom {budget:4.1f}x")

    # dispatch floor: the same per-tick host->device transfer through a
    # trivial jitted op, fetched per tick — the latency this backend charges
    # for ANY round trip of this shape, model aside
    blocks = np.zeros((args.streams, args.block_frames, nfft), np.float32)
    trivial = jax.jit(lambda x: jnp.sum(x, axis=(1, 2)))
    _ = np.asarray(trivial(jnp.asarray(blocks)))
    t0 = time.perf_counter()
    for _ in range(args.ticks):
        _ = np.asarray(trivial(jnp.asarray(blocks)))
    floor = (time.perf_counter() - t0) / args.ticks
    print(f"dispatch+transfer floor (same input shape, trivial op): "
          f"{floor * 1e3:6.1f} ms/tick")


if __name__ == "__main__":
    main()
