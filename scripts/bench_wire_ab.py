#!/usr/bin/env python
"""Same-window interleaved A/B of streaming audio wire formats.

Measures the float32 span wire against the int16 PCM span wire (and
optionally the AV ticks) by ALTERNATING min-of-N rounds of each server
inside one process/window — the tunnel's dispatch floor drifts tens of
ms between runs, so cross-run comparisons of transfer-bound ticks are
noise; interleaving cancels the drift (BENCH_NOTES round-3 camera-rate
methodology). Both servers are fully compiled and warmed before any
timed round.

The int16 wire halves the dominant host->device audio payload and is
bit-exact for 16-bit sources (tests/test_serve.py
test_multistream_int16_wire_bitexact).

Usage:
  python scripts/bench_wire_ab.py --streams 32 [--av] [--rounds 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from avvad_tpu.server import quantize_pcm_int16  # noqa: E402
from bench_streaming import make_av_server, make_server, run, run_av  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=32)
    ap.add_argument("--block-frames", type=int, default=16)
    ap.add_argument("--ticks", type=int, default=12,
                    help="ticks per timed round")
    ap.add_argument("--rounds", type=int, default=3,
                    help="alternating rounds per arm (min is reported)")
    ap.add_argument("--av", action="store_true",
                    help="A/B the AV tick (uint8+int8 tower, camera-rate "
                         "30 fps video) instead of audio-only")
    ap.add_argument("--hop-dft", action="store_true", default=True)
    ap.add_argument("--no-hop-dft", dest="hop_dft", action="store_false")
    args = ap.parse_args()

    hop = 256
    block_sec = args.block_frames * hop / 16000.0
    rng = np.random.default_rng(0)
    chunk = rng.normal(size=args.block_frames * hop).astype(np.float32) * 0.1
    chunk_i = quantize_pcm_int16(chunk)

    arms = {}
    if args.av:
        vchunk = rng.uniform(
            0, 255, size=(args.block_frames, 67, 67)).astype(np.float32)
        for name, i16 in (("f32", False), ("i16", True)):
            srv = make_av_server(args.streams, args.block_frames,
                                 int8=True, u8_wire=True, span_wire=True,
                                 hop_dft=args.hop_dft, video_fps=30.0,
                                 audio_int16=i16)
            c = chunk_i if i16 else chunk
            arms[name] = (srv, lambda s=srv, c=c: run_av(
                s, args.ticks, c, vchunk, video_fps=30.0))
    else:
        for name, i16 in (("f32", False), ("i16", True)):
            srv = make_server(args.streams, args.block_frames, native=True,
                              span_wire=True, hop_dft=args.hop_dft,
                              audio_int16=i16)
            c = chunk_i if i16 else chunk
            arms[name] = (srv, lambda s=srv, c=c: run(
                s, args.ticks, c, True))

    # compile + warm both arms before any timed round
    for name, (_, timed) in arms.items():
        t0 = time.perf_counter()
        timed()
        print(f"warm {name}: {time.perf_counter() - t0:.1f} s "
              "(includes compile)", flush=True)

    best = {name: float("inf") for name in arms}
    for r in range(args.rounds):
        for name, (srv, timed) in arms.items():
            srv.reset()
            dt = timed()
            best[name] = min(best[name], dt)
            print(f"round {r} {name}: {dt * 1e3:6.1f} ms/tick", flush=True)

    kind = "AV" if args.av else "audio"
    for name, dt in best.items():
        agg = args.streams * block_sec / dt
        print(f"BEST {kind} {name}: {dt * 1e3:6.1f} ms/tick | "
              f"{agg:6.1f}x aggregate rt")
    f32, i16 = best["f32"], best["i16"]
    print(f"int16 wire delta: {(f32 - i16) * 1e3:+.1f} ms/tick "
          f"({(f32 / i16 - 1) * 100:+.1f}% throughput)")


if __name__ == "__main__":
    main()
