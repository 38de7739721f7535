#!/usr/bin/env python
"""Streaming VAD demo: feed a WAV file through the stateful streaming
classifier in real-time-sized chunks and print detected speech segments.

A serving capability beyond the reference (which only wrote per-utterance
prediction files offline).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from avvad_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("wav", help="input wav file (16 kHz)")
    p.add_argument("--video", default=None,
                   help="upsampled lip-video h5 (X, (67,67,T) @62.5fps) for "
                        "audio-visual streaming")
    p.add_argument("--checkpoint", default=None,
                   help="Orbax checkpoint (random init if omitted)")
    p.add_argument("--mcb", action="store_true",
                   help="AV model uses MCB fusion (default concat)")
    p.add_argument("--lstm-hidden", type=int, default=1024)
    p.add_argument("--lstm-layers", type=int, default=2)
    p.add_argument("--chunk-ms", type=float, default=100.0)
    p.add_argument("--block-frames", type=int, default=16)
    p.add_argument("--threshold", type=float, default=0.5)
    return p.parse_args()


def main():
    args = parse_args()
    from avvad_tpu.models import AudioVAD, AVVAD
    from avvad_tpu.processing import read_wav
    from avvad_tpu.serve import StreamingAVVAD, StreamingVAD
    from avvad_tpu.train import create_train_state, restore_checkpoint

    x, fs = read_wav(args.wav)
    print(f"{args.wav}: {len(x)/fs:.2f}s @ {fs} Hz")

    if args.video:
        from avvad_tpu.data.records import load_video

        frames = load_video(args.video)
        print(f"{args.video}: {len(frames)} lip frames")
        model = AVVAD(y_dim=1, lstm_hidden_size=args.lstm_hidden,
                      lstm_layers=args.lstm_layers, use_mcb=args.mcb)
        state = create_train_state(
            model, jax.random.PRNGKey(0),
            (jnp.zeros((1, 8, 513)), jnp.zeros((1, 8, 67, 67))))
    else:
        model = AudioVAD(y_dim=1, lstm_hidden_size=args.lstm_hidden,
                         lstm_layers=args.lstm_layers)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   (jnp.zeros((1, 8, 513)),))
    norm_stats = None
    if args.checkpoint:
        state, norm_stats, _ = restore_checkpoint(args.checkpoint, state,
                                                  with_opt=False)
        print(f"loaded {args.checkpoint}")

    chunk = int(fs * args.chunk_ms / 1000)
    probs = []
    if args.video:
        sv = StreamingAVVAD(model, state.variables(), norm_stats=norm_stats,
                            block_frames=args.block_frames)
        vchunk = max(1, int(62.5 * args.chunk_ms / 1000))
        vpos = 0
        for s in range(0, len(x), chunk):
            probs.append(sv.feed(x[s:s + chunk],
                                 frames[vpos:vpos + vchunk]))
            vpos += vchunk
        probs.append(sv.feed(np.zeros(0, np.float32), frames[vpos:]))
        probs.append(sv.flush())
    else:
        sv = StreamingVAD(model, state.variables(), norm_stats=norm_stats,
                          block_frames=args.block_frames)
        for s in range(0, len(x), chunk):
            probs.append(sv.feed(x[s:s + chunk]))
        probs.append(sv.flush())
    probs = np.concatenate(probs)

    frame_sec = 256 / fs
    active = probs > args.threshold
    print(f"{len(probs)} frames, {active.mean():.1%} speech")
    # contiguous segments
    edges = np.flatnonzero(np.diff(np.concatenate([[0], active, [0]])))
    for start, end in edges.reshape(-1, 2):
        print(f"  speech {start * frame_sec:7.2f}s - {end * frame_sec:7.2f}s "
              f"(p_mean={probs[start:end].mean():.2f})")


if __name__ == "__main__":
    main()
