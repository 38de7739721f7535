#!/usr/bin/env python
"""Upsampling sanity check: for each utterance, assert the upsampled lip
video's frame count matches the STFT frame count (modulo the builder's
min-truncation), and render a side-by-side strip of original vs upsampled
frames.

Covers /root/reference/scripts/visualization_video_upsampling.py (whose
executable invariant was `assert speech_tf.shape[-1] == buf.shape[0]`,
:149-165 — note that script as committed also had a broken import; this
one runs).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-root", default="data")
    p.add_argument("--dataset-size", default="subset")
    p.add_argument("--split", default="test")
    p.add_argument("--figures", action="store_true")
    p.add_argument("--output-dir", default=None)
    return p.parse_args()


def main():
    args = parse_args()
    from avvad_tpu.config import STFTConfig
    from avvad_tpu.datasets import speech_list, video_list
    from avvad_tpu.processing import read_wav, stft
    from avvad_tpu.processing.audio_io import peak_normalize
    from avvad_tpu.processing.video import (decode_dct_frames, read_mat_dct,
                                            upsample_video)

    raw = os.path.join(args.data_root, args.dataset_size, "raw/")
    out_root = args.output_dir or os.path.join(
        args.data_root, args.dataset_size, "models", "upsampling_qa")
    cfg = STFTConfig()

    mats = video_list(raw, args.split)
    clean_in, _ = speech_list(raw, args.split)
    failures = 0
    for mat_rel, clean_rel in zip(mats, clean_in):
        frames = decode_dct_frames(read_mat_dct(os.path.join(raw, mat_rel)))
        up = upsample_video(frames, 30.0, cfg.frame_rate)

        x, fs = read_wav(os.path.join(raw, clean_rel))
        sxx = stft(peak_normalize(x), fs=fs, wlen_sec=cfg.wlen_sec,
                   hop_percent=cfg.hop_percent, center=cfg.center,
                   pad_at_end=cfg.pad_at_end)

        diff = up.shape[0] - sxx.shape[-1]
        status = "OK" if abs(diff) <= 2 else "MISALIGNED"
        if status != "OK":
            failures += 1
        print(f"{mat_rel}: video 30fps={frames.shape[0]} -> "
              f"upsampled={up.shape[0]}, stft={sxx.shape[-1]} "
              f"(diff {diff:+d}) {status}")

        if args.figures:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            n_show = 6
            idx30 = np.linspace(0, frames.shape[0] - 1, n_show).astype(int)
            idx_up = np.linspace(0, up.shape[0] - 1, n_show).astype(int)
            fig, axes = plt.subplots(2, n_show, figsize=(2 * n_show, 4.5))
            for k in range(n_show):
                axes[0, k].imshow(frames[idx30[k]], cmap="gray")
                axes[0, k].set_title(f"30fps #{idx30[k]}", fontsize=8)
                axes[1, k].imshow(up[idx_up[k]], cmap="gray")
                axes[1, k].set_title(f"62.5fps #{idx_up[k]}", fontsize=8)
                for ax in (axes[0, k], axes[1, k]):
                    ax.axis("off")
            stem = os.path.join(out_root, os.path.splitext(mat_rel)[0])
            os.makedirs(os.path.dirname(stem), exist_ok=True)
            fig.savefig(stem + "_upsampling.png", dpi=80)
            plt.close(fig)
            print("  wrote", stem + "_upsampling.png")

    if failures:
        sys.exit(f"{failures} misaligned utterances")
    print("all aligned")


if __name__ == "__main__":
    main()
