#!/usr/bin/env python
"""Oracle-label audio QA: render waveform/spectrogram/label figures and
label histograms for each clean utterance of a split, and cross-check the
host STFT against the on-device STFT.

Covers /root/reference/scripts/visualization_audio.py (which rendered
oracle VAD/IBM figures under models/oracle_classif and kept a librosa-vs-
torch STFT cross-check, :97-133 — here the cross-check is host-numpy vs
TPU DFT-matmul and it actually asserts).
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
    p.add_argument("--labels", default="vad_labels",
                   choices=["vad_labels", "ibm_labels"])
    p.add_argument("--output-dir", default=None,
                   help="default: <data-root>/<size>/models/oracle_classif")
    p.add_argument("--check-device-stft", action="store_true",
                   help="assert host and on-device STFT agree")
    return p.parse_args()


def main():
    args = parse_args()
    import matplotlib.pyplot as plt

    from avvad_tpu.builders import make_label
    from avvad_tpu.config import LabelConfig, STFTConfig
    from avvad_tpu.datasets import speech_list
    from avvad_tpu.processing import read_wav, stft
    from avvad_tpu.processing.audio_io import peak_normalize
    from avvad_tpu.visualization import display_wav_spectro_mask

    raw = os.path.join(args.data_root, args.dataset_size, "raw/")
    out_root = args.output_dir or os.path.join(
        args.data_root, args.dataset_size, "models", "oracle_classif")
    stft_cfg, label_cfg = STFTConfig(), LabelConfig(kind=args.labels)

    clean_in, _ = speech_list(raw, args.split)
    print(f"{args.split}: {len(clean_in)} utterances")
    for rel in clean_in:
        x, fs = read_wav(os.path.join(raw, rel))
        x = peak_normalize(x)
        sxx = stft(x, fs=fs, wlen_sec=stft_cfg.wlen_sec,
                   hop_percent=stft_cfg.hop_percent, center=stft_cfg.center,
                   pad_at_end=stft_cfg.pad_at_end)
        label = make_label(x, fs, stft_cfg, label_cfg)

        if args.check_device_stft:
            import jax.numpy as jnp

            from avvad_tpu.ops.stft import stft_frames

            re, im = stft_frames(jnp.asarray(x), fs=fs,
                                 wlen_sec=stft_cfg.wlen_sec,
                                 hop_percent=stft_cfg.hop_percent)
            np.testing.assert_allclose(np.asarray(re).T, sxx.real, atol=5e-3)
            np.testing.assert_allclose(np.asarray(im).T, sxx.imag, atol=5e-3)
            print(f"  device STFT parity ok: {rel}")

        stem = os.path.join(out_root, os.path.splitext(rel)[0])
        os.makedirs(os.path.dirname(stem), exist_ok=True)

        fig = display_wav_spectro_mask(x, sxx, label, fs=fs,
                                       hop_percent=stft_cfg.hop_percent)
        fig.savefig(stem + f"_hard_{args.labels}.png")
        plt.close(fig)

        fig, ax = plt.subplots()
        ax.hist(np.asarray(label).ravel(), bins=2)
        ax.set_title(f"{os.path.basename(stem)} {args.labels} "
                     f"(active {float(np.mean(label)):.2%})")
        fig.savefig(stem + "_hist.png")
        plt.close(fig)
        print("wrote", stem + f"_hard_{args.labels}.png")


if __name__ == "__main__":
    main()
