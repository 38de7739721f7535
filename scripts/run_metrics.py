#!/usr/bin/env python
"""Score saved predictions: per-utterance accuracy/precision/recall/F1 +
95% CI tables grouped by SNR / noise type / speaker, with optional
per-utterance figures.

CLI covering run_metrics_{dnn,video}_classif.py
(/root/reference/scripts/run_metrics_dnn_classif.py:102-367).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-root", default="data")
    p.add_argument("--dataset-size", choices=["subset", "complete"], default="subset")
    p.add_argument("--labels", default="vad_labels")
    p.add_argument("--upsampled", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--split", default="test")
    p.add_argument("--predictions-dir", required=True,
                   help="classif_data_dir holding *_y_hat_*.npy files")
    p.add_argument("--figures", action="store_true",
                   help="render wav/spectrogram/mask PNG per utterance")
    p.add_argument("--confidence", type=float, default=0.95)
    p.add_argument("--video-classif", action="store_true",
                   help="score matlab_raw-keyed video-net predictions "
                        "(run_metrics_video_classif.py equivalent)")
    return p.parse_args()


def main():
    args = parse_args()
    import numpy as np

    from avvad_tpu.data import AudioSequenceSource
    from avvad_tpu.evaluate import score_split
    from avvad_tpu.evaluate.classify import compute_metrics_utt
    from avvad_tpu.processing import read_wav, stft
    from avvad_tpu.processing.audio_io import peak_normalize
    from avvad_tpu.visualization import display_multiple_signals

    processed = os.path.join(args.data_root, args.dataset_size, "processed/")
    if args.video_classif:
        from avvad_tpu.data import VideoSequenceSource
        from avvad_tpu.evaluate import score_video_split

        vsource = VideoSequenceSource(processed, args.split, args.labels,
                                      upsampled=args.upsampled)
        print(f"{args.split} utterances: {len(vsource)}")
        score_video_split(vsource, processed, args.predictions_dir + os.sep,
                          confidence=args.confidence)
        print("stats.json ->",
              os.path.join(args.predictions_dir, "stats.json"))
        return

    source = AudioSequenceSource(processed, args.split, args.dataset_size,
                                 args.labels, upsampled=args.upsampled)
    print(f"{args.split} utterances: {len(source)}")

    stats = score_split(source, processed, args.predictions_dir + os.sep,
                        confidence=args.confidence)

    if args.figures:
        import matplotlib.pyplot as plt

        from avvad_tpu.data.records import load_label

        for i in range(len(source)):
            noisy_rel = source.rel_path(i)
            m = compute_metrics_utt(processed, args.predictions_dir + os.sep,
                                    noisy_rel, source.label_rel_path(i))
            x, fs = read_wav(os.path.join(processed, noisy_rel))
            x = peak_normalize(x)
            s = stft(x, fs=fs)
            y = load_label(os.path.join(processed, source.label_rel_path(i))).T
            y_hat = np.atleast_2d(m["y_hat_soft"].T > 0.5).astype(np.float32)
            fig = display_multiple_signals(
                [[x, s, y], [None, None, y_hat]], fs=fs, last_only_label=False
            )
            out = os.path.join(args.predictions_dir,
                               os.path.splitext(noisy_rel)[0] + "_hard_mask.png")
            os.makedirs(os.path.dirname(out), exist_ok=True)
            fig.savefig(out)
            plt.close(fig)
            print("wrote", out)

    print("stats.json ->", os.path.join(args.predictions_dir, "stats.json"))


if __name__ == "__main__":
    main()
