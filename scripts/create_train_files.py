#!/usr/bin/env python
"""Build the processed dataset tree from a raw NTCD-TIMIT corpus: decoded +
upsampled lip videos, VAD/IBM labels, clean/noisy wav copies, and train-set
normalization statistics.

CLI covering both offline builders of the reference
(/root/reference/scripts/create_video_train_files_upsampled.py and
create_audio_train_files.py), without the ffmpeg dependency.

Example (rebuild the subset tree):
  python scripts/create_train_files.py --raw-dir data/subset/raw \
      --processed-dir data/subset/processed --dataset-size subset \
      --splits train validation test
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--raw-dir", required=True)
    p.add_argument("--processed-dir", required=True)
    p.add_argument("--dataset-size", choices=["subset", "complete"], default="subset")
    p.add_argument("--labels", choices=["vad_labels", "ibm_labels"],
                   default="vad_labels")
    p.add_argument("--splits", nargs="+",
                   default=["train", "validation", "test"])
    p.add_argument("--hop-percent", type=float, default=0.25)
    p.add_argument("--upsampled-suffix", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="name labels *_<labels>_upsampled.h5 (the naming the "
                        "reference's live AV config expects)")
    p.add_argument("--workers", type=int, default=None,
                   help="process pool size (0 = serial)")
    p.add_argument("--what", choices=["all", "video", "audio"], default="all")
    return p.parse_args()


def main():
    args = parse_args()
    from avvad_tpu.builders import (BuildConfig, build_audio_split,
                                    build_video_split)
    from avvad_tpu.config import LabelConfig, STFTConfig

    cfg = BuildConfig(
        raw_dir=args.raw_dir if args.raw_dir.endswith(os.sep) else args.raw_dir + os.sep,
        processed_dir=(args.processed_dir if args.processed_dir.endswith(os.sep)
                       else args.processed_dir + os.sep),
        dataset_size=args.dataset_size,
        stft=STFTConfig(hop_percent=args.hop_percent),
        label=LabelConfig(kind=args.labels),
        upsampled_suffix=args.upsampled_suffix,
        max_workers=args.workers,
    )

    for split in args.splits:
        t0 = time.perf_counter()
        if args.what in ("all", "video"):
            n = build_video_split(cfg, split)
            print(f"[{split}] video: {n} utterances "
                  f"({time.perf_counter() - t0:.1f}s)")
        if args.what in ("all", "audio"):
            t1 = time.perf_counter()
            n = build_audio_split(cfg, split)
            print(f"[{split}] audio: {n} files "
                  f"({time.perf_counter() - t1:.1f}s)")


if __name__ == "__main__":
    main()
