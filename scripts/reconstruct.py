#!/usr/bin/env python
"""Sequential single-device video-net inference with on-the-spot F1 and
.npy prediction dumps.

Covers /root/reference/scripts/reconstruct_dnn_classif.py (which, as
committed, crashes on a missing y_dim argument — reconstruct_dnn_classif.py:103;
this one runs). Functionally it is evaluate+score in one pass over the
video modality, printing per-utterance metrics as it goes.
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
    p.add_argument("--data-root", default="data")
    p.add_argument("--dataset-size", default="subset")
    p.add_argument("--labels", default="vad_labels")
    p.add_argument("--upsampled", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--split", default="test")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--lstm-hidden", type=int, default=1024)
    p.add_argument("--lstm-layers", type=int, default=2)
    p.add_argument("--bucket", type=int, default=128)
    return p.parse_args()


def main():
    args = parse_args()
    from avvad_tpu.config import LabelConfig
    from avvad_tpu.data import DataLoader, VideoSequenceSource
    from avvad_tpu.models import VideoVAD, f1_metrics
    from avvad_tpu.train import create_train_state, restore_checkpoint
    from avvad_tpu.train.steps import make_predict_step

    processed = os.path.join(args.data_root, args.dataset_size, "processed/")
    src = VideoSequenceSource(processed, args.split, args.labels,
                              upsampled=args.upsampled)
    print(f"{args.split}: {len(src)} utterances")

    model = VideoVAD(y_dim=LabelConfig(kind=args.labels).y_dim,
                     lstm_hidden_size=args.lstm_hidden,
                     lstm_layers=args.lstm_layers)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (jnp.zeros((1, 4, 67, 67)),))
    state, norm_stats, _ = restore_checkpoint(args.checkpoint, state,
                                              with_opt=False)
    predict = make_predict_step("video")

    loader = DataLoader(src, batch_size=1, shuffle=False, bucket=args.bucket)
    for i, batch in enumerate(loader):
        y_soft = np.asarray(predict(state, batch, norm_stats))[0]
        length = int(batch.lengths[0])
        y_soft = y_soft[:length]
        y_hard = (y_soft > 0.5).astype(np.float32)
        y_true = np.asarray(batch.label[0, :length])
        acc, prec, rec, f1 = (float(v) for v in f1_metrics(
            jnp.asarray(y_hard), jnp.asarray(y_true)))
        out = os.path.join(args.output_dir,
                           os.path.splitext(src.rel_path(i))[0] + "_y_hat_hard.npy")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        np.save(out, y_hard[..., 0] if y_hard.shape[-1] == 1 else y_hard.T)
        print(f"{src.rel_path(i)}: acc={acc:.3f} prec={prec:.3f} "
              f"rec={rec:.3f} f1={f1:.3f} -> {out}")


if __name__ == "__main__":
    main()
