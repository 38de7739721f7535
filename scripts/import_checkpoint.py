#!/usr/bin/env python
"""Convert a reference (PyTorch) checkpoint into an avvad_tpu Orbax
checkpoint, ready for scripts/evaluate.py / scripts/train.py --resume.

The reference saved torch state dicts of DeepVAD_{audio,video,AV}
(train_*_net.py torch.save calls); this imports all parameter groups —
ResNet trunk with BatchNorm running stats, LSTMs (gate-order compatible),
heads, and MCB sketch buffers.

Example:
  python scripts/import_checkpoint.py --modality av \
      --torch-checkpoint Video_Net_epoch_005_vloss_3.85.pt \
      --output-dir runs/imported_av --lstm-hidden 1024 --mcb
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def parse_args():
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--modality", choices=["audio", "video", "av"], required=True)
    p.add_argument("--torch-checkpoint", required=True, help=".pt state dict")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--y-dim", type=int, default=1)
    p.add_argument("--lstm-hidden", type=int, default=1024)
    p.add_argument("--lstm-layers", type=int, default=2)
    p.add_argument("--mcb", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--epoch", type=int, default=0,
                   help="epoch tag for the output checkpoint name")
    return p.parse_args()


def main():
    args = parse_args()
    from avvad_tpu.models import AVVAD, AudioVAD, VideoVAD
    from avvad_tpu.train import create_train_state, save_checkpoint
    from avvad_tpu.utils import (import_reference_audio_vad,
                                 import_reference_avvad,
                                 import_reference_video_vad,
                                 load_torch_state_dict)

    state_dict = load_torch_state_dict(args.torch_checkpoint)
    print(f"loaded {args.torch_checkpoint}: {len(state_dict)} tensors")

    if args.modality == "audio":
        model = AudioVAD(y_dim=args.y_dim, lstm_hidden_size=args.lstm_hidden,
                         lstm_layers=args.lstm_layers)
        example = (jnp.zeros((1, 4, 513)),)
        importer = lambda v: import_reference_audio_vad(state_dict, v)  # noqa: E731
    elif args.modality == "video":
        model = VideoVAD(y_dim=args.y_dim, lstm_hidden_size=args.lstm_hidden,
                         lstm_layers=args.lstm_layers)
        example = (jnp.zeros((1, 2, 67, 67)),)
        importer = lambda v: import_reference_video_vad(state_dict, v)  # noqa: E731
    else:
        model = AVVAD(y_dim=args.y_dim, lstm_hidden_size=args.lstm_hidden,
                      lstm_layers=args.lstm_layers, use_mcb=args.mcb)
        example = (jnp.zeros((1, 2, 513)), jnp.zeros((1, 2, 67, 67)))
        importer = lambda v: import_reference_avvad(state_dict, model, v)  # noqa: E731

    state = create_train_state(model, jax.random.PRNGKey(0), example)
    variables = importer(model.init(jax.random.PRNGKey(0), *example))
    state = state.replace(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", state.batch_stats),
        sketch=variables.get("sketch", state.sketch),
    )
    path = save_checkpoint(args.output_dir, state, epoch=args.epoch,
                           valid_loss=0.0)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
