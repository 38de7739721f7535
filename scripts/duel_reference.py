#!/usr/bin/env python
"""Head-to-head quality duel: train the REFERENCE torch models on the
IDENTICAL data this framework trains on, and score both with the same
scripts/run_metrics.py.

Until round 4, trained-quality claims compared avvad_tpu models to the
upstream paper's AUC band — never to a model trained by the reference's
own code on the same data. This harness closes that gap:

- The model is the reference's actual nn.Module
  (/root/reference/packages/models/Audio_Net.py:11 DeepVAD_audio;
  /root/reference/packages/models/Video_Net.py:12 DeepVAD_video;
  /root/reference/packages/models/AV_Net.py:12 DeepVAD_AV), imported
  unmodified (tests/torch_oracles.py provides the torchvision/legacy-FFT
  shims the image lacks).
- The optimizer step, loss, and selection rule are the reference's
  (/root/reference/scripts/train_audio_net.py:144-372): Adam lr 1e-4,
  per-sequence mean-BCE summed over the batch, backward -> step ->
  zero_grad, per-epoch validation loss in the checkpoint filename,
  best-vloss selection.
- The data is bit-identical to this framework's training batches: the
  SAME AugmentingSource + DataLoader (seed, epoch seeding, bucketing,
  sort-pool order) that scripts/train.py --augment consumes, so neither
  side sees a single frame the other didn't. (Bucket padding is inert
  for the reference model: pack_padded_sequence drops pad steps.)
- Evaluation writes predictions through the same
  avvad_tpu.evaluate.write_predictions layout, so run_metrics.py scores
  both frameworks with one code path.

Train (torch-cpu; slow — run in background):
  python scripts/duel_reference.py train --modality audio \
      --data-root runs/quality/data --model-dir runs/duel/audio_ref \
      --epochs 100 --augment
Evaluate the best-vloss epoch over the grid test split:
  python scripts/duel_reference.py eval --modality audio \
      --data-root runs/quality/data --model-dir runs/duel/audio_ref \
      --dataset-size complete --split test \
      --output-dir runs/duel/audio_ref_preds
"""

import argparse
import glob
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np
import torch

from torch_oracles import add_reference_to_path, install_fake_torchvision

EPS = 1e-8


def install_legacy_fft():
    """torch.rfft / torch.irfft / positional addcmul shims for the
    reference MCB code (torch<=1.7 API), script-friendly (no pytest
    monkeypatch): same mapping as tests/torch_oracles.py."""

    def rfft(input, signal_ndim, normalized=False, onesided=True):
        assert signal_ndim == 1 and onesided and not normalized
        f = torch.fft.rfft(input, dim=-1)
        return torch.stack((f.real, f.imag), dim=-1)

    def irfft(input, signal_ndim, normalized=False, onesided=True,
              signal_sizes=None):
        assert signal_ndim == 1 and onesided and not normalized
        c = torch.complex(input.select(-1, 0).contiguous(),
                          input.select(-1, 1).contiguous())
        return torch.fft.irfft(c, n=signal_sizes[0], dim=-1)

    orig_addcmul = torch.addcmul

    def addcmul(input, *args, **kw):
        if len(args) == 3:
            value, t1, t2 = args
            return orig_addcmul(input, t1, t2, value=value)
        return orig_addcmul(input, *args, **kw)

    torch.rfft = rfft
    torch.irfft = irfft
    torch.addcmul = addcmul


def reference_bce(logits, target):
    """/root/reference/packages/models/utils.py:113 — mean over (T, y) of
    the eps-regularized BCE on sigmoid probabilities."""
    p = torch.sigmoid(logits)
    return -torch.mean(target * torch.log(p + EPS)
                       + (1 - target) * torch.log(1 - p + EPS))


def make_sources(args):
    from avvad_tpu.data import (AudioSequenceSource, AudioVisualSource,
                                AugmentingSource, VideoSequenceSource)

    processed = os.path.join(args.data_root, args.dataset_size, "processed/")

    def source(split):
        if args.modality == "audio":
            return AudioSequenceSource(processed, split, args.dataset_size,
                                       args.labels, upsampled=True)
        if args.modality == "video":
            return VideoSequenceSource(processed, split, args.labels,
                                       upsampled=True)
        return AudioVisualSource(processed, split, args.dataset_size,
                                 args.labels, upsampled=True)

    train_src, valid_src = source("train"), source("validation")
    if args.augment:
        if args.modality == "video":
            raise SystemExit("--augment remixes audio; video-only training "
                             "has no noise to augment (scripts/train.py "
                             "enforces the same)")
        train_src = AugmentingSource(train_src, seed=args.seed)
    return train_src, valid_src


def build_model(args):
    add_reference_to_path()
    if args.modality == "audio":
        from packages.models.Audio_Net import DeepVAD_audio

        return DeepVAD_audio(args.lstm_layers, args.lstm_hidden, args.y_dim)
    install_fake_torchvision()
    if args.modality == "video":
        # /root/reference/scripts/train_video_net.py:142 — full ResNet-18 +
        # LSTM trained from scratch (pretrained=False), nothing frozen
        from packages.models.Video_Net import DeepVAD_video

        return DeepVAD_video(args.lstm_layers, args.lstm_hidden, args.y_dim)
    install_legacy_fft()
    from packages.models.AV_Net import DeepVAD_AV

    return DeepVAD_AV(args.lstm_layers, args.lstm_hidden, args.y_dim,
                      args.use_mcb, EPS)


def batch_tensors(batch, norm, args):
    """Batch -> normalized torch tensors, the reference's normalization
    order (train_audio_net.py:221-223 / train_video_net.py:192-194 /
    train_AV_net.py:286-291)."""
    y = torch.from_numpy(np.asarray(batch.label))
    lengths = torch.from_numpy(np.asarray(batch.lengths, np.int64))
    if args.modality == "video":
        v = torch.from_numpy(np.asarray(batch.video))
        v = (v - norm["video_mean"]) / (norm["video_std"] + EPS)
        return (v,), y, lengths
    x = torch.from_numpy(np.asarray(batch.audio))
    x = (x - norm["audio_mean"]) / (norm["audio_std"] + EPS)
    if args.modality == "audio":
        return (x,), y, lengths
    v = torch.from_numpy(np.asarray(batch.video))
    v = (v - norm["video_mean"]) / (norm["video_std"] + EPS)
    return (x, v), y, lengths


def forward(model, inputs, lengths):
    if len(inputs) == 1:
        return model(inputs[0], lengths)
    return model(inputs[0], inputs[1], lengths)


def run_epoch(model, loader, norm, args, optimizer=None):
    """One pass; returns total loss summed the reference way (sum of
    per-batch sums of per-sequence mean BCE) divided by #batches."""
    n_batches = 0
    total = 0.0
    for batch in loader:
        inputs, y, lengths = batch_tensors(batch, norm, args)
        if optimizer is None:
            with torch.no_grad():
                logits = forward(model, inputs, lengths)
        else:
            logits = forward(model, inputs, lengths)
        loss = 0.0
        for b in range(len(lengths)):
            n = int(lengths[b])
            loss = loss + reference_bce(logits[b, :n], y[b, :n])
        if optimizer is not None:
            loss.backward()
            optimizer.step()
            optimizer.zero_grad()
        total += float(loss.detach())
        n_batches += 1
    return total / max(n_batches, 1)


def checkpoint_name(epoch, vloss):
    return f"Ref_Net_epoch_{epoch:03d}_vloss_{vloss:.2f}.pt"


def best_checkpoint(model_dir):
    """Lowest-vloss checkpoint file (the reference's selection rule —
    its users hand-pick the best-vloss filename, evaluate_AV_net.py:117)."""
    best, best_v = None, float("inf")
    for p in glob.glob(os.path.join(model_dir, "Ref_Net_epoch_*_vloss_*.pt")):
        m = re.search(r"vloss_([0-9.]+?)\.pt$", p)
        if not m:
            continue
        v = float(m.group(1))
        if v < best_v:
            best, best_v = p, v
    if best is None:
        raise SystemExit(f"no checkpoints in {model_dir}")
    return best, best_v


def load_norm(model_dir, args):
    norm = {}
    if args.modality in ("audio", "av"):
        norm["audio_mean"] = torch.from_numpy(
            np.load(os.path.join(model_dir, "trainset_mean.npy")))
        norm["audio_std"] = torch.from_numpy(
            np.load(os.path.join(model_dir, "trainset_std.npy")))
    if args.modality in ("video", "av"):
        norm["video_mean"] = torch.tensor(
            float(np.load(os.path.join(model_dir, "trainset_video_mean.npy"))))
        norm["video_std"] = torch.tensor(
            float(np.load(os.path.join(model_dir, "trainset_video_std.npy"))))
    return norm


def cmd_train(args):
    from avvad_tpu.data import DataLoader, feature_stats, load_statistics

    train_src, valid_src = make_sources(args)
    if args.augment:
        print(f"augmented grid: {len(train_src)} items/epoch")
    # identical loaders to scripts/train.py
    train_dl = DataLoader(train_src, args.batch_size, shuffle=True,
                          seed=args.seed, bucket=args.bucket,
                          sort_pool_factor=4, num_workers=1)
    valid_dl = DataLoader(valid_src, args.batch_size, shuffle=False,
                          bucket=args.bucket, num_workers=1)

    os.makedirs(args.model_dir, exist_ok=True)
    norm = {}
    if args.modality in ("audio", "av"):
        if args.augment:
            mean, std = feature_stats(train_src)
            print("augmented-grid audio statistics computed")
        else:
            mean, std = load_statistics(os.path.join(
                args.data_root, args.dataset_size,
                "processed/ntcd_timit/Noisy",
                "ntcd_timit_log_power_spec_upsampled_statistics.h5"))
        np.save(os.path.join(args.model_dir, "trainset_mean.npy"), mean)
        np.save(os.path.join(args.model_dir, "trainset_std.npy"), std)
        norm.update(audio_mean=torch.from_numpy(mean),
                    audio_std=torch.from_numpy(std))
    if args.modality in ("av", "video"):
        from avvad_tpu.data import load_statistics as _ls

        vm, vs = _ls(os.path.join(
            args.data_root, args.dataset_size,
            "processed/ntcd_timit/matlab_raw",
            "ntcd_timit_upsampled_statistics.h5"))
        norm["video_mean"] = torch.tensor(float(np.mean(vm)))
        norm["video_std"] = torch.tensor(float(np.mean(vs)))
        np.save(os.path.join(args.model_dir, "trainset_video_mean.npy"),
                float(norm["video_mean"]))
        np.save(os.path.join(args.model_dir, "trainset_video_std.npy"),
                float(norm["video_std"]))

    torch.manual_seed(args.seed)
    model = build_model(args)
    if args.modality == "av" and args.pretrained_video:
        _load_frozen_video_trunk(model, args.pretrained_video)
    optimizer = torch.optim.Adam(
        [p for p in model.parameters() if p.requires_grad],
        lr=args.lr, betas=(0.9, 0.999))
    n_params = sum(p.numel() for p in model.parameters() if p.requires_grad)
    print(f"reference {args.modality} model: {n_params} learnable params")

    log = os.path.join(args.model_dir, "output_epoch.log")
    best_v = float("inf")
    for epoch in range(1, args.epochs + 1):
        t0 = time.perf_counter()
        model.train()
        # pin the loader to the trainer's 1-based epoch numbering so the
        # augmenting source re-seeds EXACTLY like scripts/train.py
        # (trainer.py sets loader.epoch = epoch; the loader's own
        # auto-increment is 0-based). The round-4 duel run predates this
        # line and saw the same realization stream shifted one epoch —
        # distributionally identical (fresh grid noise every epoch).
        train_dl.epoch = epoch
        tloss = run_epoch(model, train_dl, norm, args, optimizer)
        model.eval()
        vloss = run_epoch(model, valid_dl, norm, args)
        dt = time.perf_counter() - t0
        line = (f"Epoch: {epoch}  [Train] Loss: {tloss:.2f}  "
                f"[Validation] Loss: {vloss:.2f}  ({dt:.1f}s)")
        print(line, flush=True)
        with open(log, "a") as fh:
            print(line, file=fh)
        if vloss < best_v:  # keep disk small: save improvements only
            best_v = vloss
            torch.save(model.state_dict(), os.path.join(
                args.model_dir, checkpoint_name(epoch, vloss)))
    print(f"done; best vloss {best_v:.2f}")


def _load_frozen_video_trunk(model, video_ckpt_dir):
    """The reference AV recipe loads a pretrained video net and freezes
    the ResNet trunk (train_AV_net.py:176-187,241-245). For the duel the
    donor is a reference-format state dict trained by this harness's
    video mode, or an avvad_tpu checkpoint exported to torch naming via
    utils/torch_export (not needed for the audio duel)."""
    sd = torch.load(os.path.join(video_ckpt_dir, "video_trunk.pt"),
                    map_location="cpu")
    kept = {k: v for k, v in sd.items() if k.startswith("features.")}
    missing = model.load_state_dict(kept, strict=False)
    del missing
    for name, p in model.named_parameters():
        if name.startswith("features."):
            p.requires_grad = False
    print(f"loaded + froze video trunk ({len(kept)} tensors)")


def cmd_eval(args):
    from avvad_tpu.data import (AudioSequenceSource, AudioVisualSource,
                                DataLoader, VideoSequenceSource)
    from avvad_tpu.evaluate.predict import write_predictions

    processed = os.path.join(args.data_root, args.dataset_size, "processed/")
    if args.modality == "audio":
        source = AudioSequenceSource(processed, args.split, args.dataset_size,
                                     args.labels, upsampled=True)
    elif args.modality == "video":
        source = VideoSequenceSource(processed, args.split, args.labels,
                                     upsampled=True)
    else:
        source = AudioVisualSource(processed, args.split, args.dataset_size,
                                   args.labels, upsampled=True)
    print(f"{args.split} utterances: {len(source)}")

    ckpt, vloss = best_checkpoint(args.model_dir)
    print(f"best checkpoint: {os.path.basename(ckpt)} (vloss {vloss:.2f})")
    torch.manual_seed(args.seed)
    model = build_model(args)
    model.load_state_dict(torch.load(ckpt, map_location="cpu"))
    model.eval()
    norm = load_norm(args.model_dir, args)

    loader = DataLoader(source, batch_size=4, shuffle=False,
                        bucket=args.bucket, sort_pool_factor=4,
                        num_workers=1)
    t0 = time.perf_counter()
    n = 0
    for batch in loader:
        inputs, _, lengths = batch_tensors(batch, norm, args)
        with torch.no_grad():
            probs = torch.sigmoid(forward(model, inputs, lengths))
        for row in range(batch.batch_size):
            src_i = int(np.asarray(batch.indices)[row])
            if src_i < 0:
                continue
            T = int(lengths[row])
            pred = probs[row, :T].numpy()
            if pred.shape[-1] == 1:
                pred = pred[..., 0]
            else:
                pred = pred.T
            write_predictions(args.output_dir + os.sep,
                              source.rel_path(src_i), pred)
            n += 1
    print(f"wrote {n} prediction pairs in "
          f"{time.perf_counter() - t0:.1f}s -> {args.output_dir}")


def main():
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("cmd", choices=["train", "eval"])
    p.add_argument("--modality", choices=["audio", "video", "av"],
                   default="audio")
    p.add_argument("--data-root", default="runs/quality/data")
    p.add_argument("--dataset-size", choices=["subset", "complete"],
                   default="subset")
    p.add_argument("--labels", default="vad_labels")
    p.add_argument("--split", default="test")
    p.add_argument("--model-dir", required=True)
    p.add_argument("--output-dir", default=None)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lstm-hidden", type=int, default=1024)
    p.add_argument("--lstm-layers", type=int, default=2)
    p.add_argument("--y-dim", type=int, default=1)
    p.add_argument("--use-mcb", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--bucket", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--augment", action="store_true")
    p.add_argument("--pretrained-video", default=None)
    args = p.parse_args()
    torch.set_num_threads(max(1, os.cpu_count()))
    if args.cmd == "train":
        cmd_train(args)
    else:
        if not args.output_dir:
            p.error("eval requires --output-dir")
        cmd_eval(args)


if __name__ == "__main__":
    main()
