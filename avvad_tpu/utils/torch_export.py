"""Export Flax parameter trees to reference (PyTorch) state-dict naming.

The inverse of utils.torch_import: where that module lets reference users
bring trained torch checkpoints INTO this framework, this one exports
avvad_tpu-trained weights OUT in the reference's own layout — the
'features.N.*' nn.Sequential naming that DeepVAD_{video,AV} use for the
torchvision resnet18 trunk (/root/reference/packages/models/AV_Net.py:25-28
strips the FC layer and wraps the children in nn.Sequential, so conv1 is
'features.0', bn1 'features.1', layer1..4 'features.4..7').

Primary consumer: the head-to-head quality duel (scripts/duel_reference.py),
which trains the reference's actual DeepVAD_AV with the SAME frozen video
trunk this framework's AV model uses, so both sides differ only in the
trained fusion/LSTM/head weights.

Conversions (exact inverses of torch_import):
- Conv kernel HWIO -> OIHW; BatchNorm scale/bias + batch_stats mean/var ->
  weight/bias/running_mean/running_var (+ a zero num_batches_tracked so
  strict torch loads also succeed).
"""

from __future__ import annotations

import numpy as np

# our module name -> torchvision-after-Sequential index (see
# torch_import._SEQ_IDX for the inverse map)
_SEQ_IDX = {"conv1": 0, "bn1": 1, "layer1": 4, "layer2": 5, "layer3": 6,
            "layer4": 7}


def _conv(kernel) -> np.ndarray:
    return np.transpose(np.asarray(kernel), (3, 2, 0, 1))  # HWIO -> OIHW


def _bn(out: dict, prefix: str, p: dict, bs: dict) -> None:
    out[f"{prefix}.weight"] = np.asarray(p["scale"])
    out[f"{prefix}.bias"] = np.asarray(p["bias"])
    out[f"{prefix}.running_mean"] = np.asarray(bs["mean"])
    out[f"{prefix}.running_var"] = np.asarray(bs["var"])
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def export_resnet18_trunk(params: dict, batch_stats: dict,
                          prefix: str = "features.") -> dict:
    """avvad_tpu.models.ResNet18 (params, batch_stats) trees -> flat
    {f'{prefix}N....': numpy array} in the reference's Sequential naming."""
    out: dict[str, np.ndarray] = {}
    out[f"{prefix}{_SEQ_IDX['conv1']}.weight"] = _conv(
        params["conv1"]["kernel"])
    _bn(out, f"{prefix}{_SEQ_IDX['bn1']}", params["bn1"],
        batch_stats["bn1"])

    for stage in range(1, 5):
        seq = _SEQ_IDX[f"layer{stage}"]
        for block in range(2):
            p = params[f"layer{stage}_{block}"]
            bs = batch_stats[f"layer{stage}_{block}"]
            t = f"{prefix}{seq}.{block}"
            out[f"{t}.conv1.weight"] = _conv(p["conv1"]["kernel"])
            out[f"{t}.conv2.weight"] = _conv(p["conv2"]["kernel"])
            _bn(out, f"{t}.bn1", p["bn1"], bs["bn1"])
            _bn(out, f"{t}.bn2", p["bn2"], bs["bn2"])
            if "downsample_conv" in p:
                out[f"{t}.downsample.0.weight"] = _conv(
                    p["downsample_conv"]["kernel"])
                _bn(out, f"{t}.downsample.1", p["downsample_bn"],
                    bs["downsample_bn"])
    return out


def export_video_trunk_pt(checkpoint: str, out_path: str,
                          trunk_key: str = "tower") -> int:
    """Write `video_trunk.pt` (torch state dict of 'features.*' tensors)
    from an avvad_tpu VideoVAD/AVVAD checkpoint dir or path.

    Returns the number of tensors written. torch imported lazily — the
    library itself stays torch-free."""
    import orbax.checkpoint as ocp
    import torch

    from ..train.checkpoint import resolve_checkpoint

    import os

    path = os.path.abspath(resolve_checkpoint(checkpoint))
    payload = ocp.StandardCheckpointer().restore(path, target=None)
    params = payload["params"]
    stats = payload.get("batch_stats", {})
    if trunk_key in params:
        params, stats = params[trunk_key], stats.get(trunk_key, {})
    flat = export_resnet18_trunk(params["features"], stats["features"])
    sd = {k: torch.from_numpy(np.array(v, dtype=np.float32, copy=True))
          if np.asarray(v).dtype != np.int64 else torch.tensor(int(v))
          for k, v in flat.items()}
    torch.save(sd, out_path)
    return len(sd)
