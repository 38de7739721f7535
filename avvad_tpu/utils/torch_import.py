"""Import reference (PyTorch) checkpoints into Flax parameter trees.

Lets users of the reference migrate trained weights directly: its
checkpoints are torch state_dicts of DeepVAD_{audio,video,AV}
(/root/reference/scripts/train_AV_net.py:443-448) whose submodules are
torchvision resnet18 ('features.*'), nn.LSTM ('lstm_*'), and nn.Linear
('vad_*') — all with stable, documented layouts.

Conversions:
- Conv2d OIHW -> HWIO; Linear (out, in) -> (in, out);
- BatchNorm weight/bias/running_mean/running_var -> scale/bias + batch_stats;
- LSTM: see models.lstm.lstm_import_torch_weights (gate order [i,f,g,o]).
"""

from __future__ import annotations

from typing import Any

import numpy as np


def load_torch_state_dict(path: str) -> dict:
    """Load a torch .pt state dict as {name: numpy array} (CPU, no grad)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().numpy() for k, v in state.items()}


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _bn(state: dict, prefix: str):
    return (
        {"scale": state[f"{prefix}.weight"], "bias": state[f"{prefix}.bias"]},
        {"mean": state[f"{prefix}.running_mean"],
         "var": state[f"{prefix}.running_var"]},
    )


# torchvision resnet18 wraps children in an nn.Sequential when the FC layer
# is stripped ('features.N...'); index -> our module name.
_SEQ_IDX = {0: "conv1", 1: "bn1", 4: "layer1", 5: "layer2", 6: "layer3",
            7: "layer4"}


def _normalize_resnet_keys(state: dict, prefix: str) -> dict:
    """Strip `prefix` and map Sequential indices to torchvision names."""
    out = {}
    for k, v in state.items():
        if prefix and not k.startswith(prefix):
            continue
        k = k[len(prefix):] if prefix else k
        parts = k.split(".")
        if parts[0].isdigit():
            idx = int(parts[0])
            if idx not in _SEQ_IDX:
                continue
            parts[0] = _SEQ_IDX[idx]
            k = ".".join(parts)
        out[k] = v
    return out


def import_torch_resnet18(state: dict, prefix: str = "features."):
    """torchvision resnet18 state (trunk) -> (params, batch_stats) trees
    matching avvad_tpu.models.ResNet18."""
    s = _normalize_resnet_keys(state, prefix)
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    params["conv1"] = {"kernel": _conv(s["conv1.weight"])}
    params["bn1"], stats["bn1"] = _bn(s, "bn1")

    for stage in range(1, 5):
        for block in range(2):
            name = f"layer{stage}_{block}"
            t = f"layer{stage}.{block}"
            p: dict[str, Any] = {
                "conv1": {"kernel": _conv(s[f"{t}.conv1.weight"])},
                "conv2": {"kernel": _conv(s[f"{t}.conv2.weight"])},
            }
            st: dict[str, Any] = {}
            p["bn1"], st["bn1"] = _bn(s, f"{t}.bn1")
            p["bn2"], st["bn2"] = _bn(s, f"{t}.bn2")
            if f"{t}.downsample.0.weight" in s:
                p["downsample_conv"] = {"kernel": _conv(s[f"{t}.downsample.0.weight"])}
                # torch names the shortcut BN 'downsample.1'
                p["downsample_bn"], st["downsample_bn"] = _bn(s, f"{t}.downsample.1")
            params[name] = p
            stats[name] = st
    return params, stats


def import_torch_lstm(params, state: dict, prefix: str):
    """Delegate to models.lstm.lstm_import_torch_weights."""
    from ..models.lstm import lstm_import_torch_weights

    return lstm_import_torch_weights(params, state, prefix)


def import_torch_linear(state: dict, prefix: str):
    """nn.Linear -> flax Dense params."""
    p = {"kernel": np.transpose(state[f"{prefix}.weight"])}
    if f"{prefix}.bias" in state:
        p["bias"] = state[f"{prefix}.bias"]
    return p


def _bn1d(state: dict, prefix: str):
    return (
        {"scale": state[f"{prefix}.weight"], "bias": state[f"{prefix}.bias"]},
        {"mean": state[f"{prefix}.running_mean"],
         "var": state[f"{prefix}.running_var"]},
    )


def import_reference_audio_vad(state: dict, variables: dict) -> dict:
    """DeepVAD_audio torch state dict -> AudioVAD variables
    (lstm_audio.* + vad_audio.*; Audio_Net.py:30-35)."""
    params = dict(variables["params"])
    params["lstm_audio"] = import_torch_lstm(
        params["lstm_audio"], state, prefix="lstm_audio")
    params["vad_audio"] = import_torch_linear(state, "vad_audio")
    return {"params": params, **{k: v for k, v in variables.items()
                                 if k != "params"}}


def import_reference_video_vad(state: dict, variables: dict) -> dict:
    """DeepVAD_video torch state dict -> VideoVAD variables
    (features.* trunk + lstm_video.* + vad_video.*; Video_Net.py:35-51)."""
    params = dict(variables["params"])
    batch_stats = dict(variables.get("batch_stats", {}))

    trunk_p, trunk_bs = import_torch_resnet18(state, prefix="features.")
    tower_p = dict(params["tower"])
    tower_p["features"] = trunk_p
    params["tower"] = tower_p
    if "tower" in batch_stats:
        tower_bs = dict(batch_stats["tower"])
        tower_bs["features"] = trunk_bs
        batch_stats["tower"] = tower_bs

    params["lstm_video"] = import_torch_lstm(
        params["lstm_video"], state, prefix="lstm_video")
    params["vad_video"] = import_torch_linear(state, "vad_video")

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def import_reference_avvad(state: dict, model, variables: dict) -> dict:
    """Assemble a full DeepVAD_AV torch state_dict into AVVAD variables.

    Maps every reference parameter group
    (/root/reference/packages/models/AV_Net.py:12-141):
      features.*            -> params/batch_stats tower.features (ResNet trunk)
      lstm_merged.*         -> params lstm_merged (gate-order-compatible)
      vad_merged.*          -> params vad_merged
      mcb.sketch{1,2}.{h,s} -> sketch collection (dense sign matrices)
      mcb_bn.*              -> params/batch_stats mcb_bn
    `variables` (from model.init) supplies the target tree; returns a new
    variables dict ready for model.apply.
    """
    from ..models.mcb import sketch_matrix_from_hs

    params = dict(variables["params"])
    batch_stats = dict(variables.get("batch_stats", {}))
    sketch = dict(variables.get("sketch", {}))

    # video trunk
    trunk_p, trunk_bs = import_torch_resnet18(state, prefix="features.")
    tower_p = dict(params["tower"])
    tower_p["features"] = trunk_p
    params["tower"] = tower_p
    if "tower" in batch_stats:
        tower_bs = dict(batch_stats["tower"])
        tower_bs["features"] = trunk_bs
        batch_stats["tower"] = tower_bs

    # merged LSTM + head
    params["lstm_merged"] = import_torch_lstm(
        params["lstm_merged"], state, prefix="lstm_merged")
    params["vad_merged"] = import_torch_linear(state, "vad_merged")

    # MCB buffers + batch norm
    if model.use_mcb:
        sketch["mcb"] = {
            "sketch1": sketch_matrix_from_hs(
                state["mcb.sketch1.h"], state["mcb.sketch1.s"],
                model.mcb_output_size),
            "sketch2": sketch_matrix_from_hs(
                state["mcb.sketch2.h"], state["mcb.sketch2.s"],
                model.mcb_output_size),
        }
        bn_p, bn_bs = _bn1d(state, "mcb_bn")
        params["mcb_bn"] = bn_p
        batch_stats["mcb_bn"] = bn_bs

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    if sketch:
        out["sketch"] = sketch
    return out
