"""Orbax checkpointing: params + optimizer state + normalization stats.

Strict superset of the reference's save-only torch.save of model weights
(/root/reference/scripts/train_AV_net.py:441-448, which never saved the
optimizer and re-read normalization stats from dataset h5 at eval).
Directory names keep the reference's epoch/vloss convention so runs are
comparable at a glance.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def checkpoint_name(epoch: int, valid_loss: float) -> str:
    return f"epoch_{epoch:03d}_vloss_{valid_loss:.2f}"


_CKPT_RE = re.compile(r"epoch_(\d+)_vloss_([-\d.]+)$")


def save_checkpoint(model_dir: str, state, norm_stats: Optional[dict] = None,
                    epoch: int = 0, valid_loss: float = 0.0) -> str:
    """Save a full training checkpoint; returns the checkpoint path."""
    path = os.path.abspath(os.path.join(model_dir, checkpoint_name(epoch, valid_loss)))
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if state.batch_stats is not None:
        payload["batch_stats"] = state.batch_stats
    if state.sketch is not None:
        payload["sketch"] = state.sketch
    if state.quant is not None:
        payload["quant"] = state.quant
    if norm_stats:
        payload["norm_stats"] = {k: np.asarray(v) for k, v in norm_stats.items()
                                 if v is not None}
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(model_dir: str) -> Optional[str]:
    """Newest checkpoint dir by epoch number (resume support the reference
    lacked — its start_epoch constant never reloaded weights)."""
    if not os.path.isdir(model_dir):
        return None
    best = None
    for name in os.listdir(model_dir):
        m = _CKPT_RE.match(name)
        if m:
            epoch = int(m.group(1))
            if best is None or epoch > best[0]:
                best = (epoch, os.path.join(model_dir, name))
    return best[1] if best else None


def best_checkpoint(model_dir: str) -> Optional[str]:
    """Checkpoint with the lowest validation loss (ties -> later epoch) —
    the selection the reference made by hand when hard-coding a chosen
    `epoch_XXX_vloss_Y.YY.pt` filename (evaluate_AV_net.py:117)."""
    if not os.path.isdir(model_dir):
        return None
    best = None
    for name in os.listdir(model_dir):
        m = _CKPT_RE.match(name)
        if m:
            key = (float(m.group(2)), -int(m.group(1)))
            if best is None or key < best[0]:
                best = (key, os.path.join(model_dir, name))
    return best[1] if best else None


def resolve_checkpoint(path: str, prefer: str = "best") -> str:
    """Accept either a concrete epoch_* checkpoint dir or a model dir
    containing them; model dirs resolve to the best-vloss (or latest)
    checkpoint inside."""
    if _CKPT_RE.match(os.path.basename(os.path.normpath(path))):
        return path
    resolved = (best_checkpoint(path) if prefer == "best"
                else latest_checkpoint(path))
    if resolved is None:
        return path  # let the checkpointer produce its own error
    return resolved


def prune_checkpoints(model_dir: str, keep_latest: int = 1) -> int:
    """Delete checkpoints except the best-vloss one and the `keep_latest`
    newest epochs. A full AV TrainState (params + Adam moments) is ~380 MB;
    the reference's save-every-epoch habit (train_AV_net.py:441-448) costs
    tens of GB per run without this. Returns the number removed."""
    import shutil

    if not os.path.isdir(model_dir):
        return 0
    entries = []
    removed = 0
    for name in os.listdir(model_dir):
        # Sweep interrupted-save leftovers: Orbax stages into
        # *.orbax-checkpoint-tmp and renames on commit, so a tmp dir is
        # always a crashed save (resolution already ignores them; without
        # this they accumulate forever).
        if name.endswith(".orbax-checkpoint-tmp"):
            shutil.rmtree(os.path.join(model_dir, name))
            removed += 1
            continue
        m = _CKPT_RE.match(name)
        if m:
            entries.append((int(m.group(1)), float(m.group(2)), name))
    if len(entries) <= keep_latest + 1:
        return removed
    keep = {min(entries, key=lambda e: (e[1], -e[0]))[2]}  # best vloss
    entries.sort(reverse=True)
    keep.update(name for _, _, name in entries[:keep_latest])
    for _, _, name in entries:
        if name not in keep:
            shutil.rmtree(os.path.join(model_dir, name))
            removed += 1
    return removed


def restore_checkpoint(path: str, state, with_opt: bool = True):
    """Restore into an existing TrainState (template for tree structure).
    `path` may be a model dir (resolves to its best-vloss checkpoint).

    Returns (state, norm_stats, epoch)."""
    path = resolve_checkpoint(path)
    if not os.path.isdir(path):
        # fail here with the real reason: letting Orbax try first ends in
        # an opaque metadata TypeError for a simple missing path
        raise FileNotFoundError(f"no checkpoint at {path!r} (expected an "
                                "epoch_* dir or a model dir containing one)")
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if state.batch_stats is not None:
        template["batch_stats"] = state.batch_stats
    if state.sketch is not None:
        template["sketch"] = state.sketch

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    try:
        payload = ckptr.restore(path, target=None)
    except Exception:
        # target=None restores with the SAVED device topology, which fails
        # across platforms ("Device TPU v5 lite0 was not found" when a
        # TPU-written checkpoint is read on CPU). Rebuild the template from
        # the checkpoint's own metadata as device-free abstract arrays —
        # this restores every on-disk key (incl. ones absent from `state`,
        # like norm_stats) onto the default device.
        md = ckptr.metadata(path)
        md_tree = md.item_metadata if hasattr(md, "item_metadata") else md
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        abstract = jax.tree_util.tree_map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype,
                                           sharding=sharding),
            dict(md_tree),
        )
        payload = ckptr.restore(path, target=abstract)

    state = state.replace(
        params=payload["params"],
        batch_stats=payload.get("batch_stats", state.batch_stats),
        sketch=payload.get("sketch", state.sketch),
        quant=payload.get("quant", state.quant),
        step=payload.get("step", state.step),
    )
    if with_opt and "opt_state" in payload:
        restored_opt = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(state.opt_state),
            jax.tree_util.tree_leaves(payload["opt_state"]),
        )
        state = state.replace(opt_state=restored_opt)

    norm_stats = payload.get("norm_stats")
    m = _CKPT_RE.match(os.path.basename(path))
    epoch = int(m.group(1)) if m else 0
    return state, norm_stats, epoch


def _graft_trunk(tree, src_trunk, trunk_key: str):
    """Replace tree[trunk_key]['features'] (or tree['features']) with src."""
    tree = dict(tree)
    if trunk_key in tree:
        parent = dict(tree[trunk_key])
        parent["features"] = src_trunk
        tree[trunk_key] = parent
    else:
        tree["features"] = src_trunk
    return tree


def load_pretrained_trunk(path: str, params, batch_stats=None,
                          trunk_key: str = "tower"):
    """Copy the video trunk ('features' subtree) from a VideoVAD checkpoint
    into another model's variables — the reference's transfer-learning step
    (train_AV_net.py:176-187 keeps only 'features.*' keys, which in torch
    includes the BatchNorm running statistics; both params and batch_stats
    are grafted here accordingly).

    Returns params, or (params, batch_stats) when batch_stats is given.
    `path` may be a model dir (resolves to its best-vloss checkpoint)."""
    path = os.path.abspath(resolve_checkpoint(path))
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(path, target=None)
    src_p = payload["params"]
    src_trunk = src_p[trunk_key]["features"] if trunk_key in src_p \
        else src_p["features"]
    params = _graft_trunk(params, src_trunk, trunk_key)

    if batch_stats is None:
        return params
    src_bs = payload.get("batch_stats", {})
    src_bs_trunk = None
    if trunk_key in src_bs and "features" in src_bs[trunk_key]:
        src_bs_trunk = src_bs[trunk_key]["features"]
    elif "features" in src_bs:
        src_bs_trunk = src_bs["features"]
    if src_bs_trunk is not None:
        batch_stats = _graft_trunk(batch_stats, src_bs_trunk, trunk_key)
    return params, batch_stats
