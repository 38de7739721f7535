"""Prediction writers: run a trained model over a split, save per-utterance
hard/soft frame predictions.

The reference fans batch-1 inference out over a spawn pool of GPUs
(/root/reference/scripts/evaluate_AV_net.py:252-339) and torch.saves
`<utt>_y_hat_{hard,soft}.pt` under `data/<size>/models/<classif_name>/`
(:239-250). TPU-first redesign: utterances are length-bucketed into padded
batches and classified by one jitted predict step (one XLA program per
bucket) — no process pool, no per-utterance launches; the utterance axis
shards over the mesh `data` dimension when more chips are available.
Outputs are `.npy` with the same naming scheme and directory layout.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

from ..data import DataLoader
from ..data.batching import bucket_length
from ..data.prewarm import prewarm_step
from ..train.steps import make_predict_step


def prediction_paths(classif_data_dir: str, proc_noisy_rel_path: str):
    """-> (hard_path, soft_path) for one utterance, reference layout."""
    stem = os.path.splitext(os.path.join(classif_data_dir, proc_noisy_rel_path))[0]
    return stem + "_y_hat_hard.npy", stem + "_y_hat_soft.npy"


def write_predictions(classif_data_dir: str, proc_noisy_rel_path: str,
                      y_hat_soft: np.ndarray) -> None:
    """Save hard/soft predictions for one utterance; (T,) or (T, y)."""
    hard_path, soft_path = prediction_paths(classif_data_dir, proc_noisy_rel_path)
    os.makedirs(os.path.dirname(hard_path), exist_ok=True)
    y_hat_hard = (y_hat_soft > 0.5).astype(np.int32)
    np.save(hard_path, y_hat_hard)
    np.save(soft_path, y_hat_soft)


def calibrate_quant_scales(state, model, source, modality: str,
                           norm_stats: Optional[dict] = None,
                           n_utts: int = 8, batch_size: int = 4,
                           bucket: int = 128, eps: float = 1e-8):
    """Record int8 activation scales for `tower_quant_mode="static"`.

    Runs up to `n_utts` utterances from `source` (normally the train
    split) through `model` cloned into calibrate mode — with exactly the
    normalization the predict step applies — accumulating per-point
    max-abs into the `quant` collection. Returns `state` with
    `state.quant` populated; serve/evaluate the static-mode model with it.
    """
    import jax

    from ..train.steps import _forward_inputs

    # calibration runs the XLA quant path (the Pallas trunk is static-only)
    clone_kw = {"tower_quant_mode": "calibrate"}
    if getattr(model, "tower_pallas", False):
        clone_kw["tower_pallas"] = False
    cal_model = model.clone(**clone_kw)

    @jax.jit
    def cal_step(variables, batch):
        inputs = _forward_inputs(modality, batch, norm_stats, eps)
        _, mutated = cal_model.apply(variables, *inputs, train=False,
                                     mutable=["quant"])
        return mutated["quant"]

    variables = state.variables()
    loader = DataLoader(source, batch_size=batch_size, shuffle=False,
                        bucket=bucket, pad_batch_to_full=True)
    seen = 0
    for batch in loader:
        variables = dict(variables)
        variables["quant"] = cal_step(variables, batch)
        seen += int((np.asarray(batch.indices) >= 0).sum())
        if seen >= n_utts:
            break
    return state.replace(quant=jax.device_get(variables["quant"]))


def planned_bucket_shapes(loader) -> list[int]:
    """Distinct padded time lengths `loader`'s batch plan will produce.

    Uses header-only length probes (no feature loads): the padded length of
    each planned batch is the bucketed max of its members' lengths."""
    shapes = set()
    for b in loader.batch_plan():
        t = max(loader._probe_length(int(i)) for i in b)
        shapes.add(bucket_length(t, loader.bucket, loader.bucket_ladder))
    return sorted(shapes)


def prewarm_predict(predict, state, loader, norm_stats,
                    max_workers: int = 4) -> dict:
    """AOT-compile every (B, T_pad) program the eval loop will need,
    concurrently; -> {(B, T): compiled executable}.

    Thin wrapper over `data.prewarm.prewarm_step` (the generic machinery,
    shared with the Trainer's first-epoch pre-warm); see BENCH_NOTES.md
    "cold-eval pre-warm" for the measured 8.08x cold-evaluation win."""
    return prewarm_step(predict, state, loader, norm_stats,
                        max_workers=max_workers)


def evaluate_split(
    state,
    source,
    modality: str,
    classif_data_dir: str,
    norm_stats: Optional[dict] = None,
    batch_size: int = 8,
    bucket: int = 128,
    bucket_ladder: bool = True,
    prewarm: bool = False,
    eps: float = 1e-8,
    verbose: bool = True,
    mesh=None,
) -> dict:
    """Classify every utterance of `source`, write predictions, return a
    wall-clock report (the reference's perf_counter harness,
    evaluate_AV_net.py:336-342).

    With `mesh`, batches shard over the mesh `data` axis — the TPU
    equivalent of the reference's multi-GPU spawn-pool fan-out
    (evaluate_AV_net.py:299-339), with XLA doing the scatter/gather.
    `batch_size` must then be a multiple of the data-axis size."""
    predict = make_predict_step(modality, eps)
    if mesh is not None:
        from ..parallel import shard_batch, shard_params

        if batch_size % mesh.devices.shape[0] != 0:
            raise ValueError(
                f"batch_size {batch_size} not divisible by data axis "
                f"{mesh.devices.shape[0]}"
            )
        state = state.replace(params=shard_params(mesh, state.params))
    # length-sorted pooling minimizes padding waste; safe with any batch
    # order because utterance identity rides on Batch.indices. The
    # geometric bucket ladder (default on) caps the number of distinct
    # padded shapes — a cold complete-corpus run compiles O(log T_max)
    # XLA programs instead of one per 128-frame length class; outputs are
    # identical because eval-mode forwards are trailing-pad-invariant
    # (causal LSTM scan, per-frame towers, running-stat BN) and padded
    # frames are dropped at write time.
    loader = DataLoader(source, batch_size=batch_size, shuffle=False,
                        bucket=bucket, bucket_ladder=bucket_ladder,
                        pad_batch_to_full=True, sort_pool_factor=4)

    t0 = time.perf_counter()
    # pre-warm: AOT-compile all planned bucket shapes concurrently before
    # the loop (XLA compile releases the GIL), so a cold run pays
    # max(compile times) instead of their sum. Single-device path only —
    # under a mesh the batches are re-sharded and the lazy jit path owns
    # the sharding propagation.
    compiled = {}
    prewarm_s = 0.0
    if prewarm and mesh is None:
        compiled = prewarm_predict(predict, state, loader, norm_stats)
        prewarm_s = time.perf_counter() - t0
    n_utts = 0
    n_frames = 0

    def drain(y_soft_dev, row_indices, lengths):
        """Fetch one batch's predictions and write its files."""
        nonlocal n_utts, n_frames
        y_soft = np.asarray(y_soft_dev)  # (B, T, y)
        for row in range(len(row_indices)):
            src_i = int(row_indices[row])
            length = int(lengths[row])
            if src_i < 0 or length == 0:
                continue  # padded batch row
            noisy_rel = source.rel_path(src_i)
            pred = y_soft[row, :length]
            if pred.shape[-1] == 1:
                pred = pred[..., 0]
            else:
                pred = pred.T  # (y, T): reference feature-major layout
            write_predictions(classif_data_dir, noisy_rel, pred)
            n_utts += 1
            n_frames += length

    # two-deep pipeline (same ordering rule as serve.tick_pipelined):
    # start the async D2H of batch N-1's predictions BEFORE dispatching
    # batch N, then write N-1's files while N computes — the device never
    # idles on host file I/O and the host never blocks on a per-batch sync
    pending = None  # (device predictions, row indices, lengths)
    for batch in loader:
        # utterance identity rides on the batch itself (indices; -1 on
        # padded rows), so shuffled or re-bucketed loaders can't mislabel
        # predictions
        row_indices = np.asarray(batch.indices)
        lengths = np.asarray(batch.lengths)
        if mesh is not None:
            from ..parallel import shard_batch

            batch = shard_batch(mesh, batch)
        if pending is not None:
            pending[0].copy_to_host_async()
        step = compiled.get((batch.batch_size, batch.max_frames), predict)
        y_dev = step(state, batch, norm_stats)
        prev, pending = pending, (y_dev, row_indices, lengths)
        if prev is not None:
            drain(*prev)
    if pending is not None:
        drain(*pending)

    elapsed = time.perf_counter() - t0
    report = {
        "n_utterances": n_utts,
        "n_frames": n_frames,
        "elapsed_s": elapsed,
        "prewarm_s": prewarm_s,
        "prewarmed_shapes": len(compiled),
        "audio_seconds": n_frames / 62.5,
        "rt_factor": (n_frames / 62.5) / elapsed if elapsed > 0 else float("inf"),
    }
    if verbose:
        print(f"evaluate_split: {n_utts} utts, {n_frames} frames in "
              f"{elapsed:.2f}s ({report['rt_factor']:.1f}x real time)")
    return report
