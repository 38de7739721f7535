"""Concurrent AOT pre-compilation of a loader's planned batch shapes.

A cold run of any jitted step is compile-bound: the lazy jit dispatch path
compiles one XLA program per (batch, time) shape, serially, as batches
arrive — and on a remote-compile backend each compile is tens of seconds.
The shapes are fully predictable from the loader's batch plan (header-only
length probes), so they can be lowered up front and compiled on a thread
pool (XLA compilation releases the GIL; the backend compiles the programs
concurrently): the cold run then pays ~max(compile times) instead of
their sum. Measured 8.08x on a duration-diverse cold evaluation — see
BENCH_NOTES.md "cold-eval pre-warm".

Generic over any step with the `(state, batch, norm_stats)` signature
(predict / train / eval steps all share it); donation and custom
in-step normalization are preserved because lowering goes through the
jitted callable itself.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import numpy as np

from .batching import Batch, bucket_length


def planned_batch_shapes(loader) -> list[tuple[int, int]]:
    """Distinct (batch_rows, padded_time) shapes `loader`'s plan produces.

    Header-only length probes (no feature loads): each planned batch pads
    to the bucketed max of its members' lengths; the row count is the
    loader batch size except for an unpadded final partial batch."""
    shapes = set()
    pad_to = loader.batch_size if loader.pad_batch_to_full else None
    for b in loader.batch_plan():
        t = max(loader._probe_length(int(i)) for i in b)
        t_pad = bucket_length(t, loader.bucket, loader.bucket_ladder)
        shapes.add((pad_to or len(b), t_pad))
    return sorted(shapes)


def dummy_batch(probe_item: dict, batch_size: int, t_pad: int) -> Batch:
    """A zeros Batch with the exact pytree structure / dtypes pad_batch
    would produce for this source at (batch_size, t_pad) — the AOT
    compile stand-in. Feature trailing dims come from one real item."""

    def zeros_like_field(key):
        if key not in probe_item:
            return None
        trailing = np.asarray(probe_item[key]).shape[1:]
        return np.zeros((batch_size, t_pad) + trailing, dtype=np.float32)

    lengths = np.full((batch_size,), t_pad, dtype=np.int32)
    return Batch(
        audio=zeros_like_field("audio"),
        video=zeros_like_field("video"),
        label=zeros_like_field("label"),
        lengths=lengths,
        mask=np.ones((batch_size, t_pad), dtype=np.float32),
        indices=np.zeros((batch_size,), dtype=np.int32),
    )


def prewarm_step(step, state, loader, norm_stats,
                 skip=frozenset(), max_workers: int = 4) -> dict:
    """AOT-compile every (B, T_pad) program `loader` will feed `step`,
    concurrently; -> {(B, T): compiled executable}.

    `step` is a jitted `(state, batch, norm_stats)` callable. Shapes in
    `skip` (already compiled by a previous epoch) are not re-lowered.
    The executables are exact-aval matches for the loop's batches, so the
    hot loop can call them directly and fall back to the lazy jit path
    for any shape not in the map.

    Waveform sources are skipped (the waveform axis is not bucketed, so
    shapes are not predictable from length probes): returns {} and the
    caller stays on lazy jit.
    """
    shapes = [s for s in planned_batch_shapes(loader) if s not in skip]
    if not shapes:
        return {}
    probe_item = loader.source[0]
    if "waveform" in probe_item:
        return {}
    lowered = {
        (b, t): step.lower(state, dummy_batch(probe_item, b, t), norm_stats)
        for (b, t) in shapes
    }
    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        return dict(zip(
            lowered.keys(),
            ex.map(lambda low: low.compile(), lowered.values()),
        ))
