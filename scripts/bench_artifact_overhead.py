"""Serving-artifact overhead check: exported StableHLO vs direct jit.

An exported serving artifact (avvad_tpu/export.py) should run at jit
speed — it is the same compiled executable reached through a different
entry path. This times both at a small serving shape with the chained
data-dependency + value-fetch methodology (per-call block_until_ready is
not a reliable barrier on the tunneled backend; see bench.py).

Usage: python scripts/bench_artifact_overhead.py [--b 8] [--t 64]
       [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def clock(f, wave, video, iters):
    out = f(wave, video)  # warm up / compile
    jax.block_until_ready(out)
    # Second warmup in the exact chained form the timed loop uses: for a
    # jitted EXPORTED program (unlike a plain jit fn) the carry-dependent
    # input lands in a distinct jit-cache entry, and its compile is slow
    # (measured 82 s at serving shape) and uncached — without this the
    # timed loop would average one full recompile into the result.
    carry = jax.tree_util.tree_leaves(out)[0].ravel()[0].astype(jnp.float32)
    out = f(wave + carry * 0.0, video)
    jax.block_until_ready(out)
    # keep the committed carry: the timed loop must reuse the exact
    # warmed form (a fresh python-scalar carry would be yet another entry)
    carry = jax.tree_util.tree_leaves(out)[0].ravel()[0].astype(jnp.float32)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(wave + carry * 0.0, video)
        leaf = jax.tree_util.tree_leaves(out)[0]
        carry = leaf[(0,) * leaf.ndim].astype(jnp.float32)
    float(carry)  # value fetch: the only reliable barrier here
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--t", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from avvad_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from avvad_tpu.export import ServingArtifact, make_waveform_serving_fn
    from avvad_tpu.models import AVVAD

    t, b = args.t, args.b
    n = 256 * (t - 1) + 1024
    model = AVVAD(lstm_hidden_size=1024, lstm_layers=2, use_mcb=True,
                  dtype=jnp.bfloat16)
    wave = jax.random.normal(jax.random.PRNGKey(0), (b, n))
    video = jax.random.normal(jax.random.PRNGKey(1), (b, t, 67, 67))
    variables = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 4, 513)),
                           jnp.zeros((1, 4, 67, 67)))
    fn = make_waveform_serving_fn(model, variables, t_frames=t)
    jitted = jax.jit(fn)
    art = ServingArtifact.build({"e": (fn, (wave, video))})
    d = clock(jitted, wave, video, args.iters)
    a = clock(lambda w, v: art.call("e", w, v), wave, video, args.iters)
    print(f"direct jit: {d*1e3:.2f} ms; artifact.call: {a*1e3:.2f} ms; "
          f"overhead: {(a-d)*1e3:+.2f} ms ({(a/d-1)*100:+.1f}%)")


if __name__ == "__main__":
    main()
