"""Probe: can cold-eval compile latency be cut by (a) concurrent AOT
compilation across threads, (b) the JAX persistent compilation cache?

Evidence gathering for the evaluation pre-warm design (ROADMAP open item:
"Evaluation bucket-compile amortization"). Prints one JSON line per probe.

Usage:
  python scripts/probe_compile_parallel.py serial    # N shapes, one thread
  python scripts/probe_compile_parallel.py parallel  # N shapes, thread pool
  python scripts/probe_compile_parallel.py cache     # compile twice w/ cache dir
"""

from __future__ import annotations

import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

# distinct T so each shape is a genuinely separate XLA program, sized like
# the eval ladder's LSTM programs (2x1024 scan over T)
SHAPES = [512, 768, 1024, 1536]


def model_apply(w, x):
    # stand-in for the predict step: per-frame matmul + scan LSTM-ish cell
    def cell(h, xt):
        h = jnp.tanh(xt @ w["wx"] + h @ w["wh"])
        return h, h

    xw = jnp.einsum("btf,fh->bth", x, w["inp"])
    h0 = jnp.zeros((x.shape[0], 1024), jnp.float32)
    _, ys = jax.lax.scan(cell, h0, jnp.swapaxes(xw, 0, 1))
    return jnp.swapaxes(ys, 0, 1) @ w["out"]


def make_inputs():
    rng = np.random.default_rng(0)
    w = {
        "inp": jnp.asarray(rng.normal(size=(513, 1024)), jnp.float32),
        "wx": jnp.asarray(rng.normal(size=(1024, 1024)), jnp.float32),
        "wh": jnp.asarray(rng.normal(size=(1024, 1024)), jnp.float32),
        "out": jnp.asarray(rng.normal(size=(1024, 1)), jnp.float32),
    }
    xs = {t: np.zeros((8, t, 513), np.float32) for t in SHAPES}
    return w, xs


def compile_all(parallel: bool):
    w, xs = make_inputs()
    fn = jax.jit(model_apply)
    lowered = {t: fn.lower(w, xs[t]) for t in SHAPES}
    t0 = time.perf_counter()
    if parallel:
        with ThreadPoolExecutor(max_workers=len(SHAPES)) as ex:
            compiled = list(ex.map(lambda low: low.compile(), lowered.values()))
    else:
        compiled = [low.compile() for low in lowered.values()]
    dt = time.perf_counter() - t0
    # sanity: compiled executables run
    y = compiled[0](w, xs[SHAPES[0]])
    jax.block_until_ready(y)
    return dt


def jit_calls():
    """The lazy path the eval loop takes without prewarm: first jit call
    per shape (trace + compile + transfer + execute), timed per shape."""
    w, xs = make_inputs()
    fn = jax.jit(model_apply)
    per_shape = {}
    for t in SHAPES:
        t0 = time.perf_counter()
        jax.block_until_ready(fn(w, xs[t]))
        per_shape[t] = round(time.perf_counter() - t0, 2)
    # transfer-only control: a fresh same-size buffer H2D
    x = np.zeros_like(xs[SHAPES[-1]])
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(x))
    put_s = round(time.perf_counter() - t0, 2)
    return per_shape, put_s


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "serial"
    if mode == "jitcalls":
        per_shape, put_s = jit_calls()
        print(json.dumps({"probe": "jitcalls", "first_call_s": per_shape,
                          "device_put_control_s": put_s}))
        return
    if mode == "cache":
        cache_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/avvad_xla_cache"
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        dt = compile_all(parallel=False)
        print(json.dumps({"probe": "cache", "dir": cache_dir,
                          "n_shapes": len(SHAPES), "compile_s": round(dt, 2)}))
    else:
        dt = compile_all(parallel=(mode == "parallel"))
        print(json.dumps({"probe": mode, "n_shapes": len(SHAPES),
                          "compile_s": round(dt, 2)}))


if __name__ == "__main__":
    main()
