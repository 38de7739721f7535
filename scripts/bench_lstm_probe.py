"""LSTM recurrence micro-probe: where do the 9.1 ms go?

The serving LSTM (ops/lstm_pallas.py) is measured at ~31% of bf16 MXU
peak with B=64 of 128 sublane rows filled (BENCH_NOTES.md). This probe
splits the per-step cost into its parts to find the next lever:

  full      — the shipped kernel (fp32 h state, bf16 W_hh)
  h_bf16    — variant casting h to bf16 before the (B,H)x(H,4H) dot
              (if Mosaic runs the fp32xbf16 dot as multi-pass, this
              halves/quarters the MXU time at ~1e-2 state precision)
  gates_only— matmul removed (gates = x_proj only): isolates the VPU
              sigmoid/tanh/elementwise cost per step
  matmul_only — gate math removed (h = dot result slice): isolates MXU
  frontend  — log_power_frontend direct vs hop_dft at serving shape

Run on the TPU (compiles each variant once; pipelined timing with a
fetch barrier). Usage: python scripts/bench_lstm_probe.py [--b 64]
[--t 512] [--h 1024] [--iters 30]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(fn, args, iters):
    """Pipelined timing with a forced data dependency: each iteration's
    first argument depends on the previous output, so the runtime cannot
    elide or dedupe repeated identical dispatches, and the final value
    fetch is the barrier. (Per-call ``block_until_ready`` is NOT a
    reliable sync on the tunneled backend — identical re-dispatches were
    measured at impossible >10 PF/s rates; see bench.py ``time_serve``.)"""
    out = fn(*args)  # warm up / compile
    leaf = jax.tree_util.tree_leaves(out)[0]
    leaf.block_until_ready()
    first, rest = args[0], args[1:]
    # second warmup in the exact chained form the loop uses: for some
    # programs the carry-dependent input lands in a SECOND jit-cache
    # entry whose recompile would otherwise be averaged into the loop
    # (measured: a 75 s recompile hiding in 30 "85 ms" iterations)
    carry = leaf[(0,) * leaf.ndim].astype(jnp.float32)
    out = fn(first + carry * 0.0, *rest)
    leaf = jax.tree_util.tree_leaves(out)[0]
    leaf.block_until_ready()
    carry = leaf[(0,) * leaf.ndim].astype(jnp.float32)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(first + carry * 0.0, *rest)
        leaf = jax.tree_util.tree_leaves(out)[0]
        carry = leaf[(0,) * leaf.ndim].astype(jnp.float32)
    float(carry)  # value fetch: the only reliable barrier here
    return (time.perf_counter() - t0) / iters * 1e3


def _variant_kernel(mode):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from avvad_tpu.ops.lstm_pallas import _gate_math

    def kernel(xp_ref, w_ref, h0_ref, c0_ref, y_ref, h_scr, c_scr):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            h_scr[:] = h0_ref[:]
            c_scr[:] = c0_ref[:]

        if mode == "gates_only":
            gates = xp_ref[0]
        elif mode == "h_bf16":
            gates = xp_ref[0] + jnp.dot(
                h_scr[:].astype(jnp.bfloat16), w_ref[:],
                preferred_element_type=jnp.float32)
        else:
            gates = xp_ref[0] + jnp.dot(
                h_scr[:], w_ref[:], preferred_element_type=jnp.float32)
        if mode == "matmul_only":
            h = gates[:, : h_scr.shape[-1]]
            c = c_scr[:]
        else:
            _, _, _, _, c, h = _gate_math(gates, c_scr[:])
        c_scr[:] = c
        h_scr[:] = h
        y_ref[0] = h

    def call(xp, w_hh, h0, c0):
        from jax.experimental import pallas as pl  # noqa: F811

        t, b, h4 = xp.shape
        h = h4 // 4
        return pl.pallas_call(
            kernel,
            grid=(t,),
            in_specs=[
                pl.BlockSpec((1, b, h4), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((h, h4), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b, h), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b, h), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, b, h), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t, b, h), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((b, h), jnp.float32),
                pltpu.VMEM((b, h), jnp.float32),
            ],
        )(xp, w_hh.astype(jnp.bfloat16), h0, c0)

    return jax.jit(call)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--t", type=int, default=512)
    ap.add_argument("--h", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--modes", default="full,matmul_only,gates_only,h_bf16",
                    help="comma list of probe-kernel variants; 'full' "
                    "carries the mixed fp32xbf16 dot that the current "
                    "Mosaic lowers catastrophically (BENCH_NOTES round 5) "
                    "— exclude it, or run it alone with --iters 2, to "
                    "bound the probe's wall time")
    args = ap.parse_args()

    from avvad_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    b, t, h = args.b, args.t, args.h
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.normal(size=(t, b, 4 * h)).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.normal(size=(h, 4 * h)).astype(np.float32) * 0.02)
    h0 = jnp.zeros((b, h), jnp.float32)
    c0 = jnp.zeros((b, h), jnp.float32)

    flops = t * b * h * 4 * h * 2
    print(f"B={b} T={t} H={h}; recurrent matmul = {flops/1e9:.1f} GFLOP/layer")
    base = None
    modes = [m for m in args.modes.split(",") if m]
    for mode in modes:
        fn = _variant_kernel(mode)
        ms = _timeit(fn, (xp, w, h0, c0), args.iters)
        eff = flops / (ms * 1e-3) / 1e12
        note = f"  {eff:6.1f} TF/s" if mode != "gates_only" else ""
        print(f"{mode:12s} {ms:7.2f} ms{note}")
        if mode == "full":
            base = fn(xp, w, h0, c0)
        if mode == "h_bf16" and base is not None:
            d = float(jnp.abs(fn(xp, w, h0, c0) - base).max())
            print(f"             h_bf16 max|dh| vs full: {d:.3e}")

    # shipped API: default vs quantized-state variants (B,T layout)
    from avvad_tpu.ops.lstm_pallas import lstm_layer_fused

    # jit the call: EAGER pallas dispatch through the tunnel inflates
    # these wildly and unevenly (measured 32 ms eager vs 5.4 ms jitted
    # for state_quant="none" at this shape) — only jitted numbers are
    # comparable to the serving step, which always runs under jit
    xp_bt = jnp.swapaxes(xp, 0, 1)
    for sq in ("none", "bf16", "int8"):
        fn = jax.jit(functools.partial(lstm_layer_fused, state_quant=sq))
        ms = _timeit(fn, (xp_bt, w), args.iters)
        eff = flops / (ms * 1e-3) / 1e12
        print(f"lstm_layer_fused[{sq:4s}] {ms:7.2f} ms  {eff:6.1f} TF/s")

    # frontend: direct vs hop-block DFT at the serving shape
    from avvad_tpu.ops.stft import log_power_frontend

    fs, hop = 16000, 256
    n = hop * (args.t - 1) + 1024
    wave = jnp.asarray(rng.normal(size=(args.b, n)).astype(np.float32) * 0.3)
    for hd in (False, True):
        fn = functools.partial(log_power_frontend, fs=fs, wlen_sec=64e-3,
                               hop_percent=0.25, center=False,
                               pad_at_end=True, hop_dft=hd)
        ms = _timeit(fn, (wave,), args.iters)
        print(f"frontend hop_dft={hd!s:5s} {ms:7.2f} ms")


if __name__ == "__main__":
    main()
