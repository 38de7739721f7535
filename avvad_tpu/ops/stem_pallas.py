"""Pallas fused ResNet stem epilogue: affine(BN) + ReLU + quantize +
3x3/2 max pool, one pass over the stem conv output.

STATUS: correct (exact vs the XLA reference, pinned by test on CPU
interpret and verified on TPU) but a MEASURED NEGATIVE on this backend —
64 ms vs XLA's 17.6 ms for the same epilogue at the serving shape
(15,744 frames), so it is NOT wired into the serving path. The traffic
argument was sound (the XLA stem spends most of its ~14 ms materializing
intermediates between the conv and the pooled int8 output), but Mosaic's
vector relayouts dominate: the 34/36-sublane spatial dims are not
tile-aligned, every shifted window max needs a sublane relayout, integer
max does not legalize (forcing bf16 pool temps), and mid-dim reshapes /
strided slices are unsupported (forcing the split row/column pooling
below with an XLA-side final decimation). Kept as a working reference
for revisiting on a Mosaic version with better small-dim layouts; the
measurements live in BENCH_NOTES.md.

Fusion math: inference BatchNorm is per-channel affine A*x + B; folding
the static quantization scale s gives q = round(max((A/s)*x + B/s, 0))
— so the kernel needs only two (C,) vectors. The 3x3 stride-2 SAME max
pool commutes with the monotone round/clip, and is computed as the max
of 9 parity-decomposed slices (a stride-2 slice of a padded array is a
reshape-to-(blocks, 2) + slice — no strided gather).

Numerics vs the unfused path: (A/s)*x + B/s instead of (A*x + B)/s —
same f32 math reassociated, so isolated quantization-boundary values can
flip one LSB (the documented int8 trunk noise class).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TN = 4  # frames per grid step (bounds per-step VMEM temps under 16 MB)


def _stem_epilogue_kernel(x_ref, a_ref, b_ref, o_ref):
    """Mosaic constraints shape this: no strided slices, and reshapes only
    on leading (non sublane/lane) dims. Row decimation therefore uses a
    leading-dim reshape; column windows use unit-stride sublane slices and
    the final stride-2 column decimation happens OUTSIDE (cheap XLA slice
    on an int8 tensor half the conv output's size)."""
    x = x_ref[:].astype(jnp.float32)                      # (TN, 34, 34, C)
    a = a_ref[:].reshape(1, 1, 1, -1)
    b = b_ref[:].reshape(1, 1, 1, -1)
    y = jnp.maximum(x * a + b, 0.0)
    # Quantize BEFORE pooling (exact: max commutes with the monotone
    # round/clip), but hold the quantized integers in bf16 — values are
    # integers in [0, 127], all exactly representable — because Mosaic
    # does not legalize integer max (arith.maxsi) while float max is
    # native VPU; bf16 also halves the pool temps vs f32.
    q = jnp.clip(jnp.round(y), 0.0, 127.0).astype(jnp.bfloat16)
    tn, _, _, c = q.shape
    neg = jnp.bfloat16(-128)  # SAME-pad sentinel: relu output >= 0
    qp = jnp.pad(q, ((0, 0), (1, 1), (0, 0), (0, 0)),
                 constant_values=neg)                     # (TN, 36, 34, C)
    m1 = jnp.maximum(jnp.maximum(qp[:, 0:34], qp[:, 1:35]), qp[:, 2:36])
    rm = m1.reshape(tn, 17, 2, 34, c)[:, :, 0]            # rows 0,2,..,32
    rp = jnp.pad(rm, ((0, 0), (0, 0), (1, 1), (0, 0)),
                 constant_values=neg)                     # (TN, 17, 36, C)
    o_ref[:] = jnp.maximum(
        jnp.maximum(rp[:, :, 0:34], rp[:, :, 1:35]),
        rp[:, :, 2:36]).astype(jnp.int8)


@jax.jit
def stem_epilogue_pool_quant(x: jax.Array, a: jax.Array,
                             b: jax.Array) -> jax.Array:
    """(N, 34, 34, C) conv output -> (N, 17, 17, C) int8.

    q = clip(round(maxpool3x3s2p1(relu(a*x + b))), -127, 127), with the
    pool's SAME padding excluded from the max (reduce_window semantics).
    `a`, `b` are the folded (C,) BN-affine-over-quant-scale vectors.
    """
    n, h, w, c = x.shape
    if h != 34 or w != 34:
        raise ValueError(f"stem epilogue expects (N, 34, 34, C), got {x.shape}")
    pad = (-n) % _TN
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0), (0, 0)))
    a2 = a.reshape(1, c).astype(jnp.float32)
    b2 = b.reshape(1, c).astype(jnp.float32)
    out = pl.pallas_call(
        _stem_epilogue_kernel,
        grid=((n + pad) // _TN,),
        in_specs=[
            pl.BlockSpec((_TN, 34, 34, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TN, 17, 34, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(((n + pad), 17, 34, c), jnp.int8),
        interpret=jax.devices()[0].platform == "cpu",
    )(x, a2, b2)
    # final stride-2 column decimation (cols 0, 2, ..., 32) in XLA
    return out[:n, :, 0:34:2]


def stem_epilogue_reference(x: jax.Array, a: jax.Array,
                            b: jax.Array) -> jax.Array:
    """XLA reference for tests: same math, unfused."""
    y = jnp.maximum(x.astype(jnp.float32) * a.reshape(1, 1, 1, -1)
                    + b.reshape(1, 1, 1, -1), 0.0)
    p = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jnp.clip(jnp.round(p), -127, 127).astype(jnp.int8)
