"""Pallas fused LSTM layer: weight-stationary recurrence on TPU.

Motivation: an XLA `lax.scan` LSTM re-reads the (H, 4H) recurrent kernel
from HBM on every timestep — at H=1024/fp32 that is 16 MB x T steps of
pure weight traffic (8 GB for a 512-frame utterance), which dwarfs the
actual compute. This kernel makes the recurrence weight-stationary:

- grid = (T,): TPU grid steps run sequentially on the core, so the hidden
  and cell state live in VMEM scratch and persist across steps;
- W_hh uses a constant index_map, so the Pallas pipeline emitter keeps it
  resident in VMEM instead of re-fetching (one DMA total). It is held in
  bfloat16: fp32 at H=1024 is 16 MB and alone exhausts the 16 MB VMEM
  budget; the MXU consumes bf16 operands natively with fp32 accumulation,
  so only the weight storage (not the accumulation) loses precision;
- the per-step input projections x_proj[t] (precomputed for ALL timesteps
  as one large MXU matmul outside the kernel) stream through the grid
  pipeline with automatic double buffering (128 KB/step);
- gate math (sigmoid/tanh/elementwise) fuses on the VPU right after the
  (B, H) x (H, 4H) MXU contraction.

Gate layout matches models.lstm.LSTMCellFused / torch: [i, f, g, o].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_kernel(xp_ref, w_ref, h0_ref, c0_ref, y_ref, h_scr, c_scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    gates = xp_ref[0] + jnp.dot(
        h_scr[:], w_ref[:], preferred_element_type=jnp.float32
    )
    h_dim = h_scr.shape[-1]
    i = jax.nn.sigmoid(gates[:, :h_dim])
    f = jax.nn.sigmoid(gates[:, h_dim : 2 * h_dim])
    g = jnp.tanh(gates[:, 2 * h_dim : 3 * h_dim])
    o = jax.nn.sigmoid(gates[:, 3 * h_dim :])

    c = f * c_scr[:] + i * g
    h = o * jnp.tanh(c)
    c_scr[:] = c
    h_scr[:] = h
    y_ref[0] = h


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("interpret", "w_dtype"))
def lstm_layer_fused(x_proj: jax.Array, w_hh: jax.Array,
                     h0: jax.Array | None = None,
                     c0: jax.Array | None = None,
                     interpret: bool = False,
                     w_dtype: jnp.dtype = jnp.bfloat16) -> jax.Array:
    """Run one LSTM layer over precomputed input projections.

    x_proj: (B, T, 4H) = x @ W_ih + b; w_hh: (H, 4H), held in `w_dtype`
    inside the kernel (bf16 default: fp32 at H=1024 doesn't fit VMEM
    next to the stream buffers).
    Returns hidden states (B, T, H) float32.
    """
    b, t, h4 = x_proj.shape
    h = h4 // 4
    if h0 is None:
        h0 = jnp.zeros((b, h), dtype=jnp.float32)
    if c0 is None:
        c0 = jnp.zeros((b, h), dtype=jnp.float32)

    # pad batch to the f32 sublane tile (8)
    b_pad = _round_up(max(b, 8), 8)
    if b_pad != b:
        pad = [(0, b_pad - b), (0, 0)]
        x_proj = jnp.pad(x_proj, [(0, b_pad - b), (0, 0), (0, 0)])
        h0 = jnp.pad(h0, pad)
        c0 = jnp.pad(c0, pad)

    xp = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 4H): contiguous per-step blocks

    y = pl.pallas_call(
        _lstm_kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b_pad, h4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b_pad, h), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, b_pad, h), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((b_pad, h), jnp.float32),
            pltpu.VMEM((b_pad, h), jnp.float32),
        ],
        interpret=interpret,
    )(xp, w_hh.astype(w_dtype), h0, c0)

    y = jnp.swapaxes(y, 0, 1)
    return y[:b]
