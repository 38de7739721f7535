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

Differentiable (custom_vjp): training gets the same weight-stationary
recurrence in both directions. The forward-for-grad kernel additionally
streams cell states and post-activation gates to HBM as residuals; the
backward kernel runs the gradient recurrence in reverse time with W_hh^T
resident in VMEM and emits the pre-activation gate gradients d_gates.
The two weight-sized contractions that would need an (H, 4H) fp32 VMEM
accumulator — dW_hh = h_prev^T @ d_gates and the x_proj cotangent — are
done OUTSIDE the kernel as single large MXU matmuls by XLA.

Gate layout matches models.lstm.LSTMCellFused / torch: [i, f, g, o].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gate_math(gates, c_prev):
    h_dim = c_prev.shape[-1]
    i = jax.nn.sigmoid(gates[:, :h_dim])
    f = jax.nn.sigmoid(gates[:, h_dim : 2 * h_dim])
    g = jnp.tanh(gates[:, 2 * h_dim : 3 * h_dim])
    o = jax.nn.sigmoid(gates[:, 3 * h_dim :])
    c = f * c_prev + i * g
    h = o * jnp.tanh(c)
    return i, f, g, o, c, h


def _lstm_kernel(xp_ref, w_ref, h0_ref, c0_ref, y_ref, h_scr, c_scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    gates = xp_ref[0] + jnp.dot(
        h_scr[:], w_ref[:], preferred_element_type=jnp.float32
    )
    _, _, _, _, c, h = _gate_math(gates, c_scr[:])
    c_scr[:] = c
    h_scr[:] = h
    y_ref[0] = h


def _lstm_kernel_hbf16(xp_ref, w_ref, h0_ref, c0_ref, y_ref, h_scr, c_scr):
    """Inference variant: the hidden state enters the recurrent matmul as
    bfloat16 (both MXU operands bf16; the gate epilogue and the cell state
    stay fp32). h in (-1, 1) makes the bf16 relative error ~0.4%."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    gates = xp_ref[0] + jnp.dot(
        h_scr[:].astype(jnp.bfloat16), w_ref[:],
        preferred_element_type=jnp.float32,
    )
    _, _, _, _, c, h = _gate_math(gates, c_scr[:])
    c_scr[:] = c
    h_scr[:] = h
    y_ref[0] = h


def _lstm_kernel_int8(xp_ref, wq_ref, ws_ref, h0_ref, c0_ref, y_ref,
                      h_scr, c_scr):
    """W8A8 recurrence: h = o*tanh(c) is bounded to (-1, 1) by
    construction, so the hidden state quantizes with the FIXED scale 127
    (no calibration needed); W_hh is symmetric per-output-column int8.
    The int8 x int8 -> int32 matmul runs at 2x the bf16 MXU rate; gate
    math and the cell state stay fp32. ws = w_scale / 127 folds both
    dequants into one epilogue multiply."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    qh = jnp.round(h_scr[:] * 127.0).astype(jnp.int8)
    acc = jnp.dot(qh, wq_ref[:], preferred_element_type=jnp.int32)
    gates = xp_ref[0] + acc.astype(jnp.float32) * ws_ref[:]
    _, _, _, _, c, h = _gate_math(gates, c_scr[:])
    c_scr[:] = c
    h_scr[:] = h
    y_ref[0] = h


def _lstm_fwd_train_kernel(xp_ref, w_ref, h0_ref, c0_ref,
                           y_ref, c_ref, g_ref, h_scr, c_scr):
    """Forward that also streams residuals: cell states and the
    post-activation gates [i, f, g, o] per step."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    gates = xp_ref[0] + jnp.dot(
        h_scr[:], w_ref[:], preferred_element_type=jnp.float32
    )
    i, f, g, o, c, h = _gate_math(gates, c_scr[:])
    g_ref[0] = jnp.concatenate([i, f, g, o], axis=-1)
    c_ref[0] = c
    c_scr[:] = c
    h_scr[:] = h
    y_ref[0] = h


def _lstm_bwd_kernel(dy_ref, g_ref, c_ref, cprev_ref, wT_ref,
                     dg_ref, dh0_ref, dc0_ref, dh_scr, dc_scr):
    """Reverse-time gradient recurrence (grid step i is time T-1-i; the
    index maps do the reversal). Emits pre-activation gate grads d_gates;
    dW_hh and dx_proj are computed outside as large matmuls."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    h_dim = dh_scr.shape[-1]
    gates = g_ref[0]
    i = gates[:, :h_dim]
    f = gates[:, h_dim : 2 * h_dim]
    g = gates[:, 2 * h_dim : 3 * h_dim]
    o = gates[:, 3 * h_dim :]
    c = c_ref[0]
    c_prev = cprev_ref[0]

    tanh_c = jnp.tanh(c)
    dh = dy_ref[0] + dh_scr[:]
    do = dh * tanh_c
    dc = dh * o * (1.0 - tanh_c * tanh_c) + dc_scr[:]
    di = dc * g
    df = dc * c_prev
    dg = dc * i
    d_pre = jnp.concatenate(
        [di * i * (1.0 - i), df * f * (1.0 - f),
         dg * (1.0 - g * g), do * o * (1.0 - o)], axis=-1
    )
    dg_ref[0] = d_pre

    dh_next = jnp.dot(d_pre, wT_ref[:], preferred_element_type=jnp.float32)
    dc_next = dc * f
    dh_scr[:] = dh_next
    dc_scr[:] = dc_next
    # final grid step (time 0) leaves the initial-state cotangents here
    dh0_ref[:] = dh_next
    dc0_ref[:] = dc_next


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fwd_infer_call(xp, w_hh, h0, c0, interpret, w_dtype):
    """xp: (T, B, 4H) time-major -> y (T, B, H)."""
    t, b, h4 = xp.shape
    h = h4 // 4
    return pl.pallas_call(
        _lstm_kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, h4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b, h), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, b, h), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
        ],
        interpret=interpret,
    )(xp, w_hh.astype(w_dtype), h0, c0)


@functools.lru_cache(maxsize=8)
def _make_quant_infer(interpret: bool, state_quant: str):
    """Wrap the quantized-state recurrence so differentiation fails with
    a CLEAR message instead of an opaque Pallas autodiff error (the
    custom_vjp's fwd rule only runs under differentiation)."""

    @jax.custom_vjp
    def f(xp, w_hh, h0, c0):
        return _fwd_quant_call(xp, w_hh, h0, c0, interpret, state_quant)

    def fwd(xp, w_hh, h0, c0):
        raise NotImplementedError(
            f"lstm state_quant={state_quant!r} is inference-only; unset "
            "state_quant (or use the default Pallas kernel) for training")

    def bwd(res, dy):  # pragma: no cover - fwd always raises first
        raise NotImplementedError

    f.defvjp(fwd, bwd)
    return f


def _fwd_quant_call(xp, w_hh, h0, c0, interpret, state_quant):
    """Inference-only quantized-state recurrence (no backward kernel):
    state 'bf16' casts h for the dot; 'int8' runs W8A8 with fixed h
    scale. Reach it through _make_quant_infer for a clear
    inference-only error under differentiation."""
    t, b, h4 = xp.shape
    h = h4 // 4
    vm = pltpu.VMEM
    if state_quant == "int8":
        from .qparams import weight_qparams

        wq, w_scale = weight_qparams(w_hh)  # (H, 4H) int8, (4H,) fp32
        ws = (w_scale / 127.0).reshape(1, h4).astype(jnp.float32)
        return pl.pallas_call(
            _lstm_kernel_int8,
            grid=(t,),
            in_specs=[
                pl.BlockSpec((1, b, h4), lambda i: (i, 0, 0),
                             memory_space=vm),
                pl.BlockSpec((h, h4), lambda i: (0, 0), memory_space=vm),
                pl.BlockSpec((1, h4), lambda i: (0, 0), memory_space=vm),
                pl.BlockSpec((b, h), lambda i: (0, 0), memory_space=vm),
                pl.BlockSpec((b, h), lambda i: (0, 0), memory_space=vm),
            ],
            out_specs=pl.BlockSpec((1, b, h), lambda i: (i, 0, 0),
                                   memory_space=vm),
            out_shape=jax.ShapeDtypeStruct((t, b, h), jnp.float32),
            scratch_shapes=[vm((b, h), jnp.float32), vm((b, h), jnp.float32)],
            interpret=interpret,
        )(xp, wq, ws, h0, c0)
    return pl.pallas_call(
        _lstm_kernel_hbf16,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, h4), lambda i: (i, 0, 0), memory_space=vm),
            pl.BlockSpec((h, h4), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((b, h), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((b, h), lambda i: (0, 0), memory_space=vm),
        ],
        out_specs=pl.BlockSpec((1, b, h), lambda i: (i, 0, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((t, b, h), jnp.float32),
        scratch_shapes=[vm((b, h), jnp.float32), vm((b, h), jnp.float32)],
        interpret=interpret,
    )(xp, w_hh.astype(jnp.bfloat16), h0, c0)


def _fwd_train_call(xp, w_hh, h0, c0, interpret, w_dtype):
    """-> (y, c_seq, gates) all time-major."""
    t, b, h4 = xp.shape
    h = h4 // 4
    return pl.pallas_call(
        _lstm_fwd_train_kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, h4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, b, h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, h4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, h), jnp.float32),
            jax.ShapeDtypeStruct((t, b, h), jnp.float32),
            jax.ShapeDtypeStruct((t, b, h4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
        ],
        interpret=interpret,
    )(xp, w_hh.astype(w_dtype), h0, c0)


def _bwd_call(dy, gates, c_seq, c_prev, w_hh, interpret, w_dtype):
    """-> (d_gates (T,B,4H), dh0 (B,H), dc0 (B,H)), inputs time-major."""
    t, b, h4 = gates.shape
    h = h4 // 4
    rev_h = pl.BlockSpec((1, b, h), lambda i: (t - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM)
    rev_g = pl.BlockSpec((1, b, h4), lambda i: (t - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _lstm_bwd_kernel,
        grid=(t,),
        in_specs=[
            rev_h,  # dy
            rev_g,  # gates
            rev_h,  # c
            rev_h,  # c_prev
            pl.BlockSpec((h4, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            rev_g,  # d_gates
            pl.BlockSpec((b, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, h4), jnp.float32),
            jax.ShapeDtypeStruct((b, h), jnp.float32),
            jax.ShapeDtypeStruct((b, h), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((b, h), jnp.float32),
        ],
        interpret=interpret,
    )(dy, gates, c_seq, c_prev, jnp.transpose(w_hh).astype(w_dtype))


@functools.lru_cache(maxsize=8)
def _make_lstm_vjp(interpret: bool, w_dtype_name: str):
    """custom_vjp over (xp, w_hh, h0, c0) with time-major xp (T, B, 4H).

    The primal runs the residual-free inference kernel; differentiation
    switches to the residual-producing forward + the reverse-time backward
    kernel. dW_hh / dx_proj are single large XLA matmuls outside."""
    w_dtype = jnp.dtype(w_dtype_name)

    @jax.custom_vjp
    def f(xp, w_hh, h0, c0):
        return _fwd_infer_call(xp, w_hh, h0, c0, interpret, w_dtype)

    def fwd(xp, w_hh, h0, c0):
        y, c_seq, gates = _fwd_train_call(xp, w_hh, h0, c0, interpret,
                                          w_dtype)
        return y, (w_hh, h0, c0, y, c_seq, gates)

    def bwd(res, dy):
        w_hh, h0, c0, y, c_seq, gates = res
        c_prev = jnp.concatenate([c0[None], c_seq[:-1]], axis=0)
        d_gates, dh0, dc0 = _bwd_call(dy, gates, c_seq, c_prev, w_hh,
                                      interpret, w_dtype)
        h_prev = jnp.concatenate([h0[None], y[:-1]], axis=0)
        dw_hh = jnp.einsum(
            "tbh,tbg->hg", h_prev, d_gates,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(w_hh.dtype)
        return d_gates, dw_hh, dh0, dc0

    f.defvjp(fwd, bwd)
    return f


@functools.partial(jax.jit, static_argnames=("interpret", "w_dtype",
                                              "state_quant"))
def lstm_layer_fused(x_proj: jax.Array, w_hh: jax.Array,
                     h0: jax.Array | None = None,
                     c0: jax.Array | None = None,
                     interpret: bool = False,
                     w_dtype: jnp.dtype = jnp.bfloat16,
                     state_quant: str = "none") -> jax.Array:
    """Run one LSTM layer over precomputed input projections.

    x_proj: (B, T, 4H) = x @ W_ih + b; w_hh: (H, 4H), held in `w_dtype`
    inside the kernel (bf16 default: fp32 at H=1024 doesn't fit VMEM
    next to the stream buffers).
    Returns hidden states (B, T, H) float32. Differentiable wrt x_proj,
    w_hh, h0, c0 (custom_vjp; backward is also weight-stationary).

    state_quant (inference-only, NOT differentiable):
    - "bf16": the hidden state enters the recurrent dot as bfloat16;
    - "int8": W8A8 recurrence — h is (-1, 1)-bounded so it quantizes
      with the fixed scale 127, W_hh per-output-column int8; the matmul
      runs at 2x the bf16 MXU rate (checkpoint stays float).
    """
    if state_quant not in ("none", "bf16", "int8"):
        raise ValueError(f"state_quant {state_quant!r}")
    b, t, h4 = x_proj.shape
    h = h4 // 4
    if h0 is None:
        h0 = jnp.zeros((b, h), dtype=jnp.float32)
    if c0 is None:
        c0 = jnp.zeros((b, h), dtype=jnp.float32)

    # pad batch to the sublane tile (8 for f32 operands; the int8 dot
    # operand wants 32)
    b_pad = _round_up(max(b, 8), 32 if state_quant == "int8" else 8)
    if b_pad != b:
        pad = [(0, b_pad - b), (0, 0)]
        x_proj = jnp.pad(x_proj, [(0, b_pad - b), (0, 0), (0, 0)])
        h0 = jnp.pad(h0, pad)
        c0 = jnp.pad(c0, pad)

    xp = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 4H): contiguous per-step blocks
    if state_quant != "none":
        y = _make_quant_infer(bool(interpret), state_quant)(xp, w_hh, h0, c0)
    else:
        fn = _make_lstm_vjp(bool(interpret), jnp.dtype(w_dtype).name)
        y = fn(xp, w_hh, h0, c0)
    y = jnp.swapaxes(y, 0, 1)
    return y[:b]
