"""Unidirectional LSTM stacks as `lax.scan`, TPU-first.

Replaces the reference's packed-sequence torch LSTMs
(/root/reference/packages/models/Audio_Net.py:30-56, AV_Net.py:53-137).
Design notes:

- *No packing.* PyTorch packs sequences so cuDNN skips pad steps. On TPU,
  static shapes win: we scan the full padded length and rely on causality —
  outputs at frames < length are bit-independent of the padding, and
  losses/metrics mask the rest. `select_last` reproduces the
  "last-valid-step" gather used by packed sequences
  (models/utils.py:36-55 "method3").
- *Fused input projections.* The input-to-hidden matmul for ALL timesteps is
  hoisted out of the scan into one large (B*T, D) x (D, 4H) MXU contraction;
  the scan body only does the recurrent (B, H) x (H, 4H) matmul + gate math.
- *Gate layout.* Kernels are stored as single (D, 4H) / (H, 4H) blocks in
  torch's [i, f, g, o] gate order so reference checkpoints can be imported
  verbatim (`lstm_import_torch_weights`).
- *Init.* Matches torch's LSTM default U(-1/sqrt(H), 1/sqrt(H)).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _uniform_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


class LSTMCellFused(nn.Module):
    """One LSTM layer over a full (B, T, D) sequence.

    Two recurrence backends:
    - `use_pallas=True`: the weight-stationary Pallas kernel
      (ops.lstm_pallas) — W_hh stays resident in VMEM across all timesteps
      instead of being re-read from HBM each scan step. Differentiable
      (custom_vjp with a reverse-time weight-stationary backward kernel),
      so it serves both training and inference; the streaming/carry path
      still uses the scan.
    - default: lax.scan.
    """

    hidden_size: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    return_carry: bool = False
    # inference-only quantized recurrence state for the Pallas backend:
    # "none" | "bf16" | "int8" (see ops.lstm_pallas.lstm_layer_fused)
    state_quant: str = "none"

    @nn.compact
    def __call__(self, x: jax.Array, h0: Optional[tuple] = None):
        b, t, d = x.shape
        h = self.hidden_size
        scale = 1.0 / float(np.sqrt(h))
        w_ih = self.param("w_ih", _uniform_init(scale), (d, 4 * h))
        w_hh = self.param("w_hh", _uniform_init(scale), (h, 4 * h))
        bias = self.param("bias", _uniform_init(scale), (4 * h,))

        # Hoist the input projection out of the recurrence: one big matmul.
        x_proj = (x.astype(self.dtype) @ w_ih.astype(self.dtype) + bias.astype(self.dtype))

        if self.use_pallas and h0 is None and not self.return_carry:
            from ..ops.lstm_pallas import lstm_layer_fused

            interpret = jax.devices()[0].platform == "cpu"
            return lstm_layer_fused(x_proj.astype(jnp.float32),
                                    w_hh.astype(jnp.float32),
                                    interpret=interpret,
                                    state_quant=self.state_quant
                                    ).astype(self.dtype)

        if h0 is None:
            c0 = jnp.zeros((b, h), dtype=self.dtype)
            hh0 = jnp.zeros((b, h), dtype=self.dtype)
        else:
            hh0, c0 = h0

        w_hh_c = w_hh.astype(self.dtype)

        def step(carry, xp_t):
            h_prev, c_prev = carry
            gates = xp_t + h_prev @ w_hh_c
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c = f * c_prev + i * g
            hy = o * jnp.tanh(c)
            return (hy, c), hy

        carry, ys = jax.lax.scan(step, (hh0, c0), jnp.swapaxes(x_proj, 0, 1))
        out = jnp.swapaxes(ys, 0, 1)  # (B, T, H)
        if self.return_carry:
            return out, carry
        return out


class LSTMStack(nn.Module):
    """num_layers stacked LSTMs, input (B, T, D) -> (B, T, H)."""

    hidden_size: int = 1024
    num_layers: int = 2
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    state_quant: str = "none"  # Pallas backend only; see LSTMCellFused

    @nn.compact
    def __call__(self, x: jax.Array, carries: Optional[list] = None,
                 return_carries: bool = False):
        """carries: per-layer (h, c) from a previous chunk (streaming).

        With return_carries=True, returns (outputs, new_carries) so a
        caller can continue the recurrence across chunk boundaries."""
        new_carries = []
        for layer in range(self.num_layers):
            cell = LSTMCellFused(self.hidden_size, dtype=self.dtype,
                                 use_pallas=self.use_pallas,
                                 state_quant=self.state_quant,
                                 return_carry=return_carries,
                                 name=f"layer_{layer}")
            h0 = carries[layer] if carries is not None else None
            out = cell(x, h0=h0)
            if return_carries:
                x, carry = out
                new_carries.append(carry)
            else:
                x = out
        if return_carries:
            return x, new_carries
        return x


def select_last(outputs: jax.Array, lengths: jax.Array) -> jax.Array:
    """(B, T, H), (B,) -> (B, H): each sequence's last valid step.

    Packed-sequence "get last item" equivalent (models/utils.py:36-55)."""
    idx = jnp.clip(lengths.astype(jnp.int32) - 1, 0, outputs.shape[1] - 1)
    return jnp.take_along_axis(outputs, idx[:, None, None], axis=1)[:, 0]


def lstm_import_torch_weights(params: dict, torch_state: dict, prefix: str) -> dict:
    """Copy torch nn.LSTM weights into an LSTMStack params tree.

    torch stores weight_ih_l{k} (4H, D), weight_hh_l{k} (4H, H), and two
    bias vectors whose sum is the effective bias; gate order [i, f, g, o]
    matches our layout directly.
    """
    import numpy as np

    def key(name: str) -> str:
        return f"{prefix}.{name}" if prefix else name

    out = jax.tree_util.tree_map(lambda a: a, params)  # shallow copy
    layer = 0
    while key(f"weight_ih_l{layer}") in torch_state:
        w_ih = np.asarray(torch_state[key(f"weight_ih_l{layer}")])
        w_hh = np.asarray(torch_state[key(f"weight_hh_l{layer}")])
        b = np.asarray(torch_state[key(f"bias_ih_l{layer}")]) + np.asarray(
            torch_state[key(f"bias_hh_l{layer}")]
        )
        leaf = out[f"layer_{layer}"]
        leaf["w_ih"] = jnp.asarray(w_ih.T)
        leaf["w_hh"] = jnp.asarray(w_hh.T)
        leaf["bias"] = jnp.asarray(b)
        layer += 1
    return out
