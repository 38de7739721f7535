"""Weight quantization parameters shared by every int8 conv path.

One definition on purpose: the XLA int8 tower (models/resnet.py) and the
fused Pallas trunk (ops/conv_pallas.py) must produce bit-identical int8
weights from the same float checkpoint, or calibrated activation scales
stop matching the weights they were calibrated against and the two trunk
implementations silently diverge.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def weight_qparams(kernel: jax.Array):
    """Symmetric per-output-channel int8 weight quantization (output
    channel = last axis, HWIO / HWI layouts alike). Recomputed from the
    stored float param per call (the kernel is tiny next to the
    activations; checkpoints stay float and torch-importable)."""
    w_scale = jnp.maximum(
        jnp.max(jnp.abs(kernel), axis=tuple(range(kernel.ndim - 1))),
        1e-8) / 127.0
    w_q = jnp.round(kernel / w_scale).astype(jnp.int8)
    return w_q, w_scale
