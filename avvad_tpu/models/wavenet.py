"""WaveNet-style dilated causal convolution encoder (Flax).

Capability twin of the reference's standalone wavenet_autoencoder
(/root/reference/packages/models/wavenet_autoencoder.py:7-108): a causal
entry conv, a stack of [ReLU -> dilated conv -> ReLU -> 1x1 dense] blocks
with residual adds over the time-aligned tail slice, a 1x1 bottleneck +
ReLU, and an adaptive average pool to a fixed output length. Like the
reference (which never constructs it in the live pipelines), it ships as a
library module: the raw-waveform frontend of the paper's audio branch.

TPU design: convolutions are `lax.conv_general_dilated` in NWC layout with
VALID padding (dilated convs map directly onto XLA's rhs_dilation — no
manual causal shifting needed since the reference also uses valid padding
and aligns residuals by slicing the tail).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def adaptive_avg_pool1d(x: jax.Array, output_size: int) -> jax.Array:
    """torch.nn.AdaptiveAvgPool1d semantics on (..., T, C): output bin k
    averages input[floor(k*T/out) : ceil((k+1)*T/out)]."""
    t = x.shape[-2]
    starts = [(k * t) // output_size for k in range(output_size)]
    ends = [-(-((k + 1) * t) // output_size) for k in range(output_size)]
    pieces = [jnp.mean(x[..., s:e, :], axis=-2) for s, e in zip(starts, ends)]
    return jnp.stack(pieces, axis=-2)


class WaveNetEncoder(nn.Module):
    """(B, T, quantization_channels) -> (B, pool_kernel_size, bottleneck)."""

    filter_width: int = 3
    quantization_channels: int = 256
    dilations: Sequence[int] = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512)
    residual_channels: int = 32
    dilation_channels: int = 32
    bottleneck_width: int = 16
    pool_kernel_size: int = 100
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def receptive_field(self) -> int:
        return (self.filter_width - 1) * (sum(self.dilations) + 1) + 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        conv = lambda feat, width, dil, name: nn.Conv(  # noqa: E731
            feat, (width,), kernel_dilation=(dil,), padding="VALID",
            use_bias=self.use_bias, dtype=self.dtype, name=name,
        )

        x = conv(self.residual_channels, self.filter_width, 1, "causal_entry")(x)

        for i, dilation in enumerate(self.dilations):
            residual = x
            y = nn.relu(x)
            y = conv(self.dilation_channels, self.filter_width, dilation,
                     f"dilated_{i}")(y)
            y = nn.relu(y)
            y = conv(self.residual_channels, 1, 1, f"dense_{i}")(y)
            # align the residual to the (shorter) conv output: keep the tail
            x = y + residual[..., residual.shape[-2] - y.shape[-2]:, :]

        x = conv(self.bottleneck_width, 1, 1, "bottleneck")(x)
        x = nn.relu(x)
        return adaptive_avg_pool1d(x, self.pool_kernel_size)
