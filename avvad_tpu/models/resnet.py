"""ResNet-18 feature trunk (Flax, NHWC).

The reference's video tower is torchvision's resnet18 minus the final FC
(/root/reference/packages/models/Video_Net.py:18,35-37; AV_Net.py:25-30).
This is a from-scratch Flax implementation pinned to the same topology so
checkpoints are interchangeable: 7x7/2 stem + 3x3/2 maxpool, four stages of
two BasicBlocks with channel widths (64, 128, 256, 512) and strides
(1, 2, 2, 2), 1x1-conv downsample shortcuts, global average pool -> 512.

TPU notes: NHWC layout (channels on the lane dimension), BatchNorm with
running statistics in the `batch_stats` collection, optional bfloat16
compute with float32 params/stats.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    norm_eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9,
                       epsilon=self.norm_eps, dtype=jnp.float32)

        residual = x
        y = conv(self.features, (3, 3), strides=(self.stride, self.stride),
                 padding=[(1, 1), (1, 1)], name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.features, (3, 3), padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = norm(name="bn2")(y)

        if residual.shape != y.shape:
            residual = conv(self.features, (1, 1),
                            strides=(self.stride, self.stride),
                            name="downsample_conv")(residual)
            residual = norm(name="downsample_bn")(residual)

        return nn.relu(y + residual)


class ResNet18(nn.Module):
    """Input (N, H, W, 3) -> (N, 512) pooled features."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    widths: Sequence[int] = (64, 128, 256, 512)
    dtype: jnp.dtype = jnp.float32
    norm_eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=self.norm_eps, dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        for stage, (n_blocks, width) in enumerate(zip(self.stage_sizes, self.widths)):
            for block in range(n_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = BasicBlock(width, stride=stride, dtype=self.dtype,
                               norm_eps=self.norm_eps,
                               name=f"layer{stage + 1}_{block}")(x, train=train)

        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return x.astype(jnp.float32)
