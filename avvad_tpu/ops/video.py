"""On-device lip-video ops (JAX, jit-safe).

TPU twin of `avvad_tpu.processing.video`: the 67x67 type-2 IDCT decode is
two matrix products per frame — batched over (B*T) frames they run on the
MXU as (N, 67, 67) x (67, 67) contractions, replacing the reference's
per-frame scipy.fftpack.idct loop
(/root/reference/scripts/create_video_train_files_upsampled.py:140-150).
Temporal 30->62.5 fps resampling is a static gather (indices depend only on
frame count, resolved at trace time).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..processing.video import fps_resample_indices, make_idct_matrix


@functools.partial(jax.jit, static_argnames=("norm",))
def idct2_decode(dct_frames: jax.Array, norm: str = "frame") -> jax.Array:
    """(..., T, n*n) DCT coefficients -> (..., T, n, n) decoded frames.

    IDCT^2 -> min-max normalize to [0,255] -> rot90(·,3), matching
    processing.video.decode_dct_frames.
    """
    n = int(np.sqrt(dct_frames.shape[-1]))
    m = jnp.asarray(make_idct_matrix(n), dtype=jnp.float32)
    x = dct_frames.reshape(dct_frames.shape[:-1] + (n, n)).astype(jnp.float32)
    a = jnp.einsum("ij,...jk,lk->...il", m, x, m,
                   preferred_element_type=jnp.float32)
    if norm == "frame":
        lo = a.min(axis=(-2, -1), keepdims=True)
        hi = a.max(axis=(-2, -1), keepdims=True)
        out = (a - lo) / (hi - lo) * 255.0
    elif norm == "global":
        scale = jnp.max(a.max(axis=(-2, -1)) - a.min(axis=(-2, -1)))
        out = (a - a.min()) / scale * 255.0
    else:
        raise ValueError(f"unknown norm mode: {norm}")
    return jnp.rot90(out, 3, axes=(-2, -1))


def fps_resample(video: jax.Array, rate_in: float = 30.0, rate_out: float = 62.5) -> jax.Array:
    """Static-gather frame-duplication resample of (..., T, h, w) video."""
    t = video.shape[-3]
    idx = fps_resample_indices(t, rate_in, rate_out)  # numpy, static
    return jnp.take(video, jnp.asarray(idx), axis=-3)
