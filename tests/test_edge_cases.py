"""Edge-case robustness across the DSP and batching layers."""

import jax.numpy as jnp
import numpy as np
import pytest

from avvad_tpu.data.batching import Batch, bucket_length, pad_batch
from avvad_tpu.ops.stft import frame_signal, log_power_frontend, stft_frames
from avvad_tpu.processing import stft
from avvad_tpu.processing.stft import n_stft_frames


def test_frame_signal_reshape_equals_gather():
    """The hop|nfft reshape decomposition == the gather fallback."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=5000).astype(np.float32))
    a = np.asarray(frame_signal(x, 1024, 256))
    # force the gather path via a non-dividing hop, then compare on a
    # dividing hop against a numpy stride oracle
    starts = np.arange(1 + (5000 - 1024) // 256) * 256
    oracle = np.stack([np.asarray(x)[s : s + 1024] for s in starts])
    np.testing.assert_array_equal(a, oracle)

    b = np.asarray(frame_signal(x, 1024, 533))  # gather path
    starts = np.arange(1 + (5000 - 1024) // 533) * 533
    oracle = np.stack([np.asarray(x)[s : s + 1024] for s in starts])
    np.testing.assert_array_equal(b, oracle)


def test_stft_exact_multiple_no_end_pad():
    """A signal whose length is an exact hop multiple gets no end pad."""
    fs = 16000
    n = 1024 * 4  # utt_len/wlen/hop = 16.0 exactly
    x = np.random.default_rng(0).normal(size=n).astype(np.float32)
    assert n_stft_frames(n, fs=fs) == 1 + (n - 1024) // 256
    sxx = stft(x, fs=fs)
    assert sxx.shape[-1] == 1 + (n - 1024) // 256


def test_minimum_length_signal():
    fs = 16000
    x = np.random.default_rng(0).normal(size=1024).astype(np.float32)
    sxx = stft(x, fs=fs)  # exactly one window (end-pad adds a second frame)
    assert sxx.shape[0] == 513 and sxx.shape[-1] >= 1
    re, im = stft_frames(jnp.asarray(x), fs=fs)
    assert re.shape[-1] == 513


def test_batched_frontend_leading_dims():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 8192))
                    .astype(np.float32))
    out = log_power_frontend(x, fs=16000)
    assert out.shape[:2] == (2, 3) and out.shape[-1] == 513


def test_bucket_length_edges():
    assert bucket_length(1, 64) == 64
    assert bucket_length(64, 64) == 64
    assert bucket_length(65, 64) == 128
    assert bucket_length(100, None) == 100
    assert bucket_length(100, 0) == 100


def test_pad_batch_single_item_no_bucket():
    item = {"audio": np.ones((10, 513), np.float32),
            "label": np.ones((10, 1), np.float32), "length": 10}
    b = pad_batch([item])
    assert b.audio.shape == (1, 10, 513)
    assert b.mask.sum() == 10


def test_masked_bce_all_padded_rows():
    """Zero-length (padded) sequences contribute nothing to the loss."""
    from avvad_tpu.models import masked_sequence_bce

    logits = jnp.ones((2, 4, 1))
    targets = jnp.ones((2, 4, 1))
    mask = jnp.asarray([[1, 1, 0, 0], [0, 0, 0, 0]], dtype=jnp.float32)
    loss = masked_sequence_bce(logits, targets, mask)
    solo = masked_sequence_bce(logits[:1], targets[:1], mask[:1])
    np.testing.assert_allclose(float(loss), float(solo), rtol=1e-6)
