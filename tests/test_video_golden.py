"""Golden parity tests: video decode + upsample vs the reference's committed
`*_upsampled.h5` / raw-rate `.h5` fixtures.

The fixtures went through the reference's ffmpeg x264(crf=0) round trip,
which converts RGB<->YUV and quantizes to uint8; our codec-free float path
must match within that conversion noise (empirically < ±3/255) and with the
exact ffmpeg `fps`-filter frame-duplication schedule (bit-exact frame
alignment was verified by recovering the schedule from the fixtures).
"""

import glob
import os

import h5py
import numpy as np
import pytest

from avvad_tpu.processing.video import (
    decode_dct_frames,
    fps_resample_indices,
    read_mat_dct,
    upsample_video,
)


def _mat_files(ref_subset):
    return sorted(
        glob.glob(os.path.join(ref_subset, "raw/ntcd_timit/matlab_raw/**/*.mat"),
                  recursive=True)
    )


def _proc_video(ref_subset, mat_path, suffix=""):
    rel = os.path.relpath(mat_path, os.path.join(ref_subset, "raw"))
    h5_path = os.path.join(ref_subset, "processed", os.path.splitext(rel)[0] + suffix + ".h5")
    if not os.path.exists(h5_path):
        return None
    with h5py.File(h5_path, "r") as f:
        return f["X"][:]


@pytest.mark.slow
def test_decode_matches_raw_rate_fixture(ref_subset):
    checked = 0
    for mat_path in _mat_files(ref_subset):
        x_ref = _proc_video(ref_subset, mat_path)  # (67, 67, T), 30 fps
        if x_ref is None:
            continue
        dec = decode_dct_frames(read_mat_dct(mat_path))  # (T, 67, 67)
        assert dec.shape[0] == x_ref.shape[-1], mat_path
        err = np.abs(np.moveaxis(dec, 0, -1) - x_ref)
        assert err.max() < 3.0, f"{mat_path}: max err {err.max()}"
        assert err.mean() < 0.6, f"{mat_path}: mean err {err.mean()}"
        checked += 1
    assert checked >= 6


@pytest.mark.slow
def test_upsample_matches_fixture(ref_subset):
    checked = 0
    for mat_path in _mat_files(ref_subset):
        x_up = _proc_video(ref_subset, mat_path, "_upsampled")
        if x_up is None:
            continue
        dec = decode_dct_frames(read_mat_dct(mat_path))
        up = upsample_video(dec)  # (T_out, 67, 67)
        # Fixture may be truncated to the (shorter) label length by the builder.
        assert 0 <= up.shape[0] - x_up.shape[-1] <= 2, mat_path
        n = x_up.shape[-1]
        err = np.abs(np.moveaxis(up[:n], 0, -1) - x_up)
        assert err.max() < 3.0, f"{mat_path}: max err {err.max()}"
        checked += 1
    assert checked >= 6


def test_fps_indices_monotone_and_complete():
    idx = fps_resample_indices(169, 30, 62.5)
    assert len(idx) == 352
    assert idx[0] == 0 and idx[-1] == 168
    assert (np.diff(idx) >= 0).all()
    assert set(idx) == set(range(169))  # no input frame dropped on upsample


def test_jax_ops_match_numpy(ref_subset):
    import jax.numpy as jnp

    from avvad_tpu.ops.video import fps_resample, idct2_decode

    mat_path = _mat_files(ref_subset)[0]
    coeffs = read_mat_dct(mat_path)[:16]
    dec_np = decode_dct_frames(coeffs)
    dec_jax = np.asarray(idct2_decode(jnp.asarray(coeffs, dtype=jnp.float32)))
    np.testing.assert_allclose(dec_jax, dec_np, atol=2e-2)

    up_np = upsample_video(dec_np)
    up_jax = np.asarray(fps_resample(jnp.asarray(dec_np)))
    np.testing.assert_array_equal(up_jax, up_np)
