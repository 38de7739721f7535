"""Legacy fixed-window sources (packed h5 frame stores) and VideoClipSource."""

import os

import h5py
import numpy as np
import pytest

from avvad_tpu.data import (
    SpectrogramChunkSource,
    SpectrogramFrameSource,
    SpectrogramWindowSource,
    VideoClipSource,
)


@pytest.fixture(scope="module")
def frame_store(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("store") / "frames.h5")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(513, 100)).astype(np.float32)
    y = (rng.random((1, 100)) > 0.5).astype(np.float32)
    with h5py.File(path, "w") as f:
        f.create_dataset("X_train", data=x)
        f.create_dataset("Y_train", data=y)
    return path, x, y


def test_frame_source(frame_store):
    path, x, y = frame_store
    src = SpectrogramFrameSource(path, "train")
    assert len(src) == 100
    item = src[7]
    np.testing.assert_array_equal(item["audio"], x[:, 7])
    np.testing.assert_array_equal(item["label"], y[:, 7])
    src.close()


def test_window_source_short_and_full(frame_store):
    path, x, y = frame_store
    src = SpectrogramWindowSource(path, "train", seq_length=10)
    assert len(src) == 100
    # near the start: shorter trailing window
    item = src[3]
    assert item["audio"].shape == (4, 513)
    np.testing.assert_array_equal(item["audio"], x[:, :4].T)
    np.testing.assert_array_equal(item["label"], y[:, 3:4].T)
    # deep inside: full window ending at i
    item = src[50]
    assert item["audio"].shape == (10, 513)
    np.testing.assert_array_equal(item["audio"], x[:, 41:51].T)
    src.close()


def test_chunk_source(frame_store):
    path, x, y = frame_store
    src = SpectrogramChunkSource(path, "train", seq_length=32)
    assert len(src) == 4  # ceil(100/32)
    item = src[3]
    assert item["audio"].shape == (4, 513)  # final partial chunk
    np.testing.assert_array_equal(item["audio"], x[:, 96:].T)
    src.close()


@pytest.mark.slow
def test_video_clip_source(ref_subset, tmp_path):
    mat_dir = os.path.join(ref_subset, "raw/ntcd_timit/matlab_raw/train/01M")
    labels = np.random.default_rng(0).random(200).astype(np.float32)
    np.save(tmp_path / "sa1.npy", labels)

    src = VideoClipSource(mat_dir=mat_dir, items=["sa1"],
                          label_dir=str(tmp_path), seq_length=8, seed=1)
    item = src[0]
    assert item["video"].shape == (8, 67, 67)
    assert np.isscalar(item["label"]) or item["label"].shape == ()
    # deterministic under the seed
    src2 = VideoClipSource(mat_dir=mat_dir, items=["sa1"],
                           label_dir=str(tmp_path), seq_length=8, seed=1)
    np.testing.assert_array_equal(src2[0]["video"], item["video"])
