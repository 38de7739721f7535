"""Builder integration: raw fixture -> processed tree -> AV training batch.

This is the full offline pipeline the reference runs once per corpus
(create_video_train_files_upsampled.py + create_audio_train_files.py),
driven end-to-end on the in-repo raw subset and consumed by the live AV
source — proving the framework can bootstrap its own consistent processed
dataset (the reference's committed fixture mixes label vintages).
"""

import os

import h5py
import numpy as np
import pytest

from avvad_tpu.builders import BuildConfig, build_audio_split, build_video_split
from avvad_tpu.data import AudioVisualSource, DataLoader


@pytest.fixture(scope="module")
def built(ref_subset, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("processed")) + os.sep
    cfg = BuildConfig(
        raw_dir=os.path.join(ref_subset, "raw/"),
        processed_dir=out,
        dataset_size="subset",
        upsampled_suffix=True,
        max_workers=0,
    )
    for split in ["train", "validation", "test"]:
        n_v = build_video_split(cfg, split)
        n_a = build_audio_split(cfg, split)
        assert n_v == 3 and n_a >= 6
    return out


@pytest.mark.slow
def test_artifact_formats(built, ref_subset):
    # video h5 matches the reference's artifact (same file exists in the
    # committed fixture; ours is codec-free so compare within x264 noise)
    ours = os.path.join(built, "ntcd_timit/matlab_raw/train/01M/sa1_upsampled.h5")
    ref = os.path.join(ref_subset,
                       "processed/ntcd_timit/matlab_raw/train/01M/sa1_upsampled.h5")
    with h5py.File(ours) as f:
        x_ours = f["X"][:]
    with h5py.File(ref) as f:
        x_ref = f["X"][:]
    t = min(x_ours.shape[-1], x_ref.shape[-1])
    assert abs(x_ours.shape[-1] - x_ref.shape[-1]) <= 2
    assert np.abs(x_ours[..., :t] - x_ref[..., :t]).max() < 3.0

    # label format (y_dim, T) float32 with the upsampled suffix
    lab = os.path.join(built, "ntcd_timit/Clean/train/01M/sa1_vad_labels_upsampled.h5")
    with h5py.File(lab) as f:
        y = f["Y"][:]
    assert y.shape[0] == 1 and y.dtype == np.float32
    assert y.shape[1] == x_ours.shape[-1]  # aligned to the video frames

    # statistics files in the reference layout
    for stats_rel in [
        "ntcd_timit/matlab_raw/ntcd_timit_upsampled_statistics.h5",
        "ntcd_timit/Noisy/ntcd_timit_log_power_spec_upsampled_statistics.h5",
    ]:
        with h5py.File(os.path.join(built, stats_rel)) as f:
            assert "X_train_mean" in f and "X_train_std" in f


@pytest.mark.slow
def test_frame_store_builder(built, tmp_path):
    """Packed frame store feeds the legacy windowed sources."""
    from avvad_tpu.builders import BuildConfig, build_frame_store
    from avvad_tpu.data import SpectrogramChunkSource, SpectrogramFrameSource

    cfg = BuildConfig(raw_dir="unused/", processed_dir=built,
                      dataset_size="subset", upsampled_suffix=True,
                      max_workers=0)
    out = str(tmp_path / "frames.h5")
    n = build_frame_store(cfg, "train", out)
    assert n > 300  # 3 utterances x ~150+ frames

    src = SpectrogramFrameSource(out, "train")
    assert len(src) == n
    item = src[0]
    assert item["audio"].shape == (513,)
    src.close()

    chunks = SpectrogramChunkSource(out, "train", seq_length=64)
    assert len(chunks) == -(-n // 64)
    assert chunks[0]["audio"].shape == (64, 513)
    chunks.close()


@pytest.mark.slow
def test_built_tree_feeds_av_training(built):
    """The self-built tree must load through the live AV source with the
    reference's canonical config (upsampled=True)."""
    src = AudioVisualSource(built, "train", "subset", "vad_labels",
                            upsampled=True)
    assert len(src) == 3
    batch = next(iter(DataLoader(src, batch_size=3, shuffle=False, bucket=64)))
    assert batch.audio.shape[-1] == 513
    assert batch.video.shape[2:] == (67, 67)
    # audio/video/label frame-aligned per utterance
    for i in range(3):
        item = src[i]
        assert item["audio"].shape[0] == item["video"].shape[0] == item["label"].shape[0]
