"""Input-pipeline tests over the reference subset fixture."""

import os

import numpy as np
import pytest

from avvad_tpu.data import (
    AudioSequenceSource,
    AudioVisualSource,
    DataLoader,
    VideoSequenceSource,
    load_statistics,
    pad_batch,
    save_statistics,
    welford_merge,
)


@pytest.fixture(scope="module")
def root(ref_subset):
    return os.path.join(ref_subset, "processed/")


def test_audio_source(root):
    src = AudioSequenceSource(root, "train", "subset", "vad_labels", upsampled=False)
    assert len(src) == 3
    item = src[0]
    assert item["audio"].shape[1] == 513
    assert item["label"].shape[1] == 1
    assert item["audio"].shape[0] == item["label"].shape[0] == item["length"]
    assert item["noise_type"] == "Babble" and item["snr_db"] == "-5"


def test_av_source_alignment(root):
    src = AudioVisualSource(root, "train", "subset", "vad_labels", upsampled=False,
                            video_variant="upsampled")
    assert len(src) == 3
    item = src[0]
    t = item["length"]
    assert item["audio"].shape == (t, 513)
    assert item["video"].shape == (t, 67, 67)
    assert item["label"].shape == (t, 1)


def test_video_source(root):
    src = VideoSequenceSource(root, "validation", "vad_labels", upsampled=True)
    assert len(src) == 3
    item = src[0]
    assert item["video"].shape[1:] == (67, 67)
    assert item["video"].shape[0] == item["label"].shape[0]


def test_pad_batch_masking(root):
    src = AudioVisualSource(root, "train", "subset", "vad_labels", upsampled=False,
                            video_variant="upsampled")
    items = [src[i] for i in range(3)]
    batch = pad_batch(items, bucket=128)
    assert batch.audio.shape[0] == 3
    assert batch.audio.shape[1] % 128 == 0
    assert batch.mask.shape == batch.audio.shape[:2]
    # mask matches lengths; padded region is zero
    for i, it in enumerate(items):
        assert batch.mask[i].sum() == it["length"]
        assert (batch.audio[i, it["length"]:] == 0).all()
        assert (batch.video[i, it["length"]:] == 0).all()


def test_pad_batch_to_full(root):
    src = AudioSequenceSource(root, "train", "subset", "vad_labels", upsampled=False)
    batch = pad_batch([src[0]], bucket=64, pad_batch_to=4)
    assert batch.audio.shape[0] == 4
    assert batch.lengths[0] > 0 and (batch.lengths[1:] == 0).all()
    assert batch.mask[1:].sum() == 0


def test_dataloader_epoch(root):
    src = AudioVisualSource(root, "train", "subset", "vad_labels", upsampled=False,
                            video_variant="upsampled")
    dl = DataLoader(src, batch_size=2, shuffle=True, seed=3, bucket=64)
    batches = list(dl)
    assert len(batches) == 2
    assert sum(b.batch_size for b in batches) == 3
    # deterministic order per (seed, epoch)
    dl2 = DataLoader(src, batch_size=2, shuffle=True, seed=3, bucket=64)
    b2 = list(dl2)
    np.testing.assert_array_equal(batches[0].lengths, b2[0].lengths)


def test_statistics_roundtrip_and_format(tmp_path, root, ref_subset):
    # matches the reference statistics.h5 layout
    import h5py

    mean, std = welford_merge(
        [(10, np.full(513, 5.0), np.full(513, 30.0)),
         (5, np.full(513, 2.0), np.full(513, 10.0))]
    )
    p = str(tmp_path / "stats.h5")
    save_statistics(p, mean, std)
    m2, s2 = load_statistics(p)
    assert m2.shape == (513, 1) and s2.shape == (513, 1)
    np.testing.assert_allclose(m2[:, 0], mean, rtol=1e-6)

    ref_stats = os.path.join(
        root, "ntcd_timit/Noisy/ntcd_timit_power_spec_statistics.h5"
    )
    m_ref, s_ref = load_statistics(ref_stats)
    assert m_ref.shape == (513, 1) and s_ref.shape == (513, 1)


def test_prefetcher(root):
    import jax

    from avvad_tpu.data import Prefetcher

    src = AudioSequenceSource(root, "train", "subset", "vad_labels", upsampled=False)
    dl = DataLoader(src, batch_size=2, bucket=64)
    seen = 0
    for batch in Prefetcher(dl, depth=1):
        assert isinstance(batch.audio, jax.Array)
        seen += batch.batch_size
    assert seen == 3


def test_loader_propagates_worker_errors(root):
    """A failing item read must surface, not hang, through the threaded
    loader and the prefetcher."""
    src = AudioSequenceSource(root, "train", "subset", "vad_labels",
                              upsampled=False)
    src.pairs[1] = ("ntcd_timit/Noisy/Babble/-5/train/01M/missing.wav",
                    src.pairs[1][1])
    dl = DataLoader(src, batch_size=3, shuffle=False, bucket=64)
    with pytest.raises(Exception):
        list(dl)

    from avvad_tpu.data import Prefetcher

    dl2 = DataLoader(src, batch_size=3, shuffle=False, bucket=64)
    with pytest.raises(Exception):
        for _ in Prefetcher(dl2, depth=1):
            pass


def test_corrupt_h5_raises_cleanly(root, tmp_path):
    import h5py

    from avvad_tpu.data.records import load_label

    bad = tmp_path / "bad.h5"
    bad.write_bytes(b"this is not hdf5")
    with pytest.raises(OSError):
        load_label(str(bad))


def test_probe_length_close_to_true_length(root):
    # Audio: use the test split, whose fixture labels are frame-aligned
    # with the hop-0.25 audio (the probe is a packing heuristic, exact only
    # on consistently built trees).
    asrc = AudioSequenceSource(root, "test", "subset", "vad_labels",
                               upsampled=False)
    for i in range(len(asrc)):
        assert abs(asrc.probe_length(i) - asrc[i]["length"]) <= 2

    # Video: the probe reports the video h5's own frame count.
    import h5py

    from avvad_tpu.data import VideoSequenceSource

    vsrc = VideoSequenceSource(root, "validation", "vad_labels", upsampled=True)
    for i in range(len(vsrc)):
        with h5py.File(root + vsrc.video_paths[i]) as f:
            assert vsrc.probe_length(i) == f["X"].shape[-1]


def test_batch_indices_identify_rows(root):
    """Batch.indices must pair every row to its source item under shuffle,
    length-sorted pooling, and batch padding (the prediction writer relies
    on this instead of re-deriving the batch plan)."""
    src = AudioSequenceSource(root, "train", "subset", "vad_labels",
                              upsampled=False)
    loader = DataLoader(src, batch_size=2, shuffle=True, seed=7,
                        sort_pool_factor=2, pad_batch_to_full=True)
    seen = []
    for batch in loader:
        assert batch.indices is not None
        for row in range(batch.batch_size):
            idx = int(batch.indices[row])
            if idx < 0:
                assert int(batch.lengths[row]) == 0
                continue
            item = src[idx]
            L = int(batch.lengths[row])
            assert L == item["length"]
            np.testing.assert_array_equal(batch.audio[row, :L],
                                          np.asarray(item["audio"], np.float32))
            seen.append(idx)
    assert sorted(seen) == list(range(len(src)))


def test_bucket_ladder_values():
    """Geometric ladder: identity through 4x, then {2^k, 3*2^k} multiples."""
    from avvad_tpu.data.batching import bucket_length

    got = [bucket_length(m * 64 - 1, 64, ladder=True) // 64
           for m in (1, 2, 3, 4, 5, 7, 9, 13, 17, 25)]
    assert got == [1, 2, 3, 4, 6, 8, 12, 16, 24, 32]
    for t in (1, 100, 700, 3000, 8191):
        assert bucket_length(t, 64, ladder=True) >= t
    # falsy bucket stays identity regardless of ladder
    assert bucket_length(999, None, ladder=True) == 999
    # linear mode unchanged
    assert bucket_length(321, 64) == 384


def test_dataloader_bucket_ladder_bounds_shape_count():
    """A wide length spread compiles O(log T) shapes with the ladder on,
    O(T/bucket) off — the complete-corpus first-run compile fix."""

    class _Synth:
        lengths = list(range(70, 3600, 97))

        def __len__(self):
            return len(self.lengths)

        def __getitem__(self, i):
            n = self.lengths[i]
            return {"audio": np.zeros((n, 5), np.float32),
                    "label": np.zeros((n, 1), np.float32),
                    "length": n}

    def shapes(**kw):
        dl = DataLoader(_Synth(), batch_size=2, shuffle=False, bucket=64,
                        num_workers=2, **kw)
        return {b.max_frames for b in dl}

    linear, ladder = shapes(), shapes(bucket_ladder=True)
    assert len(ladder) <= 8 < len(linear)
    assert all(t % 64 == 0 for t in ladder)
