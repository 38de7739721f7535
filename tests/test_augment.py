"""Noise-grid augmentation: synthesis, SNR math, and source semantics."""

import numpy as np
import os

from avvad_tpu.data import AugmentingSource, feature_stats
from avvad_tpu.data.augment import (
    NOISE_KINDS,
    SNRS_DB,
    clean_rel_from_noisy,
    mix_at_snr,
    synth_noise,
)


def test_noise_families_unit_variance():
    rng = np.random.default_rng(0)
    pool = [rng.normal(size=8000).astype(np.float32) for _ in range(3)]
    for kind in NOISE_KINDS:
        n = synth_noise(kind, 16000, np.random.default_rng(1), pool)
        assert n.shape == (16000,) and n.dtype == np.float32
        assert abs(float(np.std(n)) - 1.0) < 0.05, kind


def test_mix_at_snr_hits_target():
    rng = np.random.default_rng(2)
    clean = rng.normal(size=32000).astype(np.float32)
    noise = rng.normal(size=32000).astype(np.float32)
    for snr in SNRS_DB:
        mixed = mix_at_snr(clean, noise, snr)
        resid = mixed - clean
        got = 10 * np.log10(np.mean(clean ** 2) / np.mean(resid ** 2))
        assert abs(got - snr) < 0.1, (snr, got)


def test_clean_rel_mapping():
    noisy = "ntcd_timit/Noisy/Babble/-5/train/01M/sa1.wav"
    assert clean_rel_from_noisy(noisy) == "ntcd_timit/Clean/train/01M/sa1.wav"


def test_augmenting_source_grid(ref_subset):
    from avvad_tpu.data import AudioSequenceSource

    root = os.path.join(ref_subset, "processed/")
    inner = AudioSequenceSource(root, "train", "subset", "vad_labels",
                                upsampled=False)
    src = AugmentingSource(inner, seed=0)
    assert len(src) == len(inner) * 18

    # condition grid covers all (kind, snr) combos per utterance
    conds = {src._split(i)[1:] for i in range(18)}
    assert len(conds) == 18

    item = src[0]
    assert item["audio"].shape[1] == 513
    assert item["label"].shape[0] == item["audio"].shape[0]
    assert item["noise_type"] == NOISE_KINDS[0]
    assert item["snr_db"] == "-5"

    # same item, same epoch -> deterministic; different epoch -> new noise
    a0 = src[0]["audio"]
    np.testing.assert_array_equal(a0, src[0]["audio"])
    src.set_epoch(1)
    a1 = src[0]["audio"]
    assert np.abs(a0 - a1).max() > 1e-3
    # labels are untouched by augmentation (same utterance, next condition)
    src.set_epoch(0)
    np.testing.assert_array_equal(src[0]["label"], src[1]["label"])

    # probe_length delegates to the utterance (clean/noisy same duration)
    assert src.probe_length(0) == inner.probe_length(0)


def test_feature_stats(ref_subset):
    from avvad_tpu.data import AudioSequenceSource

    root = os.path.join(ref_subset, "processed/")
    inner = AudioSequenceSource(root, "train", "subset", "vad_labels",
                                upsampled=False)
    src = AugmentingSource(inner, seed=0)
    m, s = feature_stats(src, max_items=6)
    assert m.shape == (513,) and s.shape == (513,)
    assert np.isfinite(m).all() and (s > 0).all()


def test_augmenting_av_source(ref_subset):
    from avvad_tpu.data import AudioVisualSource

    root = os.path.join(ref_subset, "processed/")
    inner = AudioVisualSource(root, "train", "subset", "vad_labels",
                              upsampled=False, video_variant="plain")
    src = AugmentingSource(inner, seed=0)
    item = src[3]
    assert item["video"].shape[1:] == (67, 67)
    assert item["video"].shape[0] == item["audio"].shape[0] \
        == item["label"].shape[0]


def test_concurrent_pool_first_touch_is_deterministic(ref_subset):
    """The babble/cafe speech pool is built lazily and __getitem__ runs on
    DataLoader worker THREADS: a reader must never observe a partially
    built pool (which would draw noise from a nondeterministic subset or
    crash on an empty one). Regression for the atomic-publish + lock fix."""
    import concurrent.futures as cf

    from avvad_tpu.data import AudioSequenceSource

    root = os.path.join(ref_subset, "processed/")
    inner = AudioSequenceSource(root, "train", "subset", "vad_labels",
                                upsampled=False)
    # Babble items only (kind index 0): all of them touch the pool
    babble_items = [i for i in range(len(AugmentingSource(inner, seed=0)))
                    if AugmentingSource(inner, seed=0)._split(i)[1] == "Babble"]

    serial_src = AugmentingSource(inner, seed=0)
    serial = {i: serial_src[i]["audio"] for i in babble_items}

    for _ in range(3):  # several cold starts to give a race a chance
        src = AugmentingSource(inner, seed=0)  # fresh: pool unbuilt
        with cf.ThreadPoolExecutor(max_workers=8) as ex:
            results = list(ex.map(lambda i: (i, src[i]["audio"]),
                                  babble_items))
        for i, audio in results:
            np.testing.assert_array_equal(audio, serial[i])


def test_feature_stats_fast_path_matches_item_path(ref_subset):
    """feature_stats uses the audio-only fast path (feature_item) on
    augmenting sources; its realizations must match __getitem__'s for the
    same (seed, epoch, item)."""
    from avvad_tpu.data import AudioSequenceSource

    root = os.path.join(ref_subset, "processed/")
    inner = AudioSequenceSource(root, "train", "subset", "vad_labels",
                                upsampled=False)
    src = AugmentingSource(inner, seed=7)
    for i in (0, 5, 11):
        # audio-only source: the fast path applies the same label-length
        # truncation, so it must agree exactly (at 30 fps labels the
        # truncation halves the frame count — a fast path without it
        # would compute stats over frames the model never sees)
        np.testing.assert_array_equal(src.feature_item(i),
                                      src[i]["audio"])
