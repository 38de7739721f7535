"""Threshold-based IBM variants: noise-robust, noise-aware, fixed-floor."""

import numpy as np

from avvad_tpu.processing import (
    clean_speech_IBM,
    clean_speech_VAD,
    noise_aware_IBM,
    noise_robust_clean_speech_IBM,
    read_wav,
    stft,
    threshold_IBM,
)
from avvad_tpu.processing.audio_io import peak_normalize
from avvad_tpu.processing.targets import _voiced_unvoiced_split_characteristic


def test_noise_robust_ibm_is_ibm_gated_by_vad(ref_subset):
    import glob, os

    wav = sorted(glob.glob(os.path.join(
        ref_subset, "processed/ntcd_timit/Clean/**/*.wav"), recursive=True))[0]
    x, fs = read_wav(wav)
    x = peak_normalize(x)
    sxx = stft(x, fs=fs)
    nr = noise_robust_clean_speech_IBM(x, sxx, fs=fs)
    ibm = clean_speech_IBM(sxx)
    vad = clean_speech_VAD(x, fs=fs)
    np.testing.assert_array_equal(nr, ibm * vad)
    # gating only removes activity, never adds
    assert (nr <= ibm).all()


def test_voiced_unvoiced_split_characteristic():
    voiced, unvoiced = _voiced_unvoiced_split_characteristic(513)
    assert voiced.shape == unvoiced.shape == (513,)
    # low-frequency bins are cut from voiced; DC unvoiced is 0 too
    assert (voiced[:4] == 0).all()
    # above the transition band, voiced = 0 and unvoiced was 1 until high_bin
    assert voiced[300] == 0 and unvoiced[300] == 1
    # above high_bin the unvoiced characteristic is cut
    assert (unvoiced[504:] == 0).all()
    # inside the split band both are in [0, 1] and complementary-ish
    mid = slice(150, 250)
    assert (voiced[mid] >= 0).all() and (voiced[mid] <= 1).all()


def test_threshold_and_noise_aware_ibm_semantics():
    rng = np.random.default_rng(0)
    frames, bins = 8, 513
    x = (rng.normal(size=(frames, bins)) + 1j * rng.normal(size=(frames, bins)))
    x *= 50.0  # push PSD over the fixed floor of 10
    n = 0.1 * (rng.normal(size=(frames, bins)) + 1j * rng.normal(size=(frames, bins)))

    sm = threshold_IBM(x)
    assert sm.shape == (frames, bins) and sm.dtype == bool
    # cut bands forced inactive
    assert not sm[:, :4].any()
    assert not sm[:, 500:].any()
    # strong signal activates interior bins
    assert sm[:, 10:490].mean() > 0.5

    speech_mask, noise_mask = noise_aware_IBM(x, n)
    assert not speech_mask[:, :4].any()
    assert noise_mask[:, :4].all()
    assert noise_mask[:, 500:].all()
    # with strong speech and weak noise, speech mask dominates the interior
    assert speech_mask[:, 10:490].mean() > noise_mask[:, 10:490].mean()
