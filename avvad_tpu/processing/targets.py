"""VAD / IBM label generators (host-side numpy).

Numerically matches /root/reference/packages/processing/target.py:
- frame-level VAD from time-domain frame energy vs 10^vad_threshold * min
  power (target.py:51-55),
- Ideal Binary Mask from log-magnitude within ibm_threshold dB of the max
  (target.py:65-70),
- noise-robust IBM = IBM * VAD (target.py:103),
- voiced/unvoiced split-characteristic threshold IBMs (target.py:110-250).
"""

from __future__ import annotations

import numpy as np

from .stft import frame, pad_for_stft


def clean_speech_VAD(
    speech_t: np.ndarray,
    fs: float = 16000,
    wlen_sec: float = 64e-3,
    hop_percent: float = 0.25,
    center: bool = False,
    pad_mode: str = "reflect",
    pad_at_end: bool = True,
    vad_threshold: float = 1.70,
) -> np.ndarray:
    """Energy-threshold VAD over STFT-aligned frames. Returns (1, n_frames) float32."""
    nfft = int(wlen_sec * fs)
    hopsamp = int(hop_percent * nfft)
    y = pad_for_stft(
        np.asarray(speech_t),
        fs=fs,
        wlen_sec=wlen_sec,
        hop_percent=hop_percent,
        center=center,
        pad_mode=pad_mode,
        pad_at_end=pad_at_end,
    )
    y_frames = frame(y, nfft, hopsamp)
    power = np.power(y_frames, 2).sum(axis=0)
    vad = power > np.power(10, vad_threshold) * np.min(power)
    return np.float32(vad)[None]


def clean_speech_IBM(
    speech_tf: np.ndarray,
    eps: float = 1e-8,
    ibm_threshold: float = 50,
) -> np.ndarray:
    """Ideal binary mask: bins within `ibm_threshold` dB of the global max."""
    mag = abs(speech_tf)
    power_db = 20 * np.log10(mag + eps)
    mask = power_db > np.max(power_db) - ibm_threshold
    return np.float32(mask)


def noise_robust_clean_speech_IBM(
    speech_t: np.ndarray,
    speech_tf: np.ndarray,
    fs: float = 16000,
    wlen_sec: float = 64e-3,
    hop_percent: float = 0.25,
    center: bool = False,
    pad_mode: str = "reflect",
    pad_at_end: bool = True,
    vad_threshold: float = 1.70,
    eps: float = 1e-8,
    ibm_threshold: float = 50,
) -> np.ndarray:
    """IBM gated by the energy VAD — robust to noise before/after speech."""
    vad = clean_speech_VAD(
        speech_t,
        fs=fs,
        wlen_sec=wlen_sec,
        hop_percent=hop_percent,
        center=center,
        pad_mode=pad_mode,
        pad_at_end=pad_at_end,
        vad_threshold=vad_threshold,
    )
    ibm = clean_speech_IBM(speech_tf, eps=eps, ibm_threshold=ibm_threshold)
    return ibm * vad


def _voiced_unvoiced_split_characteristic(number_of_frequency_bins: int):
    split_bin = 200
    transition_width = 99
    fast_transition_width = 5
    low_bin = 4
    high_bin = 500

    a = np.arange(0, transition_width)
    a = np.pi / (transition_width - 1) * a
    transition = 0.5 * (1 + np.cos(a))

    b = np.arange(0, fast_transition_width)
    b = np.pi / (fast_transition_width - 1) * b
    fast_transition = (np.cos(b) + 1) / 2

    transition_voiced_start = int(split_bin - transition_width / 2)
    voiced = np.ones(number_of_frequency_bins)

    # High edge
    voiced[transition_voiced_start - 1 : transition_voiced_start + transition_width - 1] = transition
    voiced[transition_voiced_start - 1 + transition_width : len(voiced)] = 0

    # Low edge
    voiced[0:low_bin] = 0
    voiced[low_bin - 1 : low_bin + fast_transition_width - 1] = 1 - fast_transition

    unvoiced = np.ones(number_of_frequency_bins)
    unvoiced[transition_voiced_start - 1 : transition_voiced_start + transition_width - 1] = 1 - transition
    unvoiced[0:transition_voiced_start] = 0

    unvoiced[high_bin - 1 : len(unvoiced)] = 0
    unvoiced[high_bin - 1 : high_bin + fast_transition_width - 1] = fast_transition

    return voiced, unvoiced


def noise_aware_IBM(
    X: np.ndarray,
    N: np.ndarray,
    threshold_unvoiced_speech: float = 5,
    threshold_voiced_speech: float = 0,
    threshold_unvoiced_noise: float = -10,
    threshold_voiced_noise: float = -10,
    low_cut: int = 5,
    high_cut: int = 500,
):
    """Speech/noise masks from per-bin PSD thresholds. X, N: (frames, bins)."""
    voiced, unvoiced = _voiced_unvoiced_split_characteristic(X.shape[-1])

    threshold = threshold_voiced_speech * voiced + threshold_unvoiced_speech * unvoiced
    threshold_new = threshold_unvoiced_noise * voiced + threshold_voiced_noise * unvoiced

    xPSD = X * X.conjugate()

    c = np.power(10, threshold / 10)
    xPSD_threshold = xPSD / c
    c_new = np.power(10, threshold_new / 10)
    xPSD_threshold_new = xPSD / c_new

    nPSD = N * N.conjugate()

    speechMask = xPSD_threshold > nPSD
    speechMask = np.logical_and(speechMask, xPSD_threshold > 0.005)
    speechMask[..., 0 : low_cut - 1] = 0
    speechMask[..., high_cut : len(speechMask[0])] = 0

    noiseMask = xPSD_threshold_new < nPSD
    noiseMask = np.logical_or(noiseMask, xPSD_threshold_new < 0.005)
    noiseMask[..., 0 : low_cut - 1] = 1
    noiseMask[..., high_cut : len(noiseMask[0])] = 1

    return speechMask, noiseMask


def threshold_IBM(
    X: np.ndarray,
    threshold_unvoiced_speech: float = 5,
    threshold_voiced_speech: float = 0,
    threshold_unvoiced_noise: float = -10,
    threshold_voiced_noise: float = -10,
    low_cut: int = 5,
    high_cut: int = 500,
) -> np.ndarray:
    """Speech mask against a fixed PSD floor of 10 (no noise estimate)."""
    voiced, unvoiced = _voiced_unvoiced_split_characteristic(X.shape[-1])

    threshold = threshold_voiced_speech * voiced + threshold_unvoiced_speech * unvoiced

    xPSD = X * X.conjugate()
    c = np.power(10, threshold / 10)
    xPSD_threshold = xPSD / c

    nPSD = 10

    speechMask = xPSD_threshold > nPSD
    speechMask = np.logical_and(speechMask, xPSD_threshold > 0.005)
    speechMask[..., 0 : low_cut - 1] = 0
    speechMask[..., high_cut : len(speechMask[0])] = 0

    return speechMask
