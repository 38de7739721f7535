"""On-device ops vs host processing parity (jit-safe twins)."""

import numpy as np
import jax.numpy as jnp

from avvad_tpu.processing import read_wav, stft, log_power_spectrogram
from avvad_tpu.processing.audio_io import peak_normalize
from avvad_tpu.processing.targets import clean_speech_VAD
from avvad_tpu.ops.stft import (
    frame_energy_vad,
    log_power_frontend,
    stft_frames,
)


def _wav(ref_subset):
    import glob, os

    path = sorted(
        glob.glob(os.path.join(ref_subset, "processed/ntcd_timit/Clean/**/*.wav"),
                  recursive=True)
    )[0]
    x, fs = read_wav(path)
    return x, fs


def test_stft_frames_matches_host(ref_subset):
    x, fs = _wav(ref_subset)
    x = peak_normalize(x)
    ref = stft(x, fs=fs, hop_percent=0.25, center=False, pad_at_end=True)  # (F, T)
    re, im = stft_frames(jnp.asarray(x), fs=fs, hop_percent=0.25)  # (T, F) each
    re, im = np.asarray(re), np.asarray(im)
    assert re.T.shape == ref.shape
    # DFT-as-matmul in float32 vs float64 FFT: ~1e-3 absolute agreement
    np.testing.assert_allclose(re.T, ref.real, atol=5e-3)
    np.testing.assert_allclose(im.T, ref.imag, atol=5e-3)


def test_log_power_frontend_matches_host(ref_subset):
    x, fs = _wav(ref_subset)
    ref = log_power_spectrogram(stft(peak_normalize(x), fs=fs))
    dev = np.asarray(log_power_frontend(jnp.asarray(x), fs=fs))
    # log(power + 1e-8) bounds the error of near-zero bins; float32
    # DFT-by-matmul vs float64 FFT agrees to ~1% in the log domain.
    np.testing.assert_allclose(dev.T, ref, rtol=1e-2, atol=2e-2)


def test_log_power_frontend_batched(ref_subset):
    x, fs = _wav(ref_subset)
    xb = jnp.stack([jnp.asarray(x), jnp.asarray(x) * 0.5])
    out = np.asarray(log_power_frontend(xb, fs=fs))
    # peak normalization makes scale irrelevant
    np.testing.assert_allclose(out[0], out[1], atol=1e-4)


def test_frame_energy_vad_matches_host(ref_subset):
    x, fs = _wav(ref_subset)
    x = peak_normalize(x)
    ref = clean_speech_VAD(x, fs=fs, hop_percent=0.25, center=False, pad_at_end=True)
    dev = np.asarray(frame_energy_vad(jnp.asarray(x), fs=fs, hop_percent=0.25))
    np.testing.assert_array_equal(dev[None], ref)


def test_istft_frames_roundtrip(ref_subset):
    """Device STFT -> device iSTFT recovers the signal (interior)."""
    from avvad_tpu.ops.stft import istft_frames

    x, fs = _wav(ref_subset)
    x = peak_normalize(x)
    re, im = stft_frames(jnp.asarray(x), fs=fs, hop_percent=0.25)
    x_rec = np.asarray(istft_frames(re, im, fs=fs, hop_percent=0.25))
    n = min(len(x), len(x_rec))
    nfft = 1024
    np.testing.assert_allclose(x_rec[nfft:n - nfft], x[nfft:n - nfft],
                               atol=2e-4)


def test_istft_frames_matches_host(ref_subset):
    from avvad_tpu.processing import istft
    from avvad_tpu.ops.stft import istft_frames

    x, fs = _wav(ref_subset)
    x = peak_normalize(x)
    sxx = stft(x, fs=fs, hop_percent=0.25)  # host complex (F, T)
    host = istft(sxx, fs=fs, hop_percent=0.25)
    dev = np.asarray(istft_frames(jnp.asarray(sxx.real.T.copy()),
                                  jnp.asarray(sxx.imag.T.copy()),
                                  fs=fs, hop_percent=0.25))
    n = min(len(host), len(dev))
    np.testing.assert_allclose(dev[:n], host[:n], atol=2e-4)


def test_split_radix_matches_direct():
    """The Cooley-Tukey split DFT is the direct basis matmul reordered:
    re/im agree to fp32 reassociation noise, and the log-power domain on
    real speech stays within ~0.05 of the direct path even on the
    quietest bins (vs ~1 log-unit for bf16x3 precision, which is why
    split-radix is the acceptable fast path and precision-lowering is
    not)."""
    from avvad_tpu.ops.stft import log_power_frontend, stft_frames
    from avvad_tpu.processing import read_wav

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 20000)).astype(np.float32)
    r1, i1 = stft_frames(jnp.asarray(x))
    r2, i2 = stft_frames(jnp.asarray(x), split_radix=True)
    scale = float(np.abs(np.asarray(r1)).max())
    assert np.abs(np.asarray(r1) - np.asarray(r2)).max() < 1e-4 * scale
    assert np.abs(np.asarray(i1) - np.asarray(i2)).max() < 1e-4 * scale

    wav, fs = read_wav(
        "/root/reference/data/subset/processed/ntcd_timit/Clean/train/01M/sa1.wav")
    f1 = np.asarray(log_power_frontend(jnp.asarray(wav)[None], fs=fs))
    f2 = np.asarray(log_power_frontend(jnp.asarray(wav)[None], fs=fs,
                                       split_radix=True))
    assert np.abs(f1 - f2).max() < 0.1
    assert np.abs(f1 - f2).mean() < 1e-3


def test_hop_dft_matches_direct():
    """The hop-block DFT (one K=hop matmul per block + exact radix-4
    twiddle assembly + frequency-domain periodic Hann) is the windowed
    direct DFT exactly, reordered: re/im agree to fp32 rounding and the
    log-power domain on real speech stays within 1e-2 even on the
    quietest bins. (The quiet-bin error comes from cancellation: a quiet
    frame bin is the near-cancelling sum of four LARGE block-DFT values
    that were already rounded to fp32 — same mechanism as split-radix,
    but ~3x tighter because the assembly is only 4 sign-flip terms and
    the window taps are exact integer-bin shifts.)"""
    from avvad_tpu.ops.stft import log_power_frontend, stft_frames
    from avvad_tpu.processing import read_wav

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 20000)).astype(np.float32)
    r1, i1 = stft_frames(jnp.asarray(x))
    r2, i2 = stft_frames(jnp.asarray(x), hop_dft=True)
    scale = float(np.abs(np.asarray(r1)).max())
    assert np.abs(np.asarray(r1) - np.asarray(r2)).max() < 1e-5 * scale
    assert np.abs(np.asarray(i1) - np.asarray(i2)).max() < 1e-5 * scale

    wav, fs = read_wav(
        "/root/reference/data/subset/processed/ntcd_timit/Clean/train/01M/sa1.wav")
    f1 = np.asarray(log_power_frontend(jnp.asarray(wav)[None], fs=fs))
    f2 = np.asarray(log_power_frontend(jnp.asarray(wav)[None], fs=fs,
                                       hop_dft=True))
    assert np.abs(f1 - f2).max() < 0.1   # quietest real-speech bins
    assert np.abs(f1 - f2).mean() < 1e-3


def test_hop_dft_matches_host_stft():
    """hop_dft against the host numpy oracle directly (not just the
    device twin): same tolerance the direct device path holds."""
    from avvad_tpu.ops.stft import stft_frames
    from avvad_tpu.processing import read_wav, stft

    wav, fs = read_wav(
        "/root/reference/data/subset/processed/ntcd_timit/Clean/train/01M/sa1.wav")
    host = stft(wav, fs=fs)  # (F, T) complex
    re, im = stft_frames(jnp.asarray(wav), fs=fs, hop_dft=True)
    dev = np.asarray(re).T + 1j * np.asarray(im).T
    n = min(host.shape[1], dev.shape[1])
    np.testing.assert_allclose(dev[:, :n], host[:, :n], atol=2e-4)
