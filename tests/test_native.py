"""Native IO core (C++): build, parity vs the Python path, error handling."""

import glob
import os
import subprocess

import numpy as np
import pytest

from avvad_tpu import native


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return native.load()


def _wavs(ref_subset):
    return sorted(glob.glob(
        os.path.join(ref_subset, "processed/ntcd_timit/Clean/**/*.wav"),
        recursive=True))


def test_wav_decode_parity(lib, ref_subset):
    from scipy.io import wavfile

    for path in _wavs(ref_subset):
        x_nat, sr_nat = native.read_wav(path)
        sr_ref, data = wavfile.read(path)
        if data.ndim == 2:
            data = data[:, 0]
        x_ref = data.astype(np.float32) / 32768.0
        assert sr_nat == sr_ref
        np.testing.assert_array_equal(x_nat, x_ref, err_msg=path)


def test_wav_info(lib, ref_subset):
    path = _wavs(ref_subset)[0]
    sr, ch, n = native.wav_info(path)
    x, sr2 = native.read_wav(path)
    assert sr == sr2 == 16000
    assert n == len(x)


def test_peak_normalize_parity(lib, ref_subset):
    path = _wavs(ref_subset)[0]
    x, _ = native.read_wav(path, normalize=True)
    y, _ = native.read_wav(path)
    np.testing.assert_allclose(x, y / np.max(np.abs(y)), atol=1e-7)


def test_native_vad_bit_exact_vs_python(lib, ref_subset):
    """The C++ VAD must reproduce processing.targets.clean_speech_VAD."""
    import math

    from avvad_tpu.processing import clean_speech_VAD
    from avvad_tpu.processing.audio_io import peak_normalize, read_wav

    for path in _wavs(ref_subset)[:4]:
        x, fs = read_wav(path)
        x = peak_normalize(x)
        ref = clean_speech_VAD(x, fs=fs, hop_percent=0.25, center=False,
                               pad_at_end=True)[0]
        nfft, hop = 1024, 256
        utt_len = len(x) / fs
        ratio = utt_len / 64e-3 / 0.25
        pad_end = hop if math.ceil(ratio) != int(ratio) else 0
        vad = native.frame_energy_vad(x, nfft, hop, pad_end)
        np.testing.assert_array_equal(vad, ref, err_msg=path)


def test_error_codes(lib, tmp_path):
    with pytest.raises(IOError):
        native.wav_info(str(tmp_path / "missing.wav"))
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"NOT A WAV FILE AT ALL....")
    with pytest.raises(IOError):
        native.read_wav(str(bad))


def test_env_toggle_routes_reader(lib, ref_subset, monkeypatch):
    from avvad_tpu.processing import audio_io

    path = _wavs(ref_subset)[0]
    monkeypatch.setenv("AVVAD_NATIVE", "1")
    x1, sr1 = audio_io.read_wav(path)
    monkeypatch.delenv("AVVAD_NATIVE")
    x2, sr2 = audio_io.read_wav(path)
    assert sr1 == sr2
    np.testing.assert_array_equal(x1, x2)
