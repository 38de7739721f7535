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


def test_stream_hub_gated_assemble(lib):
    """Gated assemble (native and python paths): a gated-out stream is held
    back without consuming its samples, and produces the identical block
    once the gate opens."""
    from avvad_tpu.native import StreamHub

    rng = np.random.default_rng(3)
    nfft, hop, bf = 16, 4, 3
    need = (bf - 1) * hop + nfft + hop  # enough for > bf frames
    pcm = [rng.normal(size=need).astype(np.float32) for _ in range(3)]

    results = {}
    for force_py in (False, True):
        hub = StreamHub(3, nfft, hop, bf, force_python=force_py)
        if not force_py and not hub.is_native:
            continue  # native lib unavailable; python path still tested
        for i, x in enumerate(pcm):
            hub.feed(i, x)
        gate = np.array([1.0, 0.0, 1.0], np.float32)
        blocks, peaks, active, n_active = hub.assemble(gate=gate)
        assert n_active == 2 and active.tolist() == [1.0, 0.0, 1.0]
        first = blocks.copy()
        assert hub.frames_ready(1) >= bf  # stream 1 kept its samples
        blocks2, _, active2, n2 = hub.assemble()  # gate open
        assert n2 >= 1 and active2[1] == 1.0
        results[force_py] = (first, blocks2.copy())

    if False in results and True in results:
        for a, b in zip(results[False], results[True]):
            np.testing.assert_allclose(a[np.bool_([1, 0, 1])],
                                       b[np.bool_([1, 0, 1])], atol=0)
        # stream 1's deferred block must match across implementations
        np.testing.assert_allclose(results[False][1][1], results[True][1][1],
                                   atol=0)


def test_stream_hub_int16_span(lib):
    """int16 hub (native and python paths): span assemble returns int16
    blocks whose peak-normalized quotient is bit-identical to the float32
    hub fed the same int16-origin samples; gate/consume semantics match;
    float feeds and frames assemble are rejected."""
    from avvad_tpu.native import StreamHub

    rng = np.random.default_rng(11)
    nfft, hop, bf = 16, 4, 3
    need = (bf - 1) * hop + nfft + hop
    pcm_i = [rng.integers(-32768, 32768, size=need, dtype=np.int16)
             for _ in range(3)]
    # include the most negative sample: |−32768| must not overflow in-dtype
    pcm_i[0][0] = -32768

    for force_py in (False, True):
        hub_f = StreamHub(3, nfft, hop, bf, force_python=force_py)
        hub_i = StreamHub(3, nfft, hop, bf, force_python=force_py,
                          dtype=np.int16)
        if not force_py and not hub_i.is_native:
            continue
        for i, x in enumerate(pcm_i):
            hub_f.feed(i, x.astype(np.float32) / 32768.0)
            hub_i.feed(i, x)
        gate = np.array([1.0, 0.0, 1.0], np.float32)
        sp_f, pk_f, ac_f, n_f = hub_f.assemble(gate=gate, span=True)
        sp_i, pk_i, ac_i, n_i = hub_i.assemble(gate=gate, span=True)
        assert sp_i.dtype == np.int16
        assert n_f == n_i == 2
        np.testing.assert_array_equal(ac_f, ac_i)
        # int-domain peak: max |sample| including |-32768|
        assert pk_i[0] == float(np.abs(pcm_i[0].astype(np.int32)).max())
        for s in (0, 2):
            qf = sp_f[s] / pk_f[s]
            qi = sp_i[s].astype(np.float32) / pk_i[s]
            np.testing.assert_array_equal(qf, qi)
        # gated-out stream kept its samples; deferred block matches
        assert hub_i.frames_ready(1) >= bf
        sp_i2, _, ac_i2, _ = hub_i.assemble(span=True)
        sp_f2, pk_f2, ac_f2, _ = hub_f.assemble(span=True)
        assert ac_i2[1] == ac_f2[1] == 1.0
        np.testing.assert_array_equal(
            sp_f2[1] / pk_f2[1], sp_i2[1].astype(np.float32) / pk_i[1])
        with pytest.raises(TypeError):
            hub_i.feed(0, np.zeros(8, np.float32))
        with pytest.raises(ValueError):
            hub_i.assemble()
        with pytest.raises(ValueError):
            StreamHub(3, nfft, hop, bf, force_python=force_py,
                      dtype=np.float64)
