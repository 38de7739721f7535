"""WAV I/O without librosa/torchaudio/soundfile.

The reference reads audio through torchaudio.load, which scales integer PCM
to [-1, 1] (/root/reference/packages/data_handling.py:280). Every consumer
immediately peak-normalizes (`x / max(|x|)`), so any consistent linear scale
is parity-equivalent; we still match torchaudio's 1/32768 scaling for int16
so intermediate values agree too.
"""

from __future__ import annotations

import numpy as np
from scipy.io import wavfile


_INT_SCALE = {
    np.dtype(np.int16): 1.0 / 32768.0,
    np.dtype(np.int32): 1.0 / 2147483648.0,
    np.dtype(np.uint8): None,  # handled specially (offset binary)
}


def _native_reader():
    """The C++ decoder (native/avvad_io.cpp) when opted in via
    AVVAD_NATIVE=1; parity-tested against the scipy path."""
    import os

    if os.environ.get("AVVAD_NATIVE") != "1":
        return None
    try:
        from .. import native

        return native if native.available() else None
    except Exception:
        return None


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Read a WAV file -> (float32 mono signal in [-1, 1], sample_rate).

    Multi-channel files return channel 0, mirroring the reference's
    `speech[0]` convention."""
    nat = _native_reader()
    if nat is not None:
        return nat.read_wav(path)
    fs, data = wavfile.read(path)
    if data.ndim == 2:
        data = data[:, 0]
    dt = data.dtype
    if dt == np.uint8:
        x = (data.astype(np.float32) - 128.0) / 128.0
    elif dt in (np.dtype(np.int16), np.dtype(np.int32)):
        x = data.astype(np.float32) * _INT_SCALE[dt]
    else:  # already float
        x = data.astype(np.float32)
    return x, int(fs)


def peak_normalize(x: np.ndarray) -> np.ndarray:
    """x / max(|x|) (/root/reference/packages/data_handling.py:285)."""
    return x / np.max(np.abs(x))


def write_wav(path: str, x: np.ndarray, fs: int) -> None:
    """Write float signal as 16-bit PCM."""
    x = np.asarray(x)
    if x.dtype.kind == "f":
        x = np.clip(x, -1.0, 1.0)
        x = (x * 32767.0).astype(np.int16)
    wavfile.write(path, fs, x)
