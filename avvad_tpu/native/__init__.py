"""ctypes bindings for the native host-IO core (native/avvad_io.cpp).

The library is built on demand (`make -C native`, or `build()` here) and
every entry point has a pure-Python fallback, so the framework works with
or without the compiled extension. Enable for the data pipeline by calling
`use_native_io()` or setting AVVAD_NATIVE=1.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libavvad_io.so")

_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> str:
    """Compile the shared library with make; returns its path."""
    if force or not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    return _LIB_PATH


def load(auto_build: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building if needed) the library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if auto_build:
            build()
        lib = ctypes.CDLL(_LIB_PATH)
    except Exception:
        return None

    lib.wav_info.restype = ctypes.c_int
    lib.wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
                             ctypes.POINTER(ctypes.c_int32),
                             ctypes.POINTER(ctypes.c_int64)]
    lib.wav_read_f32.restype = ctypes.c_int64
    lib.wav_read_f32.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_float),
                                 ctypes.c_int64,
                                 ctypes.POINTER(ctypes.c_int32)]
    lib.peak_normalize.restype = None
    lib.peak_normalize.argtypes = [ctypes.POINTER(ctypes.c_float),
                                   ctypes.c_int64]
    lib.frame_energy_vad.restype = ctypes.c_int64
    lib.frame_energy_vad.argtypes = [ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_int64, ctypes.c_int32,
                                     ctypes.c_int32, ctypes.c_int32,
                                     ctypes.c_double,
                                     ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_int64]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def wav_info(path: str):
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    n = ctypes.c_int64()
    rc = lib.wav_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                      ctypes.byref(n))
    if rc != 0:
        raise IOError(f"wav_info({path}) failed: rc={rc}")
    return int(sr.value), int(ch.value), int(n.value)


def read_wav(path: str, normalize: bool = False):
    """Native WAV decode -> (float32 channel-0 signal, sample_rate)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    _sr, _ch, n = wav_info(path)
    out = np.empty(n, dtype=np.float32)
    sr = ctypes.c_int32()
    rc = lib.wav_read_f32(path.encode(),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          n, ctypes.byref(sr))
    if rc < 0:
        raise IOError(f"wav_read_f32({path}) failed: rc={rc}")
    if normalize:
        lib.peak_normalize(out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                           n)
    return out, int(sr.value)


def frame_energy_vad(x: np.ndarray, nfft: int, hop: int, pad_end: int,
                     threshold_log10: float = 1.70) -> np.ndarray:
    """Native frame-energy VAD; x float32, returns (n_frames,) float32."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(x, dtype=np.float32)
    max_frames = 1 + (len(x) + pad_end) // hop
    out = np.empty(max_frames, dtype=np.float32)
    n = lib.frame_energy_vad(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), nfft, hop,
        pad_end, threshold_log10,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_frames)
    if n < 0:
        raise ValueError(f"frame_energy_vad failed: rc={n}")
    return out[:n]
