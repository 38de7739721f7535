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
    """Load (building if needed) the library; None if unavailable. A
    stale on-disk .so missing a newer entry point triggers one forced
    rebuild; the rebuilt library is loaded through a unique temp copy
    because dlopen caches by pathname — re-CDLL'ing the original path in
    the same process would hand back the already-mapped stale object."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if auto_build:
            build()
        lib = ctypes.CDLL(_LIB_PATH)
        try:
            lib.hub_assemble_span_gated_i16  # newest symbol: staleness probe
        except AttributeError:
            if not auto_build:
                return None
            import atexit
            import shutil
            import tempfile

            build(force=True)
            tmp = tempfile.NamedTemporaryFile(
                prefix="libavvad_io_", suffix=".so", delete=False)
            tmp.close()
            shutil.copy(_LIB_PATH, tmp.name)
            lib = ctypes.CDLL(tmp.name)
            lib.hub_assemble_span_gated_i16
            # the dlopen mapping survives unlink on Linux; remove the temp
            # copy at exit so the staleness probe doesn't leak one .so per
            # process
            atexit.register(
                lambda p=tmp.name: os.path.exists(p) and os.unlink(p))
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
    fp = ctypes.POINTER(ctypes.c_float)
    lib.hub_create.restype = ctypes.c_void_p
    lib.hub_create.argtypes = [ctypes.c_int32] * 4
    lib.hub_destroy.restype = None
    lib.hub_destroy.argtypes = [ctypes.c_void_p]
    lib.hub_reset.restype = None
    lib.hub_reset.argtypes = [ctypes.c_void_p]
    lib.hub_reset_stream.restype = ctypes.c_int32
    lib.hub_reset_stream.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.hub_feed.restype = ctypes.c_int64
    lib.hub_feed.argtypes = [ctypes.c_void_p, ctypes.c_int32, fp,
                             ctypes.c_int64]
    lib.hub_frames_ready.restype = ctypes.c_int64
    lib.hub_frames_ready.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.hub_assemble.restype = ctypes.c_int32
    lib.hub_assemble.argtypes = [ctypes.c_void_p, fp, fp, fp]
    lib.hub_assemble_gated.restype = ctypes.c_int32
    lib.hub_assemble_gated.argtypes = [ctypes.c_void_p, fp, fp, fp, fp]
    lib.hub_assemble_span_gated.restype = ctypes.c_int32
    lib.hub_assemble_span_gated.argtypes = [ctypes.c_void_p, fp, fp, fp, fp]
    ip = ctypes.POINTER(ctypes.c_int16)
    lib.hub_create_i16.restype = ctypes.c_void_p
    lib.hub_create_i16.argtypes = [ctypes.c_int32] * 4
    lib.hub_feed_i16.restype = ctypes.c_int64
    lib.hub_feed_i16.argtypes = [ctypes.c_void_p, ctypes.c_int32, ip,
                                 ctypes.c_int64]
    lib.hub_assemble_span_gated_i16.restype = ctypes.c_int32
    lib.hub_assemble_span_gated_i16.argtypes = [ctypes.c_void_p, fp, ip,
                                                fp, fp]
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


class StreamHub:
    """Multi-stream sample rings + one-call block assembly (serving).

    Native (C++) when the library is available, with a drop-in numpy
    fallback. Per tick, `assemble()` writes every ready stream's next
    (block_frames, nfft) frame block into one preallocated
    (n_streams, block_frames, nfft) array — one call, no per-stream Python.
    """

    def __init__(self, n_streams: int, nfft: int, hop: int,
                 block_frames: int, force_python: bool = False,
                 dtype=np.float32):
        # dtype: np.float32 (historical wire) or np.int16 — raw 16-bit PCM
        # buffered and span-assembled as int16 (half the host->device
        # payload; peaks then report max |sample| in the int16 domain and
        # the device frontend divides the cast samples by that int-domain
        # peak — bit-exact vs the float wire for int16-origin sources).
        # int16 supports the SPAN wire only (no frames assemble).
        self.dtype = np.dtype(dtype)
        if self.dtype not in (np.dtype(np.float32), np.dtype(np.int16)):
            raise ValueError(f"StreamHub dtype must be float32 or int16, "
                             f"got {self.dtype}")
        self._i16 = self.dtype == np.int16
        self.n = n_streams
        self.nfft = nfft
        self.hop = hop
        self.block_frames = block_frames
        self._lib = None if force_python else load()
        self._out = (None if self._i16 else
                     np.zeros((n_streams, block_frames, nfft), np.float32))
        self.span = (block_frames - 1) * hop + nfft
        self._out_span = None  # (N, span), allocated on first span assemble
        self._peaks = np.zeros(n_streams, np.float32)
        self._active = np.zeros(n_streams, np.float32)
        if self._lib is not None:
            create = (self._lib.hub_create_i16 if self._i16
                      else self._lib.hub_create)
            self._h = create(n_streams, nfft, hop, block_frames)
            if not self._h:
                raise RuntimeError("hub_create failed")
        else:
            self._bufs = [np.zeros(0, self.dtype) for _ in range(n_streams)]
            self._py_peaks = np.zeros(n_streams, np.float32)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_h", None):
            self._lib.hub_destroy(self._h)
            self._h = None

    @property
    def is_native(self) -> bool:
        return self._lib is not None

    def reset(self) -> None:
        if self._lib is not None:
            self._lib.hub_reset(self._h)
        else:
            self._bufs = [np.zeros(0, self.dtype) for _ in range(self.n)]
            self._py_peaks[:] = 0.0

    def reset_stream(self, stream: int) -> None:
        """Clear one stream's buffer and peak (connection recycling)."""
        if self._lib is not None:
            rc = self._lib.hub_reset_stream(self._h, stream)
            if rc < 0:
                raise ValueError(f"hub_reset_stream failed: rc={rc}")
        else:
            self._bufs[stream] = np.zeros(0, self.dtype)
            self._py_peaks[stream] = 0.0

    def _ready_py(self, i: int) -> int:
        n = len(self._bufs[i])
        return 0 if n < self.nfft else 1 + (n - self.nfft) // self.hop

    def feed(self, stream: int, pcm: np.ndarray) -> int:
        """Buffer samples; returns complete frames now buffered. An int16
        hub requires int16 input (an implicit float->int16 cast would
        silently truncate samples — the caller must quantize explicitly)."""
        pcm = np.asarray(pcm)
        if self._i16 and pcm.dtype != np.int16:
            raise TypeError(f"int16 StreamHub.feed requires int16 PCM, "
                            f"got {pcm.dtype}")
        pcm = np.ascontiguousarray(pcm, dtype=self.dtype)
        if self._lib is not None:
            if self._i16:
                rc = self._lib.hub_feed_i16(
                    self._h, stream,
                    pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                    len(pcm))
            else:
                rc = self._lib.hub_feed(
                    self._h, stream,
                    pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    len(pcm))
            if rc < 0:
                raise ValueError(f"hub_feed failed: rc={rc}")
            return int(rc)
        if pcm.size:
            # abs in float: np.abs(int16 -32768) overflows in-dtype
            peak = float(np.max(np.abs(pcm.astype(np.float32))))
            self._py_peaks[stream] = max(self._py_peaks[stream], peak)
        self._bufs[stream] = np.concatenate([self._bufs[stream], pcm])
        return self._ready_py(stream)

    def frames_ready(self, stream: int) -> int:
        if self._lib is not None:
            return int(self._lib.hub_frames_ready(self._h, stream))
        return self._ready_py(stream)

    def assemble(self, gate: Optional[np.ndarray] = None,
                 span: bool = False):
        """-> (blocks, peaks (N,), active (N,), n_active).

        `blocks` is (N, bf, nfft) materialized frames, or — with
        `span=True` — the (N, (bf-1)*hop + nfft) CONTIGUOUS sample span of
        the block (~nfft/hop smaller; framing then happens on device, see
        serve.py span_wire). `gate` ((N,) float, optional): streams with
        gate == 0 are held back even when audio-ready (their samples stay
        buffered) — an audio-visual server gates on the video side having
        a full block. The returned arrays are reused across calls —
        consume (device_put) before the next assemble."""
        if self._i16 and not span:
            raise ValueError("int16 StreamHub supports the span wire only "
                             "(frames assemble is float32)")
        if span and self._out_span is None:
            self._out_span = np.zeros((self.n, self.span), self.dtype)
        out = self._out_span if span else self._out
        if self._lib is not None:
            fp = ctypes.POINTER(ctypes.c_float)
            if self._i16:
                assemble_gated = self._lib.hub_assemble_span_gated_i16
                out_p = out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))
            else:
                assemble_gated = (self._lib.hub_assemble_span_gated if span
                                  else self._lib.hub_assemble_gated)
                out_p = out.ctypes.data_as(fp)
            if gate is not None:
                gate = np.ascontiguousarray(gate, dtype=np.float32)
                gate_p = gate.ctypes.data_as(fp)
            else:
                gate_p = ctypes.cast(None, fp)
            n_active = assemble_gated(
                self._h, gate_p, out_p,
                self._peaks.ctypes.data_as(fp),
                self._active.ctypes.data_as(fp))
            return out, self._peaks, self._active, int(n_active)
        n_active = 0
        bf, nfft, hop = self.block_frames, self.nfft, self.hop
        for i in range(self.n):
            self._peaks[i] = self._py_peaks[i]
            if (gate is not None and gate[i] == 0.0) or self._ready_py(i) < bf:
                self._active[i] = 0.0
                continue
            buf = self._bufs[i]
            if span:
                out[i] = buf[: self.span]
            else:
                idx = (np.arange(bf)[:, None] * hop
                       + np.arange(nfft)[None, :])
                out[i] = buf[idx]
            self._bufs[i] = buf[bf * hop:]
            self._active[i] = 1.0
            n_active += 1
        return out, self._peaks, self._active, n_active
