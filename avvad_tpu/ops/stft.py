"""On-device STFT frontend (JAX, jit-safe, static shapes, no complex dtypes).

TPU-first re-design of the reference's per-item STFT-in-the-DataLoader
(/root/reference/packages/data_handling.py:288-301, which runs torch.stft
inside Dataset.__getitem__ on CPU workers): here the whole waveform ->
log-power-spectrogram frontend is one fused XLA computation that runs on
device, batched over utterances.

Hardware note: the target TPU backend implements no complex dtypes (and
therefore no FFT), so the DFT is expressed as two real matrix products
against cos/sin bases with the Hann window folded into the basis weights:

    re = frames @ (win * cos(2*pi*n*k/N));  im = -frames @ (win * sin(...))

For nfft=1024 that is a (T, 1024) x (1024, 513) contraction per part —
exactly MXU-shaped, and ~2.1 MFLOP per frame, i.e. ~130 MFLOP per audio
second: noise for a TPU chip. The same trick covers the reference's
stft_pytorch real/imag layout, which stacked (F, T, 2).

Shape policy: padding decisions depend only on the (static) signal length,
so they resolve at trace time — no dynamic shapes under jit.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(nfft: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (same as processing.stft.hann_window)."""
    n = np.arange(nfft, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / nfft)).astype(dtype)


@functools.lru_cache(maxsize=8)
def _windowed_dft_bases(nfft: int) -> tuple[np.ndarray, np.ndarray]:
    """(nfft, n_freq) cos/sin DFT bases with the Hann window pre-multiplied."""
    n = np.arange(nfft, dtype=np.float64)[:, None]
    k = np.arange(nfft // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / nfft
    w = hann_window(nfft, dtype=np.float64)[:, None]
    return (
        (w * np.cos(ang)).astype(np.float32),
        (-(w * np.sin(ang))).astype(np.float32),
    )


@functools.lru_cache(maxsize=8)
def _split_radix_bases(nfft: int, outer: int = 8):
    """Cooley-Tukey bases for a real-input DFT split as nfft = inner*outer.

    With n = n2*outer + n1 and k = k1*inner + k2:
      A[n1, k2] = DFT_inner of the n1-th polyphase component   (real input)
      X[k1*inner + k2] = DFT_outer over n1 of A[n1,k2] * e^{-2pi i n1 k2/N}
    Only k1 in [0, k1_max) is computed — enough to cover the nfft//2+1
    real-DFT bins. The dominant contraction is the inner DFT with
    K=inner=128 (MXU-ideal); total ~3.7x fewer FLOPs than the direct
    (nfft x n_freq) basis matmul at the same fp32 precision."""
    inner = nfft // outer
    n_freq = nfft // 2 + 1
    n2 = np.arange(inner, dtype=np.float64)
    k2 = np.arange(inner, dtype=np.float64)
    ang_in = 2.0 * np.pi * np.outer(n2, k2) / inner        # (inner, inner)
    n1 = np.arange(outer, dtype=np.float64)
    tw = 2.0 * np.pi * np.outer(n1, k2) / nfft             # (outer, inner)
    k1_max = (n_freq - 1) // inner + 1
    ang_out = 2.0 * np.pi * np.outer(
        n1, np.arange(k1_max, dtype=np.float64)) / outer   # (outer, k1_max)
    f = lambda a: a.astype(np.float32)  # noqa: E731
    return (f(np.cos(ang_in)), f(-np.sin(ang_in)),
            f(np.cos(tw)), f(-np.sin(tw)),
            f(np.cos(ang_out)), f(-np.sin(ang_out)), k1_max)


def _dft_split_radix(frames: jax.Array, nfft: int, precision,
                     outer: int = 8) -> tuple[jax.Array, jax.Array]:
    """Windowed real DFT of (..., nfft) frames via the split above."""
    c_in, s_in, t_re, t_im, o_re, o_im, k1m = _split_radix_bases(nfft, outer)
    inner = nfft // outer
    n_freq = nfft // 2 + 1
    xw = frames * jnp.asarray(hann_window(nfft))
    x2 = xw.reshape(xw.shape[:-1] + (inner, outer))        # [n2][n1]
    dot = functools.partial(jnp.einsum, precision=precision,
                            preferred_element_type=jnp.float32)
    a_re = dot("...ab,ak->...bk", x2, jnp.asarray(c_in))   # (..., outer, inner)
    a_im = dot("...ab,ak->...bk", x2, jnp.asarray(s_in))
    b_re = a_re * jnp.asarray(t_re) - a_im * jnp.asarray(t_im)
    b_im = a_re * jnp.asarray(t_im) + a_im * jnp.asarray(t_re)
    re = (dot("...nk,nj->...jk", b_re, jnp.asarray(o_re))
          - dot("...nk,nj->...jk", b_im, jnp.asarray(o_im)))
    im = (dot("...nk,nj->...jk", b_re, jnp.asarray(o_im))
          + dot("...nk,nj->...jk", b_im, jnp.asarray(o_re)))
    re = re.reshape(re.shape[:-2] + (k1m * inner,))[..., :n_freq]
    im = im.reshape(im.shape[:-2] + (k1m * inner,))[..., :n_freq]
    return re, im


@functools.lru_cache(maxsize=8)
def _hop_dft_bases(nfft: int, hop: int):
    """Bases for the hop-block DFT (see _dft_hop_blocks).

    Returns the UNWINDOWED (hop, n_freq) cos/sin bases evaluated on the
    frame-length frequency grid, plus the (r, n_freq) twiddle arrays
    e^{-2pi i k s hop / nfft} that assemble a frame's DFT from its r
    consecutive hop-block DFTs (r = nfft // hop). For the canonical
    hop = nfft/4 the twiddles are exactly {1, -i, -1, i}: the assembly is
    a radix-4 decimation-in-time final stage, i.e. sign flips and
    real/imag swaps."""
    r = nfft // hop
    n_freq = nfft // 2 + 1
    n = np.arange(hop, dtype=np.float64)[:, None]
    k = np.arange(n_freq, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / nfft                       # (hop, n_freq)
    s = np.arange(r, dtype=np.float64)[:, None]
    tw = 2.0 * np.pi * s * k * hop / nfft                  # (r, n_freq)
    f = lambda a: a.astype(np.float32)  # noqa: E731
    return (f(np.cos(ang)), f(-np.sin(ang)),
            f(np.cos(tw)), f(-np.sin(tw)))


def _dft_hop_blocks(x: jax.Array, nfft: int, hop: int, n_frames: int,
                    precision) -> tuple[jax.Array, jax.Array]:
    """Windowed real DFT of all frames of (..., n) signal `x`, exploiting
    the 75% frame overlap: frames at hop h share their samples, so the
    DFT matmul runs once per LENGTH-hop BLOCK (K=hop contraction) instead
    of once per length-nfft frame, and each frame's spectrum is assembled
    from its r = nfft/hop block spectra with constant twiddles — ~r times
    fewer matmul FLOPs at identical fp32 precision.

    The periodic Hann window (0.5 - 0.5 cos(2pi n/N)) cannot be folded
    into the block bases (it spans the whole frame), but its DFT is three
    integer-bin taps, so windowing is applied EXACTLY in frequency:
      Xw(k) = 0.5 X(k) - 0.25 X(k-1) - 0.25 X(k+1)   (circular),
    with the k=-1 / k=nfft/2+1 neighbours supplied by real-input
    conjugate symmetry. Everything reads in natural order — no polyphase
    relayout (the measured trap of the split-radix variant on this
    backend, BENCH_NOTES.md)."""
    r = nfft // hop
    n_freq = nfft // 2 + 1
    c_b, s_b, t_re, t_im = _hop_dft_bases(nfft, hop)
    nb = n_frames - 1 + r
    blocks = x[..., : nb * hop].reshape(x.shape[:-1] + (nb, hop))
    dot = functools.partial(jnp.matmul, precision=precision,
                            preferred_element_type=jnp.float32)
    b_re = dot(blocks, jnp.asarray(c_b))                   # (..., nb, F)
    b_im = dot(blocks, jnp.asarray(s_b))
    re = jnp.zeros(b_re.shape[:-2] + (n_frames, n_freq), jnp.float32)
    im = re
    for si in range(r):
        sr = b_re[..., si : si + n_frames, :]
        sim = b_im[..., si : si + n_frames, :]
        re = re + (sr * t_re[si] - sim * t_im[si])
        im = im + (sr * t_im[si] + sim * t_re[si])
    # periodic-Hann as exact 3-tap frequency conv; neighbours outside the
    # half spectrum come from conjugate symmetry: X(-1) = conj(X(1)),
    # X(nfft/2 + 1) = conj(X(nfft/2 - 1))
    re_l = jnp.concatenate([re[..., 1:2], re[..., :-1]], axis=-1)
    re_r = jnp.concatenate([re[..., 1:], re[..., -2:-1]], axis=-1)
    im_l = jnp.concatenate([-im[..., 1:2], im[..., :-1]], axis=-1)
    im_r = jnp.concatenate([im[..., 1:], -im[..., -2:-1]], axis=-1)
    return (0.5 * re - 0.25 * (re_l + re_r),
            0.5 * im - 0.25 * (im_l + im_r))


def _needs_end_pad(n_samples: int, fs: float, wlen_sec: float, hop_percent: float) -> bool:
    utt_len = n_samples / fs
    ratio = utt_len / wlen_sec / hop_percent
    return math.ceil(ratio) != int(ratio)


def _frame_starts(n_samples: int, nfft: int, hop: int) -> np.ndarray:
    n_frames = 1 + (n_samples - nfft) // hop
    return np.arange(n_frames) * hop


def frame_signal(x: jax.Array, nfft: int, hop: int) -> jax.Array:
    """Frame a (..., n) signal into (..., n_frames, nfft) windows.

    When hop divides nfft (the canonical 256|1024 case), overlapping frames
    decompose into `nfft/hop` shifted views of one hop-chunked reshape —
    pure reshape/slice/concat, no gather: frame[t] = concat_i(chunk[t+i])
    with chunk[k] = x[k*hop:(k+1)*hop]. Falls back to a static gather for
    non-dividing hops (e.g. the 30 fps-aligned 533-sample hop)."""
    n = x.shape[-1]
    n_frames = 1 + (n - nfft) // hop
    if nfft % hop == 0:
        r = nfft // hop
        need = (n_frames - 1 + r) * hop  # == (n_frames-1)*hop + nfft <= n
        chunks = x[..., :need].reshape(x.shape[:-1] + (n_frames - 1 + r, hop))
        return jnp.concatenate(
            [chunks[..., i : i + n_frames, :] for i in range(r)], axis=-1
        )
    starts = _frame_starts(n, nfft, hop)  # static
    idx = starts[:, None] + np.arange(nfft)[None, :]  # (T, nfft) static
    return x[..., idx]


def _pad_signal(
    x: jax.Array,
    nfft: int,
    hop: int,
    fs: int,
    wlen_sec: float,
    hop_percent: float,
    center: bool,
    pad_at_end: bool,
) -> jax.Array:
    n = x.shape[-1]
    pad_end = hop if (pad_at_end and _needs_end_pad(n, fs, wlen_sec, hop_percent)) else 0
    if pad_end:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad_end)])
    if center:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(nfft // 2, nfft // 2)],
                    mode="reflect")
    return x


@functools.partial(jax.jit, static_argnames=("fs", "wlen_sec", "hop_percent",
                                             "center", "pad_at_end",
                                             "precision", "split_radix",
                                             "hop_dft"))
def stft_frames(
    x: jax.Array,
    fs: int = 16000,
    wlen_sec: float = 64e-3,
    hop_percent: float = 0.25,
    center: bool = False,
    pad_at_end: bool = True,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
    split_radix: bool = False,
    hop_dft: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """STFT of a (..., n_samples) batch -> (re, im), each (..., n_frames, n_freq).

    Real/imag pair instead of complex (the backend has no complex dtypes);
    time-major (T, F) layout so the lane dimension is frequency.
    `split_radix`: compute the DFT via the Cooley-Tukey two-stage split
    (_dft_split_radix) — same fp32 math reordered, ~3.7x fewer FLOPs.
    `hop_dft`: one DFT matmul per hop block + exact radix-r assembly and
    frequency-domain Hann (_dft_hop_blocks) — ~nfft/hop fewer matmul
    FLOPs with no relayout.
    """
    nfft = int(wlen_sec * fs)
    hop = int(hop_percent * nfft)
    x = _pad_signal(x, nfft, hop, fs, wlen_sec, hop_percent, center, pad_at_end)
    if hop_dft and nfft % hop == 0:
        n_frames = 1 + (x.shape[-1] - nfft) // hop
        return _dft_hop_blocks(x, nfft, hop, n_frames, precision)
    frames = frame_signal(x, nfft, hop)  # (..., T, nfft)
    if split_radix and nfft % 8 == 0:
        return _dft_split_radix(frames, nfft, precision)
    cos_b, sin_b = _windowed_dft_bases(nfft)
    # Precision.HIGHEST (default): TPU matmuls otherwise truncate inputs to
    # bf16, which is catastrophic for the log-power of quiet bins (observed
    # ~10 log-units of error on hardware) — DEFAULT must not be used here.
    # HIGH (3-pass bf16) keeps ~21 effective mantissa bits; serving may opt
    # in where a quality check backs it (see bench.py / BENCH_NOTES.md).
    re = jnp.matmul(frames, jnp.asarray(cos_b), precision=precision,
                    preferred_element_type=jnp.float32)
    im = jnp.matmul(frames, jnp.asarray(sin_b), precision=precision,
                    preferred_element_type=jnp.float32)
    return re, im


@functools.partial(jax.jit, static_argnames=("fs", "wlen_sec", "hop_percent",
                                             "center", "pad_at_end",
                                             "peak_norm", "precision",
                                             "split_radix", "hop_dft"))
def log_power_frontend(
    x: jax.Array,
    fs: int = 16000,
    wlen_sec: float = 64e-3,
    hop_percent: float = 0.25,
    center: bool = False,
    pad_at_end: bool = True,
    eps: float = 1e-8,
    peak_norm: bool = True,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
    split_radix: bool = False,
    hop_dft: bool = False,
) -> jax.Array:
    """Fused waveform -> log(|STFT|^2 + eps), (..., T, F) float32.

    Equivalent to the reference's per-utterance pipeline: peak-normalize,
    torch.stft, power, log (/root/reference/packages/data_handling.py:285-301),
    as a single compiled computation. `precision`/`split_radix`/`hop_dft`:
    see stft_frames.
    """
    if peak_norm:
        x = x / jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    re, im = stft_frames(x, fs=fs, wlen_sec=wlen_sec, hop_percent=hop_percent,
                         center=center, pad_at_end=pad_at_end,
                         precision=precision, split_radix=split_radix,
                         hop_dft=hop_dft)
    return jnp.log(re * re + im * im + eps)


@functools.lru_cache(maxsize=8)
def _inverse_dft_bases(nfft: int) -> tuple[np.ndarray, np.ndarray]:
    """(n_freq, nfft) bases: time_frame = re @ Mr + im @ Mi (win applied
    separately). Hermitian-symmetric inverse real DFT (numpy irfft)."""
    f = nfft // 2 + 1
    k = np.arange(f, dtype=np.float64)[:, None]
    n = np.arange(nfft, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * n / nfft
    w = np.full((f, 1), 2.0)
    w[0] = 1.0
    w[-1] = 1.0  # nfft even
    mr = (w * np.cos(ang) / nfft).astype(np.float32)
    mi = (-(w * np.sin(ang)) / nfft).astype(np.float32)
    mi[0] = 0.0
    mi[-1] = 0.0
    return mr, mi


@functools.partial(jax.jit, static_argnames=("fs", "wlen_sec", "hop_percent",
                                             "center"))
def istft_frames(
    re: jax.Array,
    im: jax.Array,
    fs: int = 16000,
    wlen_sec: float = 64e-3,
    hop_percent: float = 0.25,
    center: bool = False,
) -> jax.Array:
    """On-device inverse STFT twin of processing.stft.istft.

    (T, F) real/imag spectra -> (n_samples,) float32 via inverse-DFT
    matmuls + windowed overlap-add with NOLA window-square normalization.
    The reference used librosa.istft for reconstruction tooling
    (/root/reference/packages/processing/stft.py:63-99); this runs the
    whole inverse on the TPU.
    """
    nfft = int(wlen_sec * fs)
    hop = int(hop_percent * nfft)
    t = re.shape[0]
    mr, mi = (jnp.asarray(b) for b in _inverse_dft_bases(nfft))
    hp = jax.lax.Precision.HIGHEST
    frames = (jnp.matmul(re, mr, precision=hp)
              + jnp.matmul(im, mi, precision=hp))  # (T, nfft)
    w = hann_window(nfft)
    wf = frames * w

    n_out = nfft + hop * (t - 1)
    idx = (np.arange(t)[:, None] * hop + np.arange(nfft)[None, :]).ravel()
    x = jnp.zeros(n_out, dtype=jnp.float32).at[jnp.asarray(idx)].add(wf.ravel())

    # static window-square normalization (depends only on shapes)
    win_sq = np.zeros(n_out, dtype=np.float64)
    win64 = hann_window(nfft).astype(np.float64)
    for f_i in range(t):
        win_sq[f_i * hop : f_i * hop + nfft] += win64 * win64
    nz = win_sq > np.finfo(np.float64).tiny
    scale = np.where(nz, 1.0 / np.maximum(win_sq, np.finfo(np.float64).tiny), 0.0)
    x = x * jnp.asarray(scale.astype(np.float32))

    if center:
        x = x[nfft // 2 : -(nfft // 2)]
    return x


def frame_energy_vad(
    x: jax.Array,
    fs: int = 16000,
    wlen_sec: float = 64e-3,
    hop_percent: float = 0.25,
    pad_at_end: bool = True,
    vad_threshold: float = 1.70,
) -> jax.Array:
    """On-device oracle VAD (jit-safe twin of processing.targets.clean_speech_VAD).

    (n_samples,) -> (n_frames,) float32.
    """
    nfft = int(wlen_sec * fs)
    hop = int(hop_percent * nfft)
    n = x.shape[-1]
    pad_end = hop if (pad_at_end and _needs_end_pad(n, fs, wlen_sec, hop_percent)) else 0
    if pad_end:
        x = jnp.pad(x, (0, pad_end))
    frames = frame_signal(x, nfft, hop)
    power = jnp.sum(frames * frames, axis=-1)
    return (power > (10.0 ** vad_threshold) * jnp.min(power)).astype(jnp.float32)
