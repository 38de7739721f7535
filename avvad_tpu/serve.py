"""Streaming VAD serving.

The reference has no inference-service layer (SURVEY §1: evaluation writes
per-utterance files to disk). This module adds a production-serving
capability the TPU design enables naturally: a stateful streaming
classifier that accepts raw PCM in arbitrary-size chunks and emits
frame-level speech probabilities with bounded latency.

Design:
- host side keeps only a sample ring (window overlap) and a running peak
  for normalization; framing is a numpy view,
- one jitted device step per fixed frame-block: windowed-DFT log-power
  frontend + dataset normalization + LSTM with carried (h, c) per layer +
  Dense + sigmoid — the recurrent state crosses chunk boundaries, so the
  output is bit-identical to offline classification of the concatenated
  stream (modulo the causal running-peak vs global-peak normalization,
  which is inherent to streaming).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import STFTConfig
from .models import AudioVAD
from .ops.stft import _dft_hop_blocks, _windowed_dft_bases, frame_signal


def _norm_stat(norm_stats: Optional[dict], key: str):
    """Dataset-normalization vector (or None) as a device array."""
    if norm_stats and norm_stats.get(key) is not None:
        return jnp.asarray(np.asarray(norm_stats[key]).reshape(-1))
    return None


def _to_wire_video(frames, dtype) -> np.ndarray:
    """Cast lip frames to the streamer's wire dtype. uint8 wire: frames
    are min-max normalized to [0, 255] by construction
    (/root/reference/packages/processing/video.py:16-20), so a rounded
    uint8 carries them at 1/4 the host->device payload of float32 — the
    dominant cost of a transfer-bound AV tick (BENCH_NOTES.md streaming
    decomposition). Quantization error <= 0.5/255 of full scale."""
    frames = np.asarray(frames)
    if dtype == np.uint8 and frames.dtype != np.uint8:
        return np.clip(np.round(frames), 0, 255).astype(np.uint8)
    return np.ascontiguousarray(frames, dtype=dtype)


def _serving_shardings(mesh, n_streams: int):
    """(stream_sharding, replicated) for a multi-stream server on a device
    mesh: streams shard over the `data` axis (ticks are embarrassingly
    parallel — every per-stream row of the batched step is independent,
    so XLA inserts no collectives), variables replicate. Scaling serving
    over chips is then the same code path as one chip."""
    if mesh is None:
        return None, None
    from jax.sharding import NamedSharding, PartitionSpec

    if "data" not in mesh.axis_names:
        raise ValueError("serving mesh needs a 'data' axis")
    n_data = mesh.shape["data"]
    if n_streams % n_data:
        raise ValueError(f"n_streams={n_streams} must be divisible by the "
                         f"mesh data axis ({n_data})")
    return (NamedSharding(mesh, PartitionSpec("data")),
            NamedSharding(mesh, PartitionSpec()))


def _put_streams(x, sharding):
    """Host array -> device, stream-sharded when a serving mesh is set.

    numpy inputs are COPIED first: on the CPU backend jnp.asarray aliases
    host memory, and the hub reuses its assemble buffers — a tick left
    in flight (tick(fetch=False), tick_pipelined) would otherwise read
    whatever the NEXT assemble wrote over them (caught as an
    order-dependent test flake; on real TPUs the H2D transfer is a true
    copy, so this only ever corrupted CPU runs). The memcpy is tens of
    µs against multi-ms ticks."""
    if isinstance(x, np.ndarray):
        x = np.array(x, copy=True)
    x = jnp.asarray(x)
    return x if sharding is None else jax.device_put(x, sharding)


def _span_feats(spans, peaks, nfft, hop, n_frames, cos_b, sin_b, eps,
                mean, std, hop_dft):
    """Streaming frontend for the SPAN wire: `spans` is (N, span) raw
    contiguous samples — the un-inflated signal of a frame block
    (span = (n_frames-1)*hop + nfft), ~nfft/hop smaller on the
    host->device link than the materialized (N, n_frames, nfft) windows
    of _log_power_feats. Default path frames on device (reshape/concat,
    ops/stft.frame_signal) then runs the identical windowed-DFT math —
    bit-exact vs the frames wire. `hop_dft` skips framing entirely: one
    K=hop DFT per hop block + exact radix assembly (ops/stft.
    _dft_hop_blocks), ~nfft/hop fewer matmul FLOPs at fp32-rounding-level
    agreement. `spans` may arrive as int16 PCM (the half-payload int16
    wire): peak normalization divides by the int-domain running peak, so
    the cast-then-divide below is bit-exact vs the float wire for
    int16-origin sources (both are the once-rounded quotient of the same
    real ratio)."""
    spans = spans.astype(jnp.float32)
    if hop_dft:
        hp = jax.lax.Precision.HIGHEST
        x = spans / jnp.maximum(peaks[..., None], 1e-12)
        re, im = _dft_hop_blocks(x, nfft, hop, n_frames, hp)
        feats = jnp.log(re * re + im * im + eps)
        if mean is not None:
            feats = (feats - mean) / (std + eps)
        return feats
    frames = frame_signal(spans, nfft, hop)  # (N, n_frames, nfft)
    return _log_power_feats(frames, peaks[..., None, None], cos_b, sin_b,
                            eps, mean, std)


def _log_power_feats(frames, peaks, cos_b, sin_b, eps, mean, std):
    """Shared streaming frontend: peak-normalized raw sample frames ->
    (optionally dataset-normalized) log-power features. `peaks` must
    broadcast against `frames`; the DFT matmuls are fp32-pinned (bf16
    truncation corrupts quiet bins — see ops/stft.py). Every streamer
    class routes through this one function so frontend changes (e.g.
    precision knobs) land in one place."""
    hp = jax.lax.Precision.HIGHEST
    x = frames / jnp.maximum(peaks, 1e-12)
    re = jnp.matmul(x, cos_b, precision=hp)
    im = jnp.matmul(x, sin_b, precision=hp)
    feats = jnp.log(re * re + im * im + eps)
    if mean is not None:
        feats = (feats - mean) / (std + eps)
    return feats


class StreamingVAD:
    """Stateful streaming frame classifier around an AudioVAD checkpoint.

    feed(pcm) -> float32 array of speech probabilities for every STFT frame
    completed by this chunk (possibly empty).
    """

    def __init__(
        self,
        model: AudioVAD,
        variables: dict,
        norm_stats: Optional[dict] = None,
        stft_cfg: STFTConfig = STFTConfig(),
        block_frames: int = 16,
        fixed_peak: Optional[float] = None,
    ):
        self.model = model
        self.variables = variables
        self.cfg = stft_cfg
        self.block_frames = block_frames
        self.fixed_peak = fixed_peak

        self._nfft = stft_cfg.nfft
        self._hop = stft_cfg.hopsamp
        cos_b, sin_b = _windowed_dft_bases(self._nfft)
        self._cos = jnp.asarray(cos_b)
        self._sin = jnp.asarray(sin_b)

        self._mean = _norm_stat(norm_stats, "audio_mean")
        self._std = _norm_stat(norm_stats, "audio_std")

        self._step = self._build_step()
        self.reset()

    # -- state ---------------------------------------------------------------

    def reset(self) -> None:
        self._buf = np.zeros(0, dtype=np.float32)
        self._frames = np.zeros((0, self._nfft), dtype=np.float32)
        self._peak = self.fixed_peak or 0.0
        h = self.model.lstm_hidden_size
        zeros = lambda: (jnp.zeros((1, h)), jnp.zeros((1, h)))  # noqa: E731
        self._carries = [zeros() for _ in range(self.model.lstm_layers)]

    # -- device step ---------------------------------------------------------

    def _build_step(self):
        model = self.model
        eps = self.cfg.eps
        cos_b, sin_b, mean, std = self._cos, self._sin, self._mean, self._std

        @jax.jit
        def step(variables, frames, peak, carries):
            # frames: (block, nfft) raw samples; normalize by running peak
            feats = _log_power_feats(frames, peak, cos_b, sin_b, eps,
                                     mean, std)[None]  # (1, block, F)
            logits, new_carries = model.apply(variables, feats, carries,
                                              method=model.streaming_head)
            return jax.nn.sigmoid(logits[0, :, 0]), new_carries

        return step

    # -- streaming API -------------------------------------------------------

    def feed(self, pcm: np.ndarray) -> np.ndarray:
        """Push a chunk of samples; returns probabilities of newly completed
        frames (in order). Call flush() at stream end for the tail."""
        pcm = np.asarray(pcm, dtype=np.float32)
        if self.fixed_peak is None and pcm.size:
            self._peak = max(self._peak, float(np.max(np.abs(pcm))))
        self._buf = np.concatenate([self._buf, pcm])

        # cut completed windows out of the sample buffer
        n_new = 1 + (len(self._buf) - self._nfft) // self._hop \
            if len(self._buf) >= self._nfft else 0
        if n_new > 0:
            idx = (np.arange(n_new)[:, None] * self._hop
                   + np.arange(self._nfft)[None, :])
            self._frames = np.concatenate([self._frames, self._buf[idx]])
            self._buf = self._buf[n_new * self._hop:]

        # run full blocks through the device step
        outs = []
        while len(self._frames) >= self.block_frames:
            block = jnp.asarray(self._frames[: self.block_frames])
            self._frames = self._frames[self.block_frames:]
            probs, self._carries = self._step(
                self.variables, block, jnp.float32(self._peak), self._carries)
            outs.append(np.asarray(probs))
        return np.concatenate(outs) if outs else np.zeros(0, dtype=np.float32)

    def flush(self) -> np.ndarray:
        """Classify remaining frames (zero-padding the final block)."""
        n = len(self._frames)
        if n == 0:
            return np.zeros(0, dtype=np.float32)
        pad = self.block_frames - n
        block = np.concatenate(
            [self._frames, np.zeros((pad, self._nfft), np.float32)])
        self._frames = self._frames[:0]
        probs, self._carries = self._step(
            self.variables, jnp.asarray(block), jnp.float32(self._peak),
            self._carries)
        return np.asarray(probs)[:n]


class _MultiStreamBase:
    """State shared by every multi-stream server: mesh placement of the
    variables, stream-sharded LSTM carries, per-row carry recycling, and
    the per-tick carry masking that keeps inactive (padded) streams'
    recurrent state untouched."""

    def _init_streams(self, model, variables: dict, n_streams: int,
                      block_frames: int, max_backlog_blocks: int, mesh):
        self.model = model
        # mesh: shard the tick over the mesh's `data` axis (streams are
        # independent rows — no collectives); variables replicate
        self._stream_sharding, repl = _serving_shardings(mesh, n_streams)
        if repl is not None:
            variables = jax.device_put(variables, repl)
        self.variables = variables
        self.n = n_streams
        self.block_frames = block_frames
        self.max_backlog_blocks = max_backlog_blocks

    def _zero_carries(self) -> list:
        h = self.model.lstm_hidden_size
        sh = self._stream_sharding
        return [(_put_streams(jnp.zeros((self.n, h)), sh),
                 _put_streams(jnp.zeros((self.n, h)), sh))
                for _ in range(self.model.lstm_layers)]

    def _clear_carry_row(self, stream_idx: int) -> None:
        self._carries = [
            (h.at[stream_idx].set(0.0), c.at[stream_idx].set(0.0))
            for h, c in self._carries
        ]

    @staticmethod
    def _mask_carries(active, new_carries, carries):
        """Restore carries of inactive (padded) streams after a step."""
        a = active[:, None]
        return [(a * hn + (1 - a) * ho, a * cn + (1 - a) * co)
                for (hn, cn), (ho, co) in zip(new_carries, carries)]

    def _finish_tick(self, probs, active, fetch):
        """Tail shared by every tick(): stash the raw (device probs,
        active) pair for the pipelined path, then return per-stream
        results. fetch=None is the raw mode tick_pipelined uses — no
        per-row slicing (each row slice is its own tiny device dispatch,
        needless when the caller only wants the stashed pair). `active`
        is copied: the hub reuses its assemble buffers, so the stashed
        mask would otherwise be zeroed in place by the NEXT tick."""
        self._raw_tick = (probs, np.array(active, copy=True))
        if fetch is None:
            return True
        if fetch:
            probs = np.asarray(probs)
        return {i: probs[i] for i in range(self.n) if active[i]}

    def _fetch_pending(self, prev) -> dict:
        if prev is None:
            return {}
        probs = np.asarray(prev[0])
        active = prev[1]
        return {i: probs[i] for i in range(self.n) if active[i]}

    def tick_pipelined(self) -> dict:
        """Two-deep pipelined tick: dispatch THIS tick asynchronously and
        return the PREVIOUS tick's (by now computed) probabilities.

        Keeps two ticks in flight: while the device runs tick N, the host
        assembles + uploads tick N+1's blocks and downloads tick N-1's
        results, so per-tick wall time approaches max(compute, transfer)
        instead of their sum — at the cost of exactly one block
        (block_frames/62.5 s) of extra result latency. The bounded
        counterpart of tick(fetch=False), which defers synchronization
        indefinitely. Returns {} for the first tick (nothing pending yet);
        call flush_pipelined() after the last tick to drain the tail.
        reset_stream(i) scrubs stream i from the pending tick and reset()
        drops it entirely — pre-reset results are never delivered to a
        recycled slot."""
        prev = getattr(self, "_pending_tick", None)
        if prev is not None:
            # start the D2H of the pending results BEFORE dispatching this
            # tick: the executor runs programs in order, so a copy enqueued
            # after the new dispatch would wait for the NEW compute too —
            # exactly the serialization this method exists to avoid
            prev[0].copy_to_host_async()
        self._raw_tick = None
        out = self.tick(fetch=None)
        self._pending_tick = self._raw_tick if out else None
        return self._fetch_pending(prev)

    def flush_pipelined(self) -> dict:
        """Fetch the pending pipelined tick (if any) without dispatching."""
        prev = getattr(self, "_pending_tick", None)
        self._pending_tick = None
        return self._fetch_pending(prev)

    def pending_streams(self) -> set:
        """Stream indices with results still in flight from the last
        tick_pipelined (so a server knows not to drop a draining
        connection whose final block's output has not been fetched yet)."""
        prev = getattr(self, "_pending_tick", None)
        if prev is None:
            return set()
        active = prev[1]
        return {i for i in range(self.n) if active[i]}

    def cancel_pending(self, stream_idx: int) -> None:
        """Scrub one stream from the pending pipelined tick. A recycled
        slot (reset_stream) must not deliver its in-flight result: the
        probabilities predate the reset, and a server that reassigns the
        slot before the next tick_pipelined fetch would otherwise send
        the OLD stream's output to the NEW connection (cross-client data
        delivery). The stashed `active` mask is a private copy
        (_finish_tick copies it), so zeroing in place is safe."""
        prev = getattr(self, "_pending_tick", None)
        if prev is not None:
            prev[1][stream_idx] = 0.0

    def _cancel_all_pending(self) -> None:
        """Whole-streamer reset: drop any in-flight pipelined tick
        entirely (its results predate the reset). flush_pipelined keeps
        its drain semantics for orderly end-of-stream shutdown."""
        self._pending_tick = None


class MultiStreamVAD(_MultiStreamBase):
    """N concurrent independent audio streams through ONE jitted step.

    The production server-tick shape: each call to tick() advances every
    stream that has a full frame block ready; streams without enough
    buffered frames are padded and their LSTM carries are mask-restored, so
    per-stream results are bit-identical to running each stream alone.
    Batching the recurrence across streams fills MXU rows that a single
    stream leaves idle.
    """

    def __init__(self, model: AudioVAD, variables: dict, n_streams: int,
                 norm_stats: Optional[dict] = None,
                 stft_cfg: STFTConfig = STFTConfig(),
                 block_frames: int = 16,
                 native: bool = True,
                 max_backlog_blocks: int = 32,
                 mesh=None,
                 step_override=None,
                 span_wire: bool = False,
                 hop_dft: bool = False,
                 audio_int16: bool = False):
        # step_override: replace the jitted model tick with an external
        # step of the same signature — e.g. a loaded serving-artifact
        # entry (export.load_multistream_server); `model` then only needs
        # lstm_hidden_size/lstm_layers attributes and `variables` may be {}
        # span_wire: ship each tick's raw (N, (bf-1)*hop + nfft) sample
        # span instead of materialized (N, bf, nfft) windows (~nfft/hop
        # smaller host->device payload; framing moves on-device,
        # bit-exact). hop_dft (requires span_wire): hop-block DFT frontend
        # on the span — no framing at all, ~nfft/hop fewer matmul FLOPs.
        # audio_int16 (requires span_wire): buffer and ship raw int16 PCM
        # — half the float span payload, bit-exact for 16-bit sources
        # (peak normalization divides by the int-domain peak on device;
        # see _span_feats). feed() then takes np.int16 samples.
        if hop_dft and not span_wire:
            raise ValueError("hop_dft frontend requires span_wire=True "
                             "(it consumes the contiguous sample span)")
        if audio_int16 and not span_wire:
            raise ValueError("audio_int16 requires span_wire=True (the "
                             "frames wire is float32-only)")
        self.span_wire = span_wire
        self.hop_dft = hop_dft
        self.audio_int16 = audio_int16
        self._adtype = np.int16 if audio_int16 else np.float32
        self._init_streams(model, variables, n_streams, block_frames,
                           max_backlog_blocks, mesh)
        self.cfg = stft_cfg
        self._nfft = stft_cfg.nfft
        self._hop = stft_cfg.hopsamp
        # sample buffering + per-tick block assembly live in the native hub
        # (C++, one call per tick); force_python gives a numpy drop-in
        from .native import StreamHub

        self._hub = StreamHub(n_streams, self._nfft, self._hop, block_frames,
                              force_python=not native, dtype=self._adtype)
        cos_b, sin_b = _windowed_dft_bases(self._nfft)
        self._cos, self._sin = jnp.asarray(cos_b), jnp.asarray(sin_b)
        self._mean = _norm_stat(norm_stats, "audio_mean")
        self._std = _norm_stat(norm_stats, "audio_std")
        self._step = (step_override if step_override is not None
                      else self._build_step())
        self.reset()

    def reset(self) -> None:
        self._hub.reset()
        self._carries = self._zero_carries()
        self._cancel_all_pending()

    def _build_step(self):
        model = self.model
        eps = self.cfg.eps
        cos_b, sin_b, mean, std = self._cos, self._sin, self._mean, self._std
        mask_carries = self._mask_carries
        nfft, hop, bf = self._nfft, self._hop, self.block_frames
        span_wire, hop_dft = self.span_wire, self.hop_dft

        @jax.jit
        def step(variables, frames, peaks, active, carries):
            # frames (N, block, nfft) — or the raw (N, span) sample span
            # on the span wire; peaks (N,); active (N,) float
            if span_wire:
                feats = _span_feats(frames, peaks, nfft, hop, bf, cos_b,
                                    sin_b, eps, mean, std, hop_dft)
            else:
                feats = _log_power_feats(frames, peaks[:, None, None],
                                         cos_b, sin_b, eps, mean, std)
            logits, new_carries = model.apply(variables, feats, carries,
                                              method=model.streaming_head)
            masked = mask_carries(active, new_carries, carries)
            return jax.nn.sigmoid(logits[..., 0]), masked

        return step

    def warmup(self) -> None:
        """Compile the tick step before serving traffic (first compile on a
        remote-compile backend can take minutes; a cold server would stall
        its first tick and back-pressure clients). State is untouched:
        the step runs on zero inputs with active=0, so every stream's
        carries are mask-restored."""
        sh = self._stream_sharding
        shape = ((self.n, self._hub.span) if self.span_wire
                 else (self.n, self.block_frames, self._nfft))
        frames = _put_streams(jnp.zeros(shape, dtype=self._adtype), sh)
        probs, _ = self._step(self.variables, frames,
                              _put_streams(jnp.ones(self.n), sh),
                              _put_streams(jnp.zeros(self.n), sh),
                              self._carries)
        jax.block_until_ready(probs)

    def feed(self, stream_idx: int, pcm: np.ndarray) -> None:
        """Buffer samples for one stream (no compute). With audio_int16
        `pcm` must be np.int16 (the hub rejects implicit float casts).
        Raises ValueError when the stream's backlog exceeds
        max_backlog_blocks — a client pushing far ahead of real time must
        not grow server memory without bound (a tick consumes one block
        per stream, so the cap is the drain rate times an ~8 s grace
        window at the default 16x16 ms)."""
        cap = self.max_backlog_blocks * self.block_frames
        # enforce on the POST-feed count (hub.feed returns it): checking
        # only the pre-feed state would let a single large message
        # overshoot the bound by its full size. On the raise the
        # offending samples are still buffered — the serving front drops
        # the connection, and reset_stream reclaims the slot.
        pcm = (np.asarray(pcm) if self.audio_int16
               else np.asarray(pcm, dtype=np.float32))
        if self._hub.feed(stream_idx, pcm) > cap:
            raise ValueError(
                f"stream {stream_idx} audio backlog exceeds "
                f"{self.max_backlog_blocks} blocks")

    def has_full_block(self, stream_idx: int) -> bool:
        """True when the stream could produce output on the next tick
        (used by the server to drain half-closed connections)."""
        return self._hub.frames_ready(stream_idx) >= self.block_frames

    def reset_stream(self, stream_idx: int) -> None:
        """Recycle one stream slot: clear its buffer/peak and zero its LSTM
        carries (other streams are untouched)."""
        self._hub.reset_stream(stream_idx)
        self._clear_carry_row(stream_idx)
        self.cancel_pending(stream_idx)

    def tick(self, fetch: bool = True) -> dict:
        """Advance every stream with >= block_frames buffered; returns
        {stream_idx: probs} for the streams that produced output.

        `fetch=False` returns device arrays without synchronizing — the
        device pipeline stays full across ticks (fetching each tick costs
        ~29 ms of dead sync time on this backend); convert results with
        np.asarray whenever convenient."""
        blocks, peaks, active, n_active = \
            self._hub.assemble(span=self.span_wire)
        if n_active == 0:
            return {}
        sh = self._stream_sharding
        probs, self._carries = self._step(
            self.variables, _put_streams(blocks, sh),
            _put_streams(peaks, sh), _put_streams(active, sh),
            self._carries)
        return self._finish_tick(probs, active, fetch)


class StreamingAVVAD:
    """Stateful streaming audio-visual classifier around an AVVAD checkpoint.

    feed(pcm, video_frames) accepts raw PCM samples and STFT-rate-aligned
    (62.5 fps) lip frames (T, 67, 67); both buffer independently and a
    device step fires whenever `block_frames` of BOTH modalities are ready.
    The fusion + 2x1024 LSTM state carries across blocks. For 30 fps
    camera input, re-time frames with processing.video.fps_resample_indices
    before feeding.
    """

    def __init__(self, model, variables: dict,
                 norm_stats: Optional[dict] = None,
                 stft_cfg: STFTConfig = STFTConfig(),
                 block_frames: int = 16,
                 fixed_peak: Optional[float] = None,
                 video_uint8: bool = False):
        self.model = model
        self.variables = variables
        self.cfg = stft_cfg
        self.block_frames = block_frames
        self.fixed_peak = fixed_peak
        self.video_uint8 = video_uint8
        self._vdtype = np.uint8 if video_uint8 else np.float32

        self._nfft = stft_cfg.nfft
        self._hop = stft_cfg.hopsamp
        cos_b, sin_b = _windowed_dft_bases(self._nfft)
        self._cos, self._sin = jnp.asarray(cos_b), jnp.asarray(sin_b)

        self._a_mean = _norm_stat(norm_stats, "audio_mean")
        self._a_std = _norm_stat(norm_stats, "audio_std")
        self._v_mean = _norm_stat(norm_stats, "video_mean")
        self._v_std = _norm_stat(norm_stats, "video_std")

        self._step = self._build_step()
        self.reset()

    def reset(self) -> None:
        self._buf = np.zeros(0, dtype=np.float32)
        self._frames = np.zeros((0, self._nfft), dtype=np.float32)
        self._vframes = np.zeros((0, 67, 67), dtype=self._vdtype)
        self._peak = self.fixed_peak or 0.0
        h = self.model.lstm_hidden_size
        self._carries = [(jnp.zeros((1, h)), jnp.zeros((1, h)))
                         for _ in range(self.model.lstm_layers)]

    def _build_step(self):
        model = self.model
        eps = self.cfg.eps
        cos_b, sin_b = self._cos, self._sin
        a_mean, a_std = self._a_mean, self._a_std
        v_mean, v_std = self._v_mean, self._v_std

        @jax.jit
        def step(variables, frames, video, peak, carries):
            feats = _log_power_feats(frames, peak, cos_b, sin_b, eps,
                                     a_mean, a_std)[None]
            # uint8 wire: dequantize on device (the transfer stays 1/4 size)
            v = video.astype(jnp.float32)[None]
            if v_mean is not None:
                v = (v - v_mean) / (v_std + eps)
            logits, new_carries = model.apply(
                variables, feats, v, carries, method=model.streaming_head)
            return jax.nn.sigmoid(logits[0, :, 0]), new_carries

        return step

    def feed(self, pcm: np.ndarray, video_frames: np.ndarray) -> np.ndarray:
        """Push synchronized chunks; returns probs of completed frames."""
        pcm = np.asarray(pcm, dtype=np.float32)
        if self.fixed_peak is None and pcm.size:
            self._peak = max(self._peak, float(np.max(np.abs(pcm))))
        self._buf = np.concatenate([self._buf, pcm])
        if len(video_frames):
            self._vframes = np.concatenate(
                [self._vframes, _to_wire_video(video_frames, self._vdtype)])

        n_new = 1 + (len(self._buf) - self._nfft) // self._hop \
            if len(self._buf) >= self._nfft else 0
        if n_new > 0:
            idx = (np.arange(n_new)[:, None] * self._hop
                   + np.arange(self._nfft)[None, :])
            self._frames = np.concatenate([self._frames, self._buf[idx]])
            self._buf = self._buf[n_new * self._hop:]

        outs = []
        while (len(self._frames) >= self.block_frames
               and len(self._vframes) >= self.block_frames):
            fb = jnp.asarray(self._frames[: self.block_frames])
            vb = jnp.asarray(self._vframes[: self.block_frames])
            self._frames = self._frames[self.block_frames:]
            self._vframes = self._vframes[self.block_frames:]
            probs, self._carries = self._step(
                self.variables, fb, vb, jnp.float32(self._peak), self._carries)
            outs.append(np.asarray(probs))
        return np.concatenate(outs) if outs else np.zeros(0, dtype=np.float32)

    def flush(self) -> np.ndarray:
        n = min(len(self._frames), len(self._vframes))
        if n == 0:
            return np.zeros(0, dtype=np.float32)
        pad = self.block_frames - n
        fb = np.concatenate([self._frames[:n],
                             np.zeros((pad, self._nfft), np.float32)])
        vb = np.concatenate([self._vframes[:n],
                             np.zeros((pad, 67, 67), self._vdtype)])
        self._frames = self._frames[:0]
        self._vframes = self._vframes[:0]
        probs, self._carries = self._step(
            self.variables, jnp.asarray(fb), jnp.asarray(vb),
            jnp.float32(self._peak), self._carries)
        return np.asarray(probs)[:n]


class _CameraRateVideoMixin:
    """Camera-rate video ingestion shared by the AV and video-only
    multi-stream servers: per-stream resample phase over the exact ffmpeg
    duplication schedule (processing.video.fps_block_schedule). Each tick
    ships only the block's unique source frames (N, src_max, 67, 67) plus
    per-stream gather indices (N, bf); tower features gather onto the
    62.5 fps label timeline on device — bit-identical to feeding
    pre-upsampled frames at ~rate_out/rate_in x less payload + tower
    compute."""

    def _init_camera_video(self, video_fps: Optional[float], out_fps: float,
                           n_streams: int, block_frames: int, vdtype) -> None:
        self.video_fps = video_fps
        if not video_fps:
            self._vout = np.zeros((n_streams, block_frames, 67, 67), vdtype)
            return
        from .processing.video import fps_block_src_max

        self._out_fps = out_fps
        if video_fps > out_fps:
            raise ValueError(
                f"video_fps {video_fps} exceeds the {out_fps} fps label "
                "timeline (the schedule only duplicates frames)")
        self._vsrc_max = fps_block_src_max(block_frames, video_fps, out_fps)
        self._vout = np.zeros((n_streams, self._vsrc_max, 67, 67), vdtype)
        self._vidx = np.zeros((n_streams, block_frames), np.int32)

    def _camera_reset(self) -> None:
        if self.video_fps:
            # per-stream resample phase: next output-frame index, and the
            # absolute source index of _vbufs[i][0]
            self._vpos = np.zeros(self.n, np.int64)
            self._vbase = np.zeros(self.n, np.int64)

    def _camera_reset_stream(self, stream_idx: int) -> None:
        if self.video_fps:
            self._vpos[stream_idx] = 0
            self._vbase[stream_idx] = 0

    def _video_cap(self, cap_blocks_frames: int) -> int:
        """Backlog cap in buffered frames; counts SOURCE frames in
        camera-rate mode."""
        if not self.video_fps:
            return cap_blocks_frames
        return int(np.ceil(cap_blocks_frames * self.video_fps
                           / self._out_fps)) + self._vsrc_max

    def _video_block_need(self, stream_idx: int):
        """Camera-rate mode: (src_lo, rel_idx) for this stream's pending
        block, from its resample phase."""
        from .processing.video import fps_block_schedule

        return fps_block_schedule(int(self._vpos[stream_idx]),
                                  self.block_frames, self.video_fps,
                                  self._out_fps)

    def _video_ready(self, stream_idx: int) -> bool:
        if not self.video_fps:
            return len(self._vbufs[stream_idx]) >= self.block_frames
        lo, rel = self._video_block_need(stream_idx)
        need = lo - int(self._vbase[stream_idx]) + int(rel[-1]) + 1
        return len(self._vbufs[stream_idx]) >= need

    def _consume_video(self, i: int) -> None:
        """Move one block of video for stream i into the device-bound
        buffers and advance its state."""
        bf = self.block_frames
        if not self.video_fps:
            self._vout[i] = self._vbufs[i][:bf]
            self._vbufs[i] = self._vbufs[i][bf:]
            return
        lo, rel = self._video_block_need(i)
        off = lo - int(self._vbase[i])
        cnt = int(rel[-1]) + 1
        self._vout[i, :cnt] = self._vbufs[i][off:off + cnt]
        self._vidx[i] = rel
        # advance phase; keep source frames the NEXT block still needs
        # (a source frame can straddle the block boundary)
        self._vpos[i] += bf
        next_lo, _ = self._video_block_need(i)
        drop = next_lo - int(self._vbase[i])
        self._vbufs[i] = self._vbufs[i][drop:]
        self._vbase[i] = next_lo


class MultiStreamAVVAD(_MultiStreamBase, _CameraRateVideoMixin):
    """N concurrent independent AUDIO-VISUAL streams through ONE jitted
    step (the AV counterpart of MultiStreamVAD).

    Per stream, raw PCM and STFT-rate-aligned (62.5 fps) lip frames buffer
    independently; a tick() advances every stream that has a full
    `block_frames` block of BOTH modalities ready (the audio hub's gated
    assemble holds back streams whose video lags, keeping their samples
    buffered). Padded/inactive streams have their fusion-LSTM carries
    mask-restored, so per-stream results are bit-identical to running each
    stream alone through StreamingAVVAD. For camera input at its native
    rate, pass `video_fps` (e.g. 30.0): frames then feed at the source
    rate, the tower runs on each block's unique frames only, and features
    are gathered onto the 62.5 fps timeline on device — bit-identical to
    pre-upsampled feeding at ~2.08x less video payload and tower compute.
    """

    def __init__(self, model, variables: dict, n_streams: int,
                 norm_stats: Optional[dict] = None,
                 stft_cfg: STFTConfig = STFTConfig(),
                 block_frames: int = 16,
                 native: bool = True,
                 max_backlog_blocks: int = 32,
                 video_uint8: bool = False,
                 mesh=None,
                 step_override=None,
                 span_wire: bool = False,
                 hop_dft: bool = False,
                 video_fps: Optional[float] = None,
                 audio_int16: bool = False):
        # step_override: see MultiStreamVAD (artifact-driven serving)
        # span_wire / hop_dft / audio_int16: see MultiStreamVAD (raw
        # sample span on the audio wire; hop-block DFT frontend on the
        # span; half-payload int16 PCM span, bit-exact for 16-bit sources)
        # video_fps: CAMERA-RATE video ingestion — feed() then takes lip
        # frames at this source rate (e.g. the camera's native 30 fps);
        # each tick ships only the block's unique source frames plus a
        # per-stream gather schedule, the tower runs on the uniques, and
        # features are gathered onto the 62.5 fps audio timeline on
        # device. Bit-identical to feeding pre-upsampled frames (the
        # 62.5 fps timeline is frame DUPLICATION — fps_block_schedule),
        # at ~rate_out/rate_in x less video payload AND tower compute.
        if hop_dft and not span_wire:
            raise ValueError("hop_dft frontend requires span_wire=True "
                             "(it consumes the contiguous sample span)")
        if audio_int16 and not span_wire:
            raise ValueError("audio_int16 requires span_wire=True (the "
                             "frames wire is float32-only)")
        self.span_wire = span_wire
        self.hop_dft = hop_dft
        self.audio_int16 = audio_int16
        self._adtype = np.int16 if audio_int16 else np.float32
        self._init_streams(model, variables, n_streams, block_frames,
                           max_backlog_blocks, mesh)
        self.cfg = stft_cfg
        self.video_uint8 = video_uint8
        self._vdtype = np.uint8 if video_uint8 else np.float32
        self._nfft = stft_cfg.nfft
        self._hop = stft_cfg.hopsamp
        from .native import StreamHub

        self._hub = StreamHub(n_streams, self._nfft, self._hop, block_frames,
                              force_python=not native, dtype=self._adtype)
        cos_b, sin_b = _windowed_dft_bases(self._nfft)
        self._cos, self._sin = jnp.asarray(cos_b), jnp.asarray(sin_b)

        self._a_mean = _norm_stat(norm_stats, "audio_mean")
        self._a_std = _norm_stat(norm_stats, "audio_std")
        self._v_mean = _norm_stat(norm_stats, "video_mean")
        self._v_std = _norm_stat(norm_stats, "video_std")
        self._init_camera_video(video_fps, stft_cfg.fs / stft_cfg.hopsamp,
                                n_streams, block_frames, self._vdtype)
        self._step = (step_override if step_override is not None
                      else self._build_step())
        self.reset()

    def reset(self) -> None:
        self._hub.reset()
        self._vbufs = [np.zeros((0, 67, 67), self._vdtype)
                       for _ in range(self.n)]
        self._camera_reset()
        self._carries = self._zero_carries()
        self._cancel_all_pending()

    def _build_step(self):
        model = self.model
        eps = self.cfg.eps
        cos_b, sin_b = self._cos, self._sin
        a_mean, a_std = self._a_mean, self._a_std
        v_mean, v_std = self._v_mean, self._v_std
        mask_carries = self._mask_carries
        nfft, hop, bf = self._nfft, self._hop, self.block_frames
        span_wire, hop_dft = self.span_wire, self.hop_dft
        camera_rate = bool(self.video_fps)

        def _model_tick(variables, frames, video, peaks, active, carries,
                        vidx=None):
            # frames (N, bf, nfft) — or the raw (N, span) sample span on
            # the span wire; video (N, bf, 67, 67) — or the block's
            # unique (N, src_max, 67, 67) camera-rate frames with their
            # per-stream gather schedule vidx (N, bf); peaks/active (N,)
            if span_wire:
                feats = _span_feats(frames, peaks, nfft, hop, bf, cos_b,
                                    sin_b, eps, a_mean, a_std, hop_dft)
            else:
                feats = _log_power_feats(frames, peaks[:, None, None],
                                         cos_b, sin_b, eps, a_mean, a_std)
            # uint8 wire: dequantize on device (the transfer stays 1/4 size)
            v = video.astype(jnp.float32)
            if v_mean is not None:
                v = (v - v_mean) / (v_std + eps)
            logits, new_carries = model.apply(
                variables, feats, v, carries, per_stream_norm=True,
                video_frame_indices=vidx,
                method=model.streaming_head)
            masked = mask_carries(active, new_carries, carries)
            return jax.nn.sigmoid(logits[..., 0]), masked

        if camera_rate:
            @jax.jit
            def step(variables, frames, video, vidx, peaks, active, carries):
                return _model_tick(variables, frames, video, peaks, active,
                                   carries, vidx=vidx)
        else:
            @jax.jit
            def step(variables, frames, video, peaks, active, carries):
                return _model_tick(variables, frames, video, peaks, active,
                                   carries)

        return step

    def warmup(self) -> None:
        """Compile the tick step before serving traffic (see
        MultiStreamVAD.warmup). State is untouched (active=0)."""
        sh = self._stream_sharding
        shape = ((self.n, self._hub.span) if self.span_wire
                 else (self.n, self.block_frames, self._nfft))
        frames = _put_streams(jnp.zeros(shape, dtype=self._adtype), sh)
        video = _put_streams(
            jnp.zeros(self._vout.shape, dtype=self._vdtype), sh)
        extra = ((_put_streams(jnp.zeros_like(jnp.asarray(self._vidx)), sh),)
                 if self.video_fps else ())
        probs, _ = self._step(self.variables, frames, video, *extra,
                              _put_streams(jnp.ones(self.n), sh),
                              _put_streams(jnp.zeros(self.n), sh),
                              self._carries)
        jax.block_until_ready(probs)

    def feed(self, stream_idx: int, pcm: Optional[np.ndarray] = None,
             video_frames: Optional[np.ndarray] = None) -> None:
        """Buffer samples and/or lip frames for one stream (no compute).

        Raises ValueError when either modality's backlog exceeds
        max_backlog_blocks. The gated assemble holds audio in the hub
        while video lags (and vice versa), so a client streaming one
        modality much faster than the other — or one modality only —
        would otherwise grow server memory without limit; per-message
        size caps (server._MAX_MSG_BYTES) cannot see cross-message
        accumulation."""
        cap = self.max_backlog_blocks * self.block_frames
        if pcm is not None and len(pcm):
            # post-feed enforcement (see MultiStreamVAD.feed): a single
            # large message must not overshoot the bound by its size
            pcm = (np.asarray(pcm) if self.audio_int16
                   else np.asarray(pcm, dtype=np.float32))
            if self._hub.feed(stream_idx, pcm) > cap:
                raise ValueError(
                    f"stream {stream_idx} audio backlog exceeds "
                    f"{self.max_backlog_blocks} blocks")
        if video_frames is not None and len(video_frames):
            if len(self._vbufs[stream_idx]) + len(video_frames) \
                    > self._video_cap(cap):
                raise ValueError(
                    f"stream {stream_idx} video backlog exceeds "
                    f"{self.max_backlog_blocks} blocks")
            self._vbufs[stream_idx] = np.concatenate(
                [self._vbufs[stream_idx],
                 _to_wire_video(video_frames, self._vdtype)])

    def has_full_block(self, stream_idx: int) -> bool:
        """True when the stream could produce output on the next tick
        (both modalities have a full block buffered)."""
        return (self._hub.frames_ready(stream_idx) >= self.block_frames
                and self._video_ready(stream_idx))

    def reset_stream(self, stream_idx: int) -> None:
        """Recycle one stream slot (buffers, peak, LSTM carries)."""
        self._hub.reset_stream(stream_idx)
        self._vbufs[stream_idx] = np.zeros((0, 67, 67), self._vdtype)
        self._camera_reset_stream(stream_idx)
        self._clear_carry_row(stream_idx)
        self.cancel_pending(stream_idx)

    def tick(self, fetch: bool = True) -> dict:
        """Advance every stream with a full audio AND video block; returns
        {stream_idx: probs} for streams that produced output. `fetch=False`
        returns device arrays without synchronizing (see MultiStreamVAD)."""
        gate = np.fromiter((1.0 if self._video_ready(i) else 0.0
                            for i in range(self.n)), np.float32, self.n)
        blocks, peaks, active, n_active = \
            self._hub.assemble(gate=gate, span=self.span_wire)
        if n_active == 0:
            return {}
        for i in range(self.n):
            if active[i]:
                self._consume_video(i)
        sh = self._stream_sharding
        extra = ((_put_streams(jnp.asarray(self._vidx), sh),)
                 if self.video_fps else ())
        probs, self._carries = self._step(
            self.variables, _put_streams(blocks, sh),
            _put_streams(self._vout, sh), *extra, _put_streams(peaks, sh),
            _put_streams(active, sh), self._carries)
        return self._finish_tick(probs, active, fetch)


class StreamingVideoVAD:
    """Stateful streaming video-only classifier around a VideoVAD
    checkpoint: completes the serving matrix (audio / video / AV) for the
    reference's three model families.

    feed(video_frames) accepts label-rate-aligned (62.5 fps) lip frames
    (T, 67, 67); a device step fires per `block_frames`. The tower is
    frame-local, so the only carried state is the LSTM. For 30 fps camera
    input, re-time frames with processing.video.fps_resample_indices
    before feeding.
    """

    def __init__(self, model, variables: dict,
                 norm_stats: Optional[dict] = None,
                 block_frames: int = 16,
                 video_uint8: bool = False):
        self.model = model
        self.variables = variables
        self.block_frames = block_frames
        self.video_uint8 = video_uint8
        self._vdtype = np.uint8 if video_uint8 else np.float32
        self._v_mean = _norm_stat(norm_stats, "video_mean")
        self._v_std = _norm_stat(norm_stats, "video_std")
        self._eps = STFTConfig().eps
        self._step = self._build_step()
        self.reset()

    def reset(self) -> None:
        self._vframes = np.zeros((0, 67, 67), dtype=self._vdtype)
        h = self.model.lstm_hidden_size
        self._carries = [(jnp.zeros((1, h)), jnp.zeros((1, h)))
                         for _ in range(self.model.lstm_layers)]

    def _build_step(self):
        model = self.model
        v_mean, v_std, eps = self._v_mean, self._v_std, self._eps

        @jax.jit
        def step(variables, video, carries):
            v = video.astype(jnp.float32)[None]
            if v_mean is not None:
                v = (v - v_mean) / (v_std + eps)
            logits, new_carries = model.apply(
                variables, v, carries, method=model.streaming_head)
            return jax.nn.sigmoid(logits[0, :, 0]), new_carries

        return step

    def feed(self, video_frames: np.ndarray) -> np.ndarray:
        """Push lip frames; returns probs of completed blocks."""
        if len(video_frames):
            self._vframes = np.concatenate(
                [self._vframes, _to_wire_video(video_frames, self._vdtype)])
        outs = []
        while len(self._vframes) >= self.block_frames:
            vb = jnp.asarray(self._vframes[: self.block_frames])
            self._vframes = self._vframes[self.block_frames:]
            probs, self._carries = self._step(self.variables, vb,
                                              self._carries)
            outs.append(np.asarray(probs))
        return np.concatenate(outs) if outs else np.zeros(0, dtype=np.float32)

    def flush(self) -> np.ndarray:
        n = len(self._vframes)
        if n == 0:
            return np.zeros(0, dtype=np.float32)
        vb = np.concatenate([self._vframes,
                             np.zeros((self.block_frames - n, 67, 67),
                                      self._vdtype)])
        self._vframes = self._vframes[:0]
        probs, self._carries = self._step(self.variables, jnp.asarray(vb),
                                          self._carries)
        return np.asarray(probs)[:n]


class MultiStreamVideoVAD(_MultiStreamBase, _CameraRateVideoMixin):
    """N concurrent video-only streams through one jitted tick (the
    video twin of MultiStreamVAD; wire-compatible with the AV framed
    protocol restricted to V/U messages). Masked carries keep batched
    streams equal to solo StreamingVideoVAD runs. `video_fps` enables
    camera-rate ingestion (see _CameraRateVideoMixin) — the biggest win
    here, since the tower is the whole video-only model cost."""

    def __init__(self, model, variables: dict, n_streams: int,
                 norm_stats: Optional[dict] = None,
                 block_frames: int = 16,
                 max_backlog_blocks: int = 32,
                 video_uint8: bool = False,
                 mesh=None,
                 step_override=None,
                 video_fps: Optional[float] = None):
        # step_override: see MultiStreamVAD (artifact-driven serving)
        self._init_streams(model, variables, n_streams, block_frames,
                           max_backlog_blocks, mesh)
        self.video_uint8 = video_uint8
        self._vdtype = np.uint8 if video_uint8 else np.float32
        self._v_mean = _norm_stat(norm_stats, "video_mean")
        self._v_std = _norm_stat(norm_stats, "video_std")
        cfg = STFTConfig()
        self._eps = cfg.eps
        self._init_camera_video(video_fps, cfg.fs / cfg.hopsamp,
                                n_streams, block_frames, self._vdtype)
        self._step = (step_override if step_override is not None
                      else self._build_step())
        self.reset()

    def reset(self) -> None:
        self._vbufs = [np.zeros((0, 67, 67), self._vdtype)
                       for _ in range(self.n)]
        self._camera_reset()
        self._carries = self._zero_carries()
        self._cancel_all_pending()

    def _build_step(self):
        model = self.model
        v_mean, v_std, eps = self._v_mean, self._v_std, self._eps
        mask_carries = self._mask_carries

        def _model_tick(variables, video, active, carries, vidx=None):
            v = video.astype(jnp.float32)
            if v_mean is not None:
                v = (v - v_mean) / (v_std + eps)
            logits, new_carries = model.apply(
                variables, v, carries, video_frame_indices=vidx,
                method=model.streaming_head)
            masked = mask_carries(active, new_carries, carries)
            return jax.nn.sigmoid(logits[..., 0]), masked

        if self.video_fps:
            @jax.jit
            def step(variables, video, vidx, active, carries):
                return _model_tick(variables, video, active, carries,
                                   vidx=vidx)
        else:
            @jax.jit
            def step(variables, video, active, carries):
                return _model_tick(variables, video, active, carries)

        return step

    def warmup(self) -> None:
        """Compile the tick step before serving traffic (see
        MultiStreamVAD.warmup). State is untouched (active=0)."""
        sh = self._stream_sharding
        video = _put_streams(
            jnp.zeros(self._vout.shape, dtype=self._vdtype), sh)
        extra = ((_put_streams(jnp.zeros_like(jnp.asarray(self._vidx)), sh),)
                 if self.video_fps else ())
        probs, _ = self._step(self.variables, video, *extra,
                              _put_streams(jnp.zeros(self.n), sh),
                              self._carries)
        jax.block_until_ready(probs)

    def feed(self, stream_idx: int, pcm: Optional[np.ndarray] = None,
             video_frames: Optional[np.ndarray] = None) -> None:
        """Buffer lip frames for one stream. PCM is rejected (the serving
        front drops connections that send audio to a video-only server).
        Backlog cap: post-feed bound, as in the other multi-stream
        servers."""
        if pcm is not None and len(pcm):
            raise ValueError("video-only server: audio payload rejected")
        if video_frames is None or not len(video_frames):
            return
        cap = self.max_backlog_blocks * self.block_frames
        if len(self._vbufs[stream_idx]) + len(video_frames) \
                > self._video_cap(cap):
            raise ValueError(
                f"stream {stream_idx} video backlog exceeds "
                f"{self.max_backlog_blocks} blocks")
        self._vbufs[stream_idx] = np.concatenate(
            [self._vbufs[stream_idx],
             _to_wire_video(video_frames, self._vdtype)])

    def has_full_block(self, stream_idx: int) -> bool:
        return self._video_ready(stream_idx)

    def reset_stream(self, stream_idx: int) -> None:
        """Recycle one stream slot (buffer + LSTM carries)."""
        self._vbufs[stream_idx] = np.zeros((0, 67, 67), self._vdtype)
        self._camera_reset_stream(stream_idx)
        self._clear_carry_row(stream_idx)
        self.cancel_pending(stream_idx)

    def tick(self, fetch: bool = True) -> dict:
        """Advance every stream with a full video block; returns
        {stream_idx: probs}. `fetch=False`: see MultiStreamVAD.tick."""
        active = np.fromiter((1.0 if self._video_ready(i) else 0.0
                              for i in range(self.n)), np.float32, self.n)
        if not active.any():
            return {}
        for i in range(self.n):
            if active[i]:
                self._consume_video(i)
        sh = self._stream_sharding
        extra = ((_put_streams(jnp.asarray(self._vidx), sh),)
                 if self.video_fps else ())
        probs, self._carries = self._step(
            self.variables, _put_streams(self._vout, sh), *extra,
            _put_streams(active, sh), self._carries)
        return self._finish_tick(probs, active, fetch)
