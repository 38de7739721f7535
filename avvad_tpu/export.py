"""Serving artifacts: compile-once, Python-model-free deployment.

The reference deploys by shipping Python model code + a torch ``.pt``
checkpoint and rebuilding the module graph at load time
(/root/reference/scripts/evaluate_AV_net.py:252-290). The TPU-native
equivalent exports the whole jitted serving program — frontend, model,
weights baked in — as serialized StableHLO via ``jax.export``: the
artifact replays on any machine with jax installed, with no model
classes, no checkpoint restore, and no retrace/recompile of Python code
paths. Shapes are static by design (one entry per serving shape), which
is exactly the XLA/TPU serving model this framework is built around.

An artifact is a zip file holding one serialized ``jax.export.Exported``
blob per named entry (e.g. one per batch bucket) plus a ``meta.json``
describing how it was built.

Notes:
- Export lowers for the platform(s) requested at build time
  (``platforms=("tpu",)`` by default exports for the machine's native
  backend). Cross-platform artifacts (``("cpu", "tpu")``) work for pure
  XLA programs; Pallas kernels lower to platform-specific custom calls,
  so export Pallas-LSTM configs for their native platform only.
- Weights are captured as program constants: the artifact is the model.
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Any, Callable, Mapping, Optional, Sequence

import jax
from jax import export as jax_export

_META_NAME = "meta.json"
_ENTRY_SUFFIX = ".stablehlo"
_FORMAT_VERSION = 1


class ServingArtifact:
    """A named set of exported serving programs + build metadata."""

    def __init__(self, entries: Mapping[str, jax_export.Exported],
                 meta: Optional[dict] = None):
        self.entries = dict(entries)
        self.meta = dict(meta or {})
        # per-entry jitted wrappers: Exported.call re-traces its calling
        # convention on EVERY invocation (measured 3.5 s/call vs 58 ms
        # direct jit at the serving shape); wrapping it in one cached
        # jax.jit restores compile-once dispatch.
        self._compiled: dict[str, Callable] = {}

    @classmethod
    def build(cls, fns: Mapping[str, tuple[Callable, tuple]],
              meta: Optional[dict] = None,
              platforms: Optional[Sequence[str]] = None) -> "ServingArtifact":
        """Export each ``name -> (fn, example_args)`` under jit.

        ``fn`` must be jittable with weights already closed over;
        ``example_args`` fixes the (static) serving shapes. A fn that is
        already a ``jax.jit`` object is exported as-is — pass one built
        with in_/out_shardings over a Mesh to export a MULTI-CHIP serving
        program (replay requires the same device count; jax.export
        records the sharded SPMD module).
        """
        entries = {}
        for name, (fn, example_args) in fns.items():
            jitted = fn if isinstance(fn, jax.stages.Wrapped) else jax.jit(fn)
            entries[name] = jax_export.export(
                jitted, platforms=platforms)(*example_args)
        full_meta = {
            "format_version": _FORMAT_VERSION,
            "jax_version": jax.__version__,
            "platforms": list(entries[next(iter(entries))].platforms)
            if entries else [],
        }
        full_meta.update(meta or {})
        return cls(entries, full_meta)

    def save(self, path: str) -> None:
        with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr(_META_NAME, json.dumps(self.meta, indent=2))
            for name, exported in self.entries.items():
                zf.writestr(name + _ENTRY_SUFFIX, exported.serialize())

    @classmethod
    def load(cls, path: str) -> "ServingArtifact":
        entries, meta = {}, {}
        with zipfile.ZipFile(path) as zf:
            for info in zf.infolist():
                if info.filename == _META_NAME:
                    meta = json.loads(zf.read(info))
                elif info.filename.endswith(_ENTRY_SUFFIX):
                    name = info.filename[: -len(_ENTRY_SUFFIX)]
                    entries[name] = jax_export.deserialize(zf.read(info))
        if not entries:
            raise ValueError(f"{path}: no serving entries found")
        version = meta.get("format_version")
        if version is not None and version > _FORMAT_VERSION:
            raise ValueError(
                f"{path}: artifact format {version} is newer than this "
                f"library supports ({_FORMAT_VERSION})")
        return cls(entries, meta)

    def call(self, name: str, *args) -> Any:
        """Run entry ``name`` on the current backend (shapes must match
        the exported example shapes exactly — static-shape serving).

        The first call per entry compiles (jit of the exported program);
        subsequent calls dispatch the cached executable at direct-jit
        speed (scripts/bench_artifact_overhead.py measures the gap)."""
        fn = self._compiled.get(name)
        if fn is None:
            fn = self._compiled[name] = jax.jit(self.entries[name].call)
        return fn(*args)

    def input_shapes(self, name: str):
        return [tuple(a.shape) for a in self.entries[name].in_avals]

    def input_dtypes(self, name: str):
        return [a.dtype for a in self.entries[name].in_avals]

    def __contains__(self, name: str) -> bool:
        return name in self.entries


def make_streaming_step_fn(streamer) -> tuple[Callable, tuple]:
    """-> (fn, example_args): a streamer's device step with weights baked,
    ready for ``ServingArtifact.build``.

    ``fn`` returns ``(probs, new_carries)``; a deployment loop owns the
    block assembly (cut windows host-side exactly as serve.py's feed()
    does) and feeds ``new_carries`` back into the next call — the LSTM
    state stays on device between blocks, so replay matches the live
    streamer block for block. One artifact entry per block shape.
    """
    import jax.numpy as jnp
    import numpy as np

    from . import serve as _serve

    step, variables = streamer._step, streamer.variables
    h = streamer.model.lstm_hidden_size
    carries = [(jnp.zeros((1, h), jnp.float32),
                jnp.zeros((1, h), jnp.float32))
               for _ in range(streamer.model.lstm_layers)]
    bf = streamer.block_frames

    if isinstance(streamer, _serve.StreamingAVVAD):
        vdtype = jnp.uint8 if streamer._vdtype == np.uint8 else jnp.float32

        def fn(frames, video, peak, carries):
            return step(variables, frames, video, peak, carries)
        example = (jnp.zeros((bf, streamer._nfft), jnp.float32),
                   jnp.zeros((bf, 67, 67), vdtype),
                   jnp.float32(1.0), carries)
        return fn, example
    if isinstance(streamer, _serve.StreamingVideoVAD):
        vdtype = jnp.uint8 if streamer._vdtype == np.uint8 else jnp.float32

        def fn(video, carries):
            return step(variables, video, carries)
        return fn, (jnp.zeros((bf, 67, 67), vdtype), carries)
    if isinstance(streamer, _serve.StreamingVAD):
        def fn(frames, peak, carries):
            return step(variables, frames, peak, carries)
        return fn, (jnp.zeros((bf, streamer._nfft), jnp.float32),
                    jnp.float32(1.0), carries)
    raise TypeError(f"not a single-stream streamer: {type(streamer)!r}")


def make_multistream_tick_fn(server) -> tuple[Callable, tuple]:
    """-> (fn, example_args): a multi-stream server's tick step with
    weights baked, for ``ServingArtifact.build``.

    The tick advances all N streams at once: padded (not-ready) streams
    pass ``active=0`` and have their LSTM carries mask-restored inside
    the step, exactly as the live server does — so an artifact-driven
    server loop (host-side buffering + block assembly + this tick)
    reproduces serve.py's multi-stream semantics. Carries are explicit
    inputs/outputs; clear a disconnected stream's row to zero host-side.

    Mesh-sharded servers export a MULTI-CHIP tick: every argument's
    stream axis carries the server's `data`-axis sharding (ticks stay
    collective-free), so the recorded SPMD module replays sharded on a
    same-size mesh.
    """
    import jax.numpy as jnp
    import numpy as np

    from . import serve as _serve

    step, variables = server._step, server.variables
    n, bf = server.n, server.block_frames
    h = server.model.lstm_hidden_size
    carries = [(jnp.zeros((n, h), jnp.float32),
                jnp.zeros((n, h), jnp.float32))
               for _ in range(server.model.lstm_layers)]
    peaks = jnp.ones((n,), jnp.float32)
    active = jnp.ones((n,), jnp.float32)
    row = server._stream_sharding  # None on a single device

    def _finish(fn, example):
        if row is None:
            return fn, example
        shardings = jax.tree_util.tree_map(lambda _: row, example)
        example = jax.device_put(example, shardings)
        return jax.jit(fn, in_shardings=shardings,
                       out_shardings=(row, [(row, row)] * len(carries))), \
            example

    def audio_example():
        # span-wire servers trace their tick on the raw contiguous
        # (N, span) sample span; frames-wire servers on (N, bf, nfft)
        # materialized windows — the exported program must match the
        # shape the rebuilt server's hub will ship
        if getattr(server, "span_wire", False):
            adt = (jnp.int16 if getattr(server, "audio_int16", False)
                   else jnp.float32)
            return jnp.zeros((n, server._hub.span), adt)
        return jnp.zeros((n, bf, server._nfft), jnp.float32)

    if isinstance(server, _serve.MultiStreamAVVAD):
        vdtype = jnp.uint8 if server._vdtype == np.uint8 else jnp.float32
        if server.video_fps:
            # camera-rate tick: unique source frames + per-stream gather
            # schedule (serve.MultiStreamAVVAD video_fps mode)
            def fn(frames, video, vidx, peaks, active, carries):
                return step(variables, frames, video, vidx, peaks, active,
                            carries)
            example = (audio_example(),
                       jnp.zeros((n, server._vsrc_max, 67, 67), vdtype),
                       jnp.zeros((n, bf), jnp.int32),
                       peaks, active, carries)
            return _finish(fn, example)

        def fn(frames, video, peaks, active, carries):
            return step(variables, frames, video, peaks, active, carries)
        example = (audio_example(),
                   jnp.zeros((n, bf, 67, 67), vdtype),
                   peaks, active, carries)
    elif isinstance(server, _serve.MultiStreamVideoVAD):
        vdtype = jnp.uint8 if server._vdtype == np.uint8 else jnp.float32
        if server.video_fps:
            def fn(video, vidx, active, carries):
                return step(variables, video, vidx, active, carries)
            example = (jnp.zeros((n, server._vsrc_max, 67, 67), vdtype),
                       jnp.zeros((n, bf), jnp.int32), active, carries)
            return _finish(fn, example)

        def fn(video, active, carries):
            return step(variables, video, active, carries)
        example = (jnp.zeros((n, bf, 67, 67), vdtype), active, carries)
    elif isinstance(server, _serve.MultiStreamVAD):
        def fn(frames, peaks, active, carries):
            return step(variables, frames, peaks, active, carries)
        example = (audio_example(), peaks, active, carries)
    else:
        raise TypeError(f"not a multi-stream server: {type(server)!r}")
    return _finish(fn, example)


def export_multistream_server(server, path: str,
                              meta: Optional[dict] = None,
                              platforms: Optional[Sequence[str]] = None
                              ) -> None:
    """Save a multi-stream server as a self-contained serving artifact.

    The artifact records the tick program (weights + normalization baked)
    plus the server geometry, so ``load_multistream_server`` can rebuild
    a fully functional server — native hub buffering, block assembly,
    TCP front via VADServer — with no model code and no checkpoint.
    """
    import numpy as np

    from . import serve as _serve

    fn, example = make_multistream_tick_fn(server)
    kind = ("av" if isinstance(server, _serve.MultiStreamAVVAD) else
            "video" if isinstance(server, _serve.MultiStreamVideoVAD) else
            "audio")
    geometry = {
        "kind": kind,
        "n_streams": server.n,
        "block_frames": server.block_frames,
        "max_backlog_blocks": server.max_backlog_blocks,
        "lstm_hidden": server.model.lstm_hidden_size,
        "lstm_layers": server.model.lstm_layers,
        "nfft": getattr(server, "_nfft", None),
        "span_wire": bool(getattr(server, "span_wire", False)),
        "hop_dft": bool(getattr(server, "hop_dft", False)),
        "audio_int16": bool(getattr(server, "audio_int16", False)),
        "video_fps": getattr(server, "video_fps", None),
        "video_uint8": bool(getattr(server, "_vdtype", None) == np.uint8),
        "mesh_data": (None if server._stream_sharding is None
                      else server._stream_sharding.mesh.shape["data"]),
    }
    if hasattr(server, "cfg"):  # audio/AV: the hub must cut the SAME
        # windows the exported tick was traced for (nfft via wlen, hop)
        import dataclasses

        geometry["stft_cfg"] = dataclasses.asdict(server.cfg)
    ServingArtifact.build({"tick": (fn, example)},
                          meta={"multistream": geometry, **(meta or {})},
                          platforms=platforms).save(path)


def load_multistream_server(path: str, native: bool = True, mesh=None):
    """Rebuild a multi-stream server from an artifact saved by
    ``export_multistream_server`` — model-code-free deployment.

    The returned object is a real MultiStream{VAD,VideoVAD,AVVAD}
    (feed/tick/reset_stream/VADServer-compatible); its device step is the
    artifact's tick program, so per-stream outputs match the original
    server exactly. An artifact exported from a mesh-sharded server
    replays sharded: pass a mesh with a matching `data` axis (default:
    one is built over the first ``mesh_data`` local devices).
    """
    from types import SimpleNamespace

    from . import serve as _serve

    artifact = ServingArtifact.load(path)
    geo = artifact.meta.get("multistream")
    if geo is None:
        raise ValueError(f"{path}: not a multistream server artifact")
    facts = SimpleNamespace(lstm_hidden_size=geo["lstm_hidden"],
                            lstm_layers=geo["lstm_layers"])

    if geo.get("mesh_data") and mesh is None:
        from .parallel import make_mesh

        mesh = make_mesh(n_data=geo["mesh_data"], n_model=1)
    if mesh is not None and geo.get("mesh_data") != mesh.shape.get("data"):
        raise ValueError(
            f"{path}: exported for data axis {geo.get('mesh_data')}, "
            f"got mesh data axis {mesh.shape.get('data')}")

    def step(_variables, *args):
        return artifact.call("tick", *args)

    common = dict(n_streams=geo["n_streams"],
                  block_frames=geo["block_frames"],
                  max_backlog_blocks=geo["max_backlog_blocks"],
                  step_override=step, mesh=mesh)
    if geo.get("stft_cfg") is not None:  # audio/AV window geometry
        from .config import STFTConfig

        common["stft_cfg"] = STFTConfig(**geo["stft_cfg"])
    if geo["kind"] != "video":
        # wire format is baked into the exported tick program: the hub
        # must assemble the same shape (span vs materialized windows)
        common["span_wire"] = geo.get("span_wire", False)
        common["hop_dft"] = geo.get("hop_dft", False)
        common["audio_int16"] = geo.get("audio_int16", False)
    if geo["kind"] == "av":
        return _serve.MultiStreamAVVAD(facts, {}, native=native,
                                       video_uint8=geo["video_uint8"],
                                       video_fps=geo.get("video_fps"),
                                       **common)
    if geo["kind"] == "video":
        return _serve.MultiStreamVideoVAD(facts, {},
                                          video_uint8=geo["video_uint8"],
                                          video_fps=geo.get("video_fps"),
                                          **common)
    return _serve.MultiStreamVAD(facts, {}, native=native, **common)


def make_waveform_serving_fn(model, variables, *, t_frames: int,
                             fs: int = 16000, wlen_sec: float = 64e-3,
                             hop_percent: float = 0.25,
                             hop_dft: bool = False,
                             fe_precision=jax.lax.Precision.HIGHEST,
                             norm_stats: Optional[dict] = None,
                             eps: float = 1e-8,
                             video_frame_indices=None) -> Callable:
    """The full raw-input serving step with weights closed over.

    audio-only models: fn(wave (B, n)) -> probs; video-only:
    fn(video) -> probs; AV: fn(wave, video) -> probs. Waveforms run
    through the on-device log-power STFT frontend (optionally the
    hop-block DFT variant). Dataset normalization applies when
    ``norm_stats`` carries the checkpoint keys audio_mean/audio_std and
    video_mean/video_std (plain mean/std accepted for the audio pair) —
    ``(x - mean) / (std + eps)``, exactly serve.py's streamers.
    """
    import jax.numpy as jnp
    import numpy as np

    from .ops.stft import log_power_frontend

    def _stat(*keys):
        for k in keys:
            v = (norm_stats or {}).get(k)
            if v is not None:
                return jnp.asarray(np.asarray(v).reshape(-1))
        return None

    a_mean, a_std = _stat("audio_mean", "mean"), _stat("audio_std", "std")
    v_mean, v_std = _stat("video_mean"), _stat("video_std")

    def frontend(wave):
        feats = log_power_frontend(wave, fs=fs, wlen_sec=wlen_sec,
                                   hop_percent=hop_percent, center=False,
                                   pad_at_end=True, precision=fe_precision,
                                   hop_dft=hop_dft)
        feats = feats[:, :t_frames, :]
        if a_mean is not None:
            feats = (feats - a_mean) / (a_std + eps)
        return feats

    def norm_video(video):
        if v_mean is not None:
            return (video - v_mean) / (v_std + eps)
        return video

    from .models import AVVAD, AudioVAD, RawAudioVAD, VideoVAD

    if isinstance(model, AudioVAD):
        def fn(wave):
            return jax.nn.sigmoid(
                model.apply(variables, frontend(wave), train=False))
        return fn
    if isinstance(model, RawAudioVAD):  # WaveNet consumes the raw wave
        def fn(wave):
            return jax.nn.sigmoid(model.apply(variables, wave, train=False))
        return fn
    if isinstance(model, VideoVAD):
        def fn(video):
            kw = {}
            if video_frame_indices is not None:
                kw["video_frame_indices"] = video_frame_indices
            return jax.nn.sigmoid(
                model.apply(variables, norm_video(video), train=False, **kw))
        return fn
    if isinstance(model, AVVAD):
        def fn(wave, video):
            kw = {}
            if video_frame_indices is not None:
                kw["video_frame_indices"] = video_frame_indices
            return jax.nn.sigmoid(
                model.apply(variables, frontend(wave), norm_video(video),
                            train=False, **kw))
        return fn
    raise TypeError(f"unsupported model for serving export: {type(model)!r} "
                    "(expected AudioVAD / RawAudioVAD / VideoVAD / AVVAD)")
