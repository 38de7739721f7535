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

    @classmethod
    def build(cls, fns: Mapping[str, tuple[Callable, tuple]],
              meta: Optional[dict] = None,
              platforms: Optional[Sequence[str]] = None) -> "ServingArtifact":
        """Export each ``name -> (fn, example_args)`` under jit.

        ``fn`` must be jittable with weights already closed over;
        ``example_args`` fixes the (static) serving shapes.
        """
        entries = {}
        for name, (fn, example_args) in fns.items():
            entries[name] = jax_export.export(
                jax.jit(fn), platforms=platforms)(*example_args)
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
        the exported example shapes exactly — static-shape serving)."""
        return self.entries[name].call(*args)

    def input_shapes(self, name: str):
        return [tuple(a.shape) for a in self.entries[name].in_avals]

    def __contains__(self, name: str) -> bool:
        return name in self.entries


def make_waveform_serving_fn(model, variables, *, t_frames: int,
                             fs: int = 16000, wlen_sec: float = 64e-3,
                             hop_percent: float = 0.25,
                             hop_dft: bool = False,
                             fe_precision=jax.lax.Precision.HIGHEST,
                             norm_stats: Optional[dict] = None,
                             video_frame_indices=None) -> Callable:
    """The full raw-input serving step with weights closed over.

    audio-only models: fn(wave (B, n)) -> probs; video-only:
    fn(video) -> probs; AV: fn(wave, video) -> probs. Waveforms run
    through the on-device log-power STFT frontend (optionally the
    hop-block DFT variant); per-bin normalization applies when
    ``norm_stats`` has mean/std (matches serve.py's streamers).
    """
    import jax.numpy as jnp

    from .ops.stft import log_power_frontend

    mean = std = None
    if norm_stats:
        mean = jnp.asarray(norm_stats.get("mean")) \
            if norm_stats.get("mean") is not None else None
        std = jnp.asarray(norm_stats.get("std")) \
            if norm_stats.get("std") is not None else None

    def frontend(wave):
        feats = log_power_frontend(wave, fs=fs, wlen_sec=wlen_sec,
                                   hop_percent=hop_percent, center=False,
                                   pad_at_end=True, precision=fe_precision,
                                   hop_dft=hop_dft)
        feats = feats[:, :t_frames, :]
        if mean is not None:
            feats = (feats - mean) / (std if std is not None else 1.0)
        return feats

    name = model.__class__.__name__
    if name == "AudioVAD":
        def fn(wave):
            return jax.nn.sigmoid(
                model.apply(variables, frontend(wave), train=False))
        return fn
    if name == "RawAudioVAD":  # WaveNet frontend consumes the raw wave
        def fn(wave):
            return jax.nn.sigmoid(model.apply(variables, wave, train=False))
        return fn
    if name == "VideoVAD":
        def fn(video):
            kw = {}
            if video_frame_indices is not None:
                kw["video_frame_indices"] = video_frame_indices
            return jax.nn.sigmoid(
                model.apply(variables, video, train=False, **kw))
        return fn

    def fn(wave, video):  # AVVAD
        kw = {}
        if video_frame_indices is not None:
            kw["video_frame_indices"] = video_frame_indices
        return jax.nn.sigmoid(
            model.apply(variables, frontend(wave), video, train=False, **kw))
    return fn
