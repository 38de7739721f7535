"""Serving artifacts (jax.export): build / save / load / replay parity.

The artifact is the TPU-native deployment story: the whole serving
program (frontend + model + weights) serialized as StableHLO, replayable
without model code or checkpoints (avvad_tpu/export.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avvad_tpu.export import ServingArtifact, make_waveform_serving_fn


def _tiny_av(batch=2, t=8):
    from avvad_tpu.models import AVVAD

    fs, hop = 16000, 256
    n = hop * (t - 1) + 1024
    model = AVVAD(lstm_hidden_size=16, lstm_layers=1, use_mcb=True)
    wave = jax.random.normal(jax.random.PRNGKey(0), (batch, n))
    video = jax.random.normal(jax.random.PRNGKey(1), (batch, t, 67, 67))
    variables = model.init(jax.random.PRNGKey(2),
                           jnp.zeros((1, 4, 513)), jnp.zeros((1, 4, 67, 67)))
    return model, variables, t, wave, video


def test_av_artifact_round_trip(tmp_path):
    model, variables, t, wave, video = _tiny_av()
    fn = make_waveform_serving_fn(model, variables, t_frames=t)
    want = np.asarray(fn(wave, video))

    artifact = ServingArtifact.build({"b2": (fn, (wave, video))},
                                     meta={"modality": "av"})
    path = str(tmp_path / "av.avvadx")
    artifact.save(path)

    loaded = ServingArtifact.load(path)
    assert "b2" in loaded
    assert loaded.meta["modality"] == "av"
    assert loaded.meta["jax_version"] == jax.__version__
    assert loaded.input_shapes("b2") == [tuple(wave.shape),
                                         tuple(video.shape)]
    got = np.asarray(loaded.call("b2", wave, video))
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.shape == (2, t, 1)
    assert (got >= 0).all() and (got <= 1).all()


def test_audio_artifact_with_norm_stats(tmp_path):
    from avvad_tpu.models import AudioVAD
    from avvad_tpu.ops.stft import log_power_frontend

    fs, hop, t, b = 16000, 256, 8, 2
    n = hop * (t - 1) + 1024
    model = AudioVAD(lstm_hidden_size=16, lstm_layers=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 513)))
    wave = jax.random.normal(jax.random.PRNGKey(1), (b, n))
    stats = {"mean": np.full((513,), 0.25, np.float32),
             "std": np.full((513,), 2.0, np.float32)}

    fn = make_waveform_serving_fn(model, variables, t_frames=t,
                                  norm_stats=stats)
    artifact = ServingArtifact.build({"b2": (fn, (wave,))})
    path = str(tmp_path / "audio.avvadx")
    artifact.save(path)
    got = np.asarray(ServingArtifact.load(path).call("b2", wave))

    feats = log_power_frontend(wave, fs=fs, wlen_sec=64e-3, hop_percent=0.25,
                               center=False, pad_at_end=True)[:, :t, :]
    feats = (feats - stats["mean"]) / stats["std"]
    want = np.asarray(jax.nn.sigmoid(model.apply(variables, feats,
                                                 train=False)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_av_unique_frame_layout(tmp_path):
    """Exported unique-frame serving (baked fps-resample gather) matches
    direct application on the resampled timeline."""
    from avvad_tpu.processing.video import fps_resample_indices

    model, variables, t, wave, _ = _tiny_av()
    fps, frame_rate = 30.0, 62.5
    t_src = int(np.ceil(t * fps / frame_rate)) + 2
    idx = fps_resample_indices(t_src, fps, frame_rate)[:t]
    assert len(idx) == t
    frame_idx = jnp.asarray(idx)
    video_src = jax.random.normal(jax.random.PRNGKey(3), (2, t_src, 67, 67))

    fn = make_waveform_serving_fn(model, variables, t_frames=t,
                                  video_frame_indices=frame_idx)
    want = np.asarray(fn(wave, video_src))
    artifact = ServingArtifact.build({"e": (fn, (wave, video_src))})
    p = str(tmp_path / "u.avvadx")
    artifact.save(p)
    got = np.asarray(ServingArtifact.load(p).call("e", wave, video_src))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_raw_audio_artifact(tmp_path):
    from avvad_tpu.models import RawAudioVAD

    t, b, n = 8, 2, 4096
    model = RawAudioVAD(lstm_hidden_size=16, lstm_layers=1, out_frames=t,
                        wavenet_kwargs={"residual_channels": 4,
                                        "dilation_channels": 4,
                                        "bottleneck_width": 8,
                                        "dilations": (1, 2, 4)})
    wave = jax.random.normal(jax.random.PRNGKey(0), (b, n))
    variables = model.init(jax.random.PRNGKey(1), wave)
    fn = make_waveform_serving_fn(model, variables, t_frames=t)
    want = np.asarray(fn(wave))

    artifact = ServingArtifact.build({"b2": (fn, (wave,))})
    p = str(tmp_path / "raw.avvadx")
    artifact.save(p)
    got = np.asarray(ServingArtifact.load(p).call("b2", wave))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_format_version_guard(tmp_path):
    model, variables, t, wave, video = _tiny_av()
    fn = make_waveform_serving_fn(model, variables, t_frames=t)
    artifact = ServingArtifact.build({"b2": (fn, (wave, video))})
    artifact.meta["format_version"] = 999
    p = str(tmp_path / "future.avvadx")
    artifact.save(p)
    with pytest.raises(ValueError, match="newer"):
        ServingArtifact.load(p)


def test_empty_artifact_rejected(tmp_path):
    import zipfile

    p = str(tmp_path / "empty.avvadx")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("meta.json", "{}")
    with pytest.raises(ValueError, match="no serving entries"):
        ServingArtifact.load(p)
