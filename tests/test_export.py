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


@pytest.mark.slow
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
    # checkpoint-convention keys, reference (dim, 1) stat shapes
    stats = {"audio_mean": np.full((513, 1), 0.25, np.float32),
             "audio_std": np.full((513, 1), 2.0, np.float32)}

    fn = make_waveform_serving_fn(model, variables, t_frames=t,
                                  norm_stats=stats)
    artifact = ServingArtifact.build({"b2": (fn, (wave,))})
    path = str(tmp_path / "audio.avvadx")
    artifact.save(path)
    got = np.asarray(ServingArtifact.load(path).call("b2", wave))

    feats = log_power_frontend(wave, fs=fs, wlen_sec=64e-3, hop_percent=0.25,
                               center=False, pad_at_end=True)[:, :t, :]
    feats = (feats - 0.25) / (2.0 + 1e-8)
    want = np.asarray(jax.nn.sigmoid(model.apply(variables, feats,
                                                 train=False)))
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.slow
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


def test_streaming_step_artifact_matches_live_streamer(tmp_path):
    """Exported streaming step replays block-for-block against the live
    StreamingVAD, with carries round-tripping through the artifact."""
    from avvad_tpu.export import make_streaming_step_fn
    from avvad_tpu.models import AudioVAD
    from avvad_tpu.serve import StreamingVAD

    model = AudioVAD(lstm_hidden_size=16, lstm_layers=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 513)))
    streamer = StreamingVAD(model, variables, block_frames=4, fixed_peak=1.0)

    rng = np.random.default_rng(0)
    pcm = rng.standard_normal(1024 + 4 * 256 * 3).astype(np.float32)
    live = streamer.feed(pcm)
    assert live.size >= 8  # at least two blocks fired

    fn, example = make_streaming_step_fn(streamer)
    artifact = ServingArtifact.build({"step": (fn, example)})
    p = str(tmp_path / "stream.avvadx")
    artifact.save(p)
    loaded = ServingArtifact.load(p)

    # replay: same block cutting as feed(), carries fed back each call
    nfft, hop, bf = 1024, 256, 4
    n = 1 + (len(pcm) - nfft) // hop
    idx = np.arange(n)[:, None] * hop + np.arange(nfft)[None, :]
    frames = pcm[idx]
    h = model.lstm_hidden_size
    carries = [(jnp.zeros((1, h)), jnp.zeros((1, h)))
               for _ in range(model.lstm_layers)]
    outs = []
    for b in range(n // bf):
        block = jnp.asarray(frames[b * bf:(b + 1) * bf])
        probs, carries = loaded.call("step", block, jnp.float32(1.0),
                                     carries)
        outs.append(np.asarray(probs))
    replay = np.concatenate(outs)
    np.testing.assert_allclose(replay, live[: len(replay)], atol=1e-6)


@pytest.mark.slow
def test_streaming_video_step_fn_replay(tmp_path):
    """Video-only streaming step exports and replays block-for-block."""
    from avvad_tpu.export import make_streaming_step_fn
    from avvad_tpu.models import VideoVAD
    from avvad_tpu.serve import StreamingVideoVAD

    model = VideoVAD(lstm_hidden_size=16, lstm_layers=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 67, 67)))
    streamer = StreamingVideoVAD(model, variables, block_frames=4)
    frames = np.random.default_rng(0).uniform(
        0, 255, size=(8, 67, 67)).astype(np.float32)
    live = streamer.feed(frames)
    assert live.shape == (8,)

    fn, example = make_streaming_step_fn(streamer)
    artifact = ServingArtifact.build({"step": (fn, example)})
    p = str(tmp_path / "vstream.avvadx")
    artifact.save(p)
    loaded = ServingArtifact.load(p)
    h = model.lstm_hidden_size
    carries = [(jnp.zeros((1, h)), jnp.zeros((1, h)))]
    outs = []
    for b in range(2):
        probs, carries = loaded.call("step",
                                     jnp.asarray(frames[b * 4:(b + 1) * 4]),
                                     carries)
        outs.append(np.asarray(probs))
    np.testing.assert_allclose(np.concatenate(outs), live, atol=1e-6)


def test_streaming_av_step_fn_shapes():
    """AV streaming step fn exports with the uint8 wire dtype preserved."""
    from avvad_tpu.export import make_streaming_step_fn
    from avvad_tpu.models import AVVAD
    from avvad_tpu.serve import StreamingAVVAD

    model = AVVAD(lstm_hidden_size=16, lstm_layers=1, use_mcb=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 513)),
                           jnp.zeros((1, 4, 67, 67)))
    streamer = StreamingAVVAD(model, variables, block_frames=4,
                              fixed_peak=1.0, video_uint8=True)
    fn, example = make_streaming_step_fn(streamer)
    assert example[1].dtype == jnp.uint8
    probs, carries = fn(*example)
    assert probs.shape == (4,)
    assert len(carries) == 1 and carries[0][0].shape == (1, 16)


def test_multistream_tick_artifact_matches_live_server(tmp_path):
    """Artifact-driven multi-stream tick reproduces the live server: same
    probabilities AND mask-restored carries for inactive streams."""
    from avvad_tpu.export import make_multistream_tick_fn
    from avvad_tpu.models import AudioVAD
    from avvad_tpu.serve import MultiStreamVAD

    model = AudioVAD(lstm_hidden_size=16, lstm_layers=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 513)))
    server = MultiStreamVAD(model, variables, n_streams=4, block_frames=4)

    fn, example = make_multistream_tick_fn(server)
    artifact = ServingArtifact.build({"tick": (fn, example)})
    p = str(tmp_path / "tick.avvadx")
    artifact.save(p)
    loaded = ServingArtifact.load(p)

    rng = np.random.default_rng(1)
    frames = rng.standard_normal((4, 4, 1024)).astype(np.float32)
    peaks = jnp.ones((4,))
    active = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    h = model.lstm_hidden_size
    carries = [(jnp.asarray(rng.standard_normal((4, h)), jnp.float32),
                jnp.asarray(rng.standard_normal((4, h)), jnp.float32))]

    want_p, want_c = server._step(server.variables, jnp.asarray(frames),
                                  peaks, active, carries)
    got_p, got_c = loaded.call("tick", jnp.asarray(frames), peaks, active,
                               carries)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               atol=1e-6)
    for (gh, gc), (wh, wc) in zip(got_c, want_c):
        np.testing.assert_allclose(np.asarray(gh), np.asarray(wh), atol=1e-6)
        np.testing.assert_allclose(np.asarray(gc), np.asarray(wc), atol=1e-6)
    # inactive rows kept their old carries
    np.testing.assert_allclose(np.asarray(got_c[0][0])[1],
                               np.asarray(carries[0][0])[1], atol=0)


def test_artifact_server_round_trip(tmp_path):
    """export_multistream_server -> load_multistream_server rebuilds a
    working server (hub buffering + tick) whose per-stream outputs match
    the live model-backed server exactly."""
    from avvad_tpu.export import (export_multistream_server,
                                  load_multistream_server)
    from avvad_tpu.models import AudioVAD
    from avvad_tpu.serve import MultiStreamVAD

    model = AudioVAD(lstm_hidden_size=16, lstm_layers=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 513)))
    live = MultiStreamVAD(model, variables, n_streams=2, block_frames=4)

    p = str(tmp_path / "server.avvadx")
    export_multistream_server(live, p, meta={"note": "test"})
    loaded = load_multistream_server(p)
    assert (loaded.n, loaded.block_frames) == (2, 4)

    rng = np.random.default_rng(0)
    pcm0 = rng.standard_normal(1024 + 256 * 3).astype(np.float32)  # 1 block
    pcm1 = rng.standard_normal(1024 + 256 * 7).astype(np.float32)  # 2 blocks
    for srv in (live, loaded):
        srv.feed(0, pcm0)
        srv.feed(1, pcm1)
    want = live.tick()
    got = loaded.tick()
    assert set(want) == set(got) == {0, 1}
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-6)
    # second tick drains stream 1's second block on both
    want2, got2 = live.tick(), loaded.tick()
    assert set(want2) == set(got2)
    for k in want2:
        np.testing.assert_allclose(got2[k], want2[k], atol=1e-6)
    # carry reset machinery works without model code
    loaded.reset_stream(0)


def test_artifact_server_round_trip_span_hop_dft(tmp_path):
    """A span-wire + hop-DFT server exports with the raw (N, span)
    sample-span tick input (not materialized windows), records the wire
    format in its geometry, and rebuilds a server whose outputs match
    the live one exactly."""
    from avvad_tpu.export import (ServingArtifact,
                                  export_multistream_server,
                                  load_multistream_server)
    from avvad_tpu.models import AudioVAD
    from avvad_tpu.serve import MultiStreamVAD

    model = AudioVAD(lstm_hidden_size=16, lstm_layers=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 513)))
    live = MultiStreamVAD(model, variables, n_streams=2, block_frames=4,
                          span_wire=True, hop_dft=True)

    p = str(tmp_path / "span_server.avvadx")
    export_multistream_server(live, p)
    loaded = load_multistream_server(p)
    assert loaded.span_wire and loaded.hop_dft
    # the exported tick was traced on the raw (N, span) sample span
    assert ServingArtifact.load(p).input_shapes("tick")[0] \
        == (2, live._hub.span)

    rng = np.random.default_rng(0)
    pcm0 = rng.standard_normal(1024 + 256 * 3).astype(np.float32)
    pcm1 = rng.standard_normal(1024 + 256 * 7).astype(np.float32)
    for srv in (live, loaded):
        srv.feed(0, pcm0)
        srv.feed(1, pcm1)
    want, got = live.tick(), loaded.tick()
    assert set(want) == set(got) == {0, 1}
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-6)
    want2, got2 = live.tick(), loaded.tick()
    assert set(want2) == set(got2)
    for k in want2:
        np.testing.assert_allclose(got2[k], want2[k], atol=1e-6)


def test_mesh_sharded_server_artifact(tmp_path):
    """A mesh-sharded multi-stream server round-trips through an
    artifact: the exported SPMD tick replays with stream rows sharded
    over the data axis, matching the unsharded live server."""
    from avvad_tpu.export import (export_multistream_server,
                                  load_multistream_server)
    from avvad_tpu.models import AudioVAD
    from avvad_tpu.parallel import make_mesh
    from avvad_tpu.serve import MultiStreamVAD

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model = AudioVAD(lstm_hidden_size=16, lstm_layers=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 513)))
    mesh = make_mesh(n_data=8, n_model=1)
    sharded = MultiStreamVAD(model, variables, n_streams=8, block_frames=4,
                             mesh=mesh)
    plain = MultiStreamVAD(model, variables, n_streams=8, block_frames=4)

    p = str(tmp_path / "mesh_server.avvadx")
    export_multistream_server(sharded, p)
    loaded = load_multistream_server(p)
    assert loaded._stream_sharding is not None

    rng = np.random.default_rng(0)
    pcm = [rng.standard_normal(1024 + 256 * 3).astype(np.float32)
           for _ in range(8)]
    for i in range(8):
        plain.feed(i, pcm[i])
        loaded.feed(i, pcm[i])
    want, got = plain.tick(), loaded.tick()
    assert set(want) == set(got)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-5)


@pytest.mark.slow
def test_sharded_serving_artifact(tmp_path):
    """Multi-chip export: a data-sharded serving program round-trips and
    replays on the virtual 8-device mesh with per-device batch rows."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices()[:8])
    if devs.size < 8:
        pytest.skip("needs 8 virtual devices")
    model, variables, t, _, _ = _tiny_av()
    b = 8
    n = 256 * (t - 1) + 1024
    wave = jax.random.normal(jax.random.PRNGKey(0), (b, n))
    video = jax.random.normal(jax.random.PRNGKey(1), (b, t, 67, 67))
    fn = make_waveform_serving_fn(model, variables, t_frames=t)
    want = np.asarray(fn(wave, video))

    mesh = Mesh(devs, ("data",))
    row = NamedSharding(mesh, P("data"))
    sharded = jax.jit(fn, in_shardings=(row, row), out_shardings=row)
    artifact = ServingArtifact.build({"b8x8": (sharded, (wave, video))},
                                     meta={"mesh": "data=8"})
    p = str(tmp_path / "sharded.avvadx")
    artifact.save(p)

    loaded = ServingArtifact.load(p)
    got = np.asarray(loaded.call("b8x8", jax.device_put(wave, row),
                                 jax.device_put(video, row)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_artifact_server_preserves_stft_geometry(tmp_path):
    """Non-default STFT windows survive the server round trip: the hub
    must cut the same windows the exported tick was traced for."""
    from avvad_tpu.config import STFTConfig
    from avvad_tpu.export import (export_multistream_server,
                                  load_multistream_server)
    from avvad_tpu.models import AudioVAD
    from avvad_tpu.serve import MultiStreamVAD

    cfg = STFTConfig(hop_percent=0.5)
    model = AudioVAD(lstm_hidden_size=16, lstm_layers=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 513)))
    live = MultiStreamVAD(model, variables, n_streams=2, block_frames=4,
                          stft_cfg=cfg)
    p = str(tmp_path / "hop50.avvadx")
    export_multistream_server(live, p)
    loaded = load_multistream_server(p)
    assert loaded._hop == live._hop == 512
    assert loaded._nfft == live._nfft == 1024

    pcm = np.random.default_rng(0).standard_normal(
        1024 + 512 * 3).astype(np.float32)
    live.feed(0, pcm)
    loaded.feed(0, pcm)
    want, got = live.tick(), loaded.tick()
    np.testing.assert_allclose(got[0], want[0], atol=1e-6)


@pytest.mark.slow
def test_int8_tower_artifact_round_trip(tmp_path):
    """The quantized serving tower exports and replays (dynamic W8A8:
    no calibration data needed; static differs only by baked scales)."""
    from avvad_tpu.models import AVVAD

    t, b = 4, 1
    n = 256 * (t - 1) + 1024
    model = AVVAD(lstm_hidden_size=16, lstm_layers=1, use_mcb=True,
                  tower_int8=True, tower_quant_mode="dynamic")
    wave = jax.random.normal(jax.random.PRNGKey(0), (b, n))
    video = jax.random.normal(jax.random.PRNGKey(1), (b, t, 67, 67))
    variables = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 4, 513)),
                           jnp.zeros((1, 4, 67, 67)))
    fn = make_waveform_serving_fn(model, variables, t_frames=t)
    want = np.asarray(fn(wave, video))

    artifact = ServingArtifact.build({"b1": (fn, (wave, video))},
                                     meta={"tower_int8": True})
    p = str(tmp_path / "int8.avvadx")
    artifact.save(p)
    got = np.asarray(ServingArtifact.load(p).call("b1", wave, video))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_unsupported_model_rejected():
    from avvad_tpu.models import ResNet18

    with pytest.raises(TypeError, match="unsupported model"):
        make_waveform_serving_fn(ResNet18(), {}, t_frames=4)


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


@pytest.mark.slow
def test_artifact_av_camera_rate_server_round_trip(tmp_path):
    """A camera-rate (video_fps=30) AV server exports its unique-frame
    tick (source frames + per-stream gather schedule as explicit inputs),
    records video_fps in the geometry, and rebuilds a server that matches
    the live one exactly across multiple resample phases."""
    from avvad_tpu.export import (ServingArtifact,
                                  export_multistream_server,
                                  load_multistream_server)
    from avvad_tpu.models import AVVAD
    from avvad_tpu.serve import MultiStreamAVVAD

    model = AVVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1, use_mcb=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 513)),
                           jnp.zeros((1, 4, 67, 67)))
    bf = 16
    live = MultiStreamAVVAD(model, variables, n_streams=2, block_frames=bf,
                            video_uint8=True, video_fps=30.0)

    p = str(tmp_path / "cam_server.avvadx")
    export_multistream_server(live, p)
    loaded = load_multistream_server(p)
    assert loaded.video_fps == 30.0
    shapes = ServingArtifact.load(p).input_shapes("tick")
    assert shapes[1] == (2, live._vsrc_max, 67, 67)   # unique src frames
    assert shapes[2] == (2, bf)                       # gather schedule

    rng = np.random.default_rng(3)
    pcm = [rng.standard_normal(40000).astype(np.float32) * 0.3
           for _ in range(2)]
    src = [np.round(rng.random((40, 67, 67)) * 255).astype(np.float32)
           for _ in range(2)]
    for srv in (live, loaded):
        for i in range(2):
            srv.feed(i, pcm=pcm[i], video_frames=src[i])
    for _ in range(4):  # several ticks: 8- and 9-source phases
        want, got = live.tick(), loaded.tick()
        assert set(want) == set(got) == {0, 1}
        for k in want:
            np.testing.assert_allclose(got[k], want[k], atol=1e-6)


def test_artifact_server_round_trip_audio_int16(tmp_path):
    """An audio_int16 span-wire server exports with an int16 (N, span)
    tick input, records the wire in its geometry, and rebuilds a server
    that accepts int16 feeds and matches the live one exactly."""
    from avvad_tpu.export import (ServingArtifact,
                                  export_multistream_server,
                                  load_multistream_server)
    from avvad_tpu.models import AudioVAD
    from avvad_tpu.serve import MultiStreamVAD

    model = AudioVAD(lstm_hidden_size=16, lstm_layers=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 513)))
    live = MultiStreamVAD(model, variables, n_streams=2, block_frames=4,
                          span_wire=True, audio_int16=True)

    p = str(tmp_path / "i16_server.avvadx")
    export_multistream_server(live, p)
    loaded = load_multistream_server(p)
    assert loaded.audio_int16 and loaded.span_wire
    art = ServingArtifact.load(p)
    assert art.input_shapes("tick")[0] == (2, live._hub.span)
    assert art.meta["multistream"]["audio_int16"] is True

    rng = np.random.default_rng(0)
    pcm0 = rng.integers(-32768, 32768, size=1024 + 256 * 3, dtype=np.int16)
    pcm1 = rng.integers(-32768, 32768, size=1024 + 256 * 7, dtype=np.int16)
    for srv in (live, loaded):
        srv.feed(0, pcm0)
        srv.feed(1, pcm1)
    want, got = live.tick(), loaded.tick()
    assert set(want) == set(got) == {0, 1}
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-6)


@pytest.mark.slow
def test_artifact_av_server_round_trip_audio_int16(tmp_path):
    """The AV export path with audio_int16 (span wire + uint8 video):
    the exported tick's audio input must be int16 (N, span), the wire
    flags must survive the geometry round trip, and the rebuilt server
    must match the live one on int16 PCM + uint8 lip-frame feeds."""
    from avvad_tpu.export import (ServingArtifact,
                                  export_multistream_server,
                                  load_multistream_server)
    from avvad_tpu.models import AVVAD
    from avvad_tpu.serve import MultiStreamAVVAD

    model = AVVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1, use_mcb=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 513)),
                           jnp.zeros((1, 4, 67, 67)))
    live = MultiStreamAVVAD(model, variables, n_streams=2, block_frames=4,
                            span_wire=True, audio_int16=True,
                            video_uint8=True)

    p = str(tmp_path / "av_i16_server.avvadx")
    export_multistream_server(live, p)
    loaded = load_multistream_server(p)
    assert loaded.audio_int16 and loaded.span_wire and loaded.video_uint8
    art = ServingArtifact.load(p)
    shapes = art.input_shapes("tick")
    assert shapes[0] == (2, live._hub.span)
    assert art.meta["multistream"]["audio_int16"] is True
    # dtype of the exported audio input is the int16 wire itself
    assert np.dtype(art.input_dtypes("tick")[0]) == np.int16

    rng = np.random.default_rng(7)
    # enough audio for both ticks below: frames_ready >= 8 needs
    # >= 1024 + 7*256 samples
    pcm = [rng.integers(-32768, 32768, size=1024 + 256 * (7 + 4 * i),
                        dtype=np.int16) for i in range(2)]
    vid = [rng.integers(0, 256, size=(12, 67, 67), dtype=np.uint8)
           for _ in range(2)]
    for srv in (live, loaded):
        for i in range(2):
            srv.feed(i, pcm=pcm[i], video_frames=vid[i])
    for _ in range(2):
        want, got = live.tick(), loaded.tick()
        assert set(want) == set(got) == {0, 1}
        for k in want:
            np.testing.assert_allclose(got[k], want[k], atol=1e-6)
