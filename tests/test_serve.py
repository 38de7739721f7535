"""Streaming serving: chunked output must match offline classification."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avvad_tpu.config import STFTConfig
from avvad_tpu.models import AudioVAD
from avvad_tpu.processing import read_wav
from avvad_tpu.processing.audio_io import peak_normalize
from avvad_tpu.serve import StreamingVAD


def _model_and_vars(h=16, layers=2):
    model = AudioVAD(y_dim=1, lstm_hidden_size=h, lstm_layers=layers)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 513)))
    return model, variables


def test_streaming_matches_offline(ref_subset):
    wav = sorted(glob.glob(os.path.join(
        ref_subset, "processed/ntcd_timit/Clean/**/*.wav"), recursive=True))[0]
    x, fs = read_wav(wav)
    xn = peak_normalize(x)
    cfg = STFTConfig()

    model, variables = _model_and_vars()

    # offline: full-utterance log-power features -> model
    from avvad_tpu.ops.stft import log_power_frontend

    feats = log_power_frontend(jnp.asarray(x)[None], fs=cfg.fs,
                               pad_at_end=False)
    offline = np.asarray(jax.nn.sigmoid(
        model.apply(variables, feats)))[0, :, 0]

    # streaming with the known global peak, fed in ragged chunks
    sv = StreamingVAD(model, variables, stft_cfg=cfg, block_frames=8,
                      fixed_peak=float(np.max(np.abs(x))))
    rng = np.random.default_rng(0)
    pos, outs = 0, []
    while pos < len(x):
        n = int(rng.integers(100, 5000))
        outs.append(sv.feed(x[pos: pos + n]))
        pos += n
    outs.append(sv.flush())
    stream = np.concatenate(outs)

    n = min(len(stream), len(offline))
    assert n >= len(offline) - 1
    np.testing.assert_allclose(stream[:n], offline[:n], atol=1e-4)


def test_streaming_reset_reproducible():
    model, variables = _model_and_vars(h=8, layers=1)
    sv = StreamingVAD(model, variables, block_frames=4, fixed_peak=1.0)
    x = np.random.default_rng(1).normal(size=16000).astype(np.float32) * 0.1
    a = np.concatenate([sv.feed(x), sv.flush()])
    sv.reset()
    b = np.concatenate([sv.feed(x), sv.flush()])
    np.testing.assert_array_equal(a, b)
    assert len(a) > 0 and ((a >= 0) & (a <= 1)).all()


@pytest.mark.slow
def test_av_streaming_runs_and_is_deterministic(ref_subset):
    """Synchronized AV streaming: ragged chunks, reproducible, valid probs.

    (Block-local L2 in the MCB path makes exact offline equality
    unattainable by design, so this checks the contract rather than
    bit-parity; the concat-fusion path has no such term.)"""
    import glob

    from avvad_tpu.data.records import load_video
    from avvad_tpu.models import AVVAD
    from avvad_tpu.serve import StreamingAVVAD

    wav = os.path.join(
        ref_subset, "processed/ntcd_timit/Clean/test/34M/sa1.wav")
    vid = os.path.join(
        ref_subset, "processed/ntcd_timit/matlab_raw/test/34M/sa1_upsampled.h5")
    x, fs = read_wav(wav)
    frames = load_video(vid)  # (T, 67, 67) at 62.5 fps

    model = AVVAD(y_dim=1, lstm_hidden_size=16, lstm_layers=1, use_mcb=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 513)),
                           jnp.zeros((1, 4, 67, 67)))

    sv = StreamingAVVAD(model, variables, block_frames=8,
                        fixed_peak=float(np.max(np.abs(x))))
    rng = np.random.default_rng(0)
    pos_a, pos_v, outs = 0, 0, []
    while pos_a < len(x) or pos_v < len(frames):
        na = int(rng.integers(500, 4000))
        nv = int(rng.integers(2, 16))
        outs.append(sv.feed(x[pos_a:pos_a + na], frames[pos_v:pos_v + nv]))
        pos_a += na
        pos_v += nv
    outs.append(sv.flush())
    probs = np.concatenate(outs)
    assert len(probs) > 250
    assert ((probs >= 0) & (probs <= 1)).all()

    # reproducible after reset
    sv.reset()
    again = np.concatenate([sv.feed(x, frames), sv.flush()])
    n = min(len(probs), len(again))
    np.testing.assert_allclose(probs[:n], again[:n], atol=1e-5)

    # concat fusion path: streaming matches offline (no block-local terms)
    from avvad_tpu.ops.stft import log_power_frontend

    t = min(len(frames), 300)
    feats = log_power_frontend(jnp.asarray(x)[None], fs=fs,
                               pad_at_end=False)[:, :t]
    offline = np.asarray(jax.nn.sigmoid(model.apply(
        variables, feats, jnp.asarray(frames[None, :t]))))[0, :, 0]
    np.testing.assert_allclose(probs[:t], offline[:t], atol=1e-4)


def test_multistream_matches_solo_streams(ref_subset):
    """Each stream of MultiStreamVAD must match a solo StreamingVAD run
    bit-for-bit, despite streams of different lengths sharing the step."""
    import glob

    from avvad_tpu.serve import MultiStreamVAD

    wavs = sorted(glob.glob(os.path.join(
        ref_subset, "processed/ntcd_timit/Clean/**/*.wav"), recursive=True))[:3]
    signals = [read_wav(w)[0] for w in wavs]

    model, variables = _model_and_vars(h=8, layers=2)

    solo_outs = []
    for x in signals:
        sv = StreamingVAD(model, variables, block_frames=8,
                          fixed_peak=float(np.max(np.abs(x))))
        solo_outs.append(np.concatenate([sv.feed(x), sv.flush()]))

    # bulk-feeding whole utterances: give the backlog cap headroom (the
    # strict post-feed bound is exercised by test_multistream_backlog_caps)
    ms = MultiStreamVAD(model, variables, n_streams=3, block_frames=8,
                        max_backlog_blocks=256)
    for i, x in enumerate(signals):
        ms.feed(i, x)  # peak becomes the global max, like fixed_peak above
    collected = [[] for _ in range(3)]
    while True:
        out = ms.tick()
        if not out:
            break
        for i, p in out.items():
            collected[i].append(p)

    for i in range(3):
        got = np.concatenate(collected[i])
        want = solo_outs[i][: len(got)]
        assert len(got) >= len(solo_outs[i]) - 8  # tail < one block differs
        np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_multistream_av_matches_solo_streams(ref_subset):
    """Each stream of MultiStreamAVVAD must match a solo StreamingAVVAD run
    (MCB fusion, per-stream L2 norm), including when one stream's video
    lags behind its audio — the gated hub assemble must hold that stream
    back without dropping samples."""
    import glob

    from avvad_tpu.models import AVVAD
    from avvad_tpu.serve import MultiStreamAVVAD, StreamingAVVAD

    wavs = sorted(glob.glob(os.path.join(
        ref_subset, "processed/ntcd_timit/Clean/**/*.wav"), recursive=True))[:2]
    signals = [read_wav(w)[0][:16000] for w in wavs]
    cfg = STFTConfig()
    rng = np.random.default_rng(7)

    def n_frames(x):
        return 1 + (len(x) - cfg.nfft) // cfg.hopsamp

    videos = [rng.normal(size=(n_frames(x), 67, 67)).astype(np.float32)
              for x in signals]

    model = AVVAD(y_dim=1, lstm_hidden_size=16, lstm_layers=2, use_mcb=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 513)),
                           jnp.zeros((1, 8, 67, 67)))

    bf = 8
    solo_outs = []
    for x, v in zip(signals, videos):
        sv = StreamingAVVAD(model, variables, stft_cfg=cfg, block_frames=bf,
                            fixed_peak=float(np.max(np.abs(x))))
        solo_outs.append(np.concatenate([sv.feed(x, v), sv.flush()]))

    ms = MultiStreamAVVAD(model, variables, n_streams=2, stft_cfg=cfg,
                          block_frames=bf)
    # stream 0: both modalities up front; stream 1: audio up front, video
    # dripped one block per tick (gate exercises)
    ms.feed(0, pcm=signals[0], video_frames=videos[0])
    ms.feed(1, pcm=signals[1])
    collected = [[] for _ in range(2)]
    v1_pos = 0
    for _ in range(64):
        if v1_pos < len(videos[1]):
            ms.feed(1, video_frames=videos[1][v1_pos:v1_pos + bf])
            v1_pos += bf
        out = ms.tick()
        if not out and v1_pos >= len(videos[1]):
            break
        for i, p in out.items():
            collected[i].append(p)

    for i in range(2):
        got = np.concatenate(collected[i])
        want = solo_outs[i][: len(got)]
        assert len(got) >= len(solo_outs[i]) - bf  # tail < one block differs
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=f"stream {i}")


def test_multistream_av_uint8_video_wire():
    """uint8 video wire + on-device dequant: bit-identical to the float
    path for integer-valued [0,255] frames (lip crops are min-max
    normalized to that range by construction), and within quantization
    tolerance for fractional ones."""
    from avvad_tpu.models import AVVAD
    from avvad_tpu.serve import MultiStreamAVVAD

    model = AVVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1, use_mcb=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 513)),
                           jnp.zeros((1, 4, 67, 67)))
    rng = np.random.default_rng(5)
    pcm = rng.normal(size=4096).astype(np.float32)
    vid_int = rng.integers(0, 256, size=(8, 67, 67)).astype(np.float32)

    outs = {}
    for u8 in (False, True):
        ms = MultiStreamAVVAD(model, variables, n_streams=1, block_frames=4,
                              video_uint8=u8)
        assert ms._vout.dtype == (np.uint8 if u8 else np.float32)
        ms.feed(0, pcm=pcm, video_frames=vid_int)
        got = []
        for _ in range(4):
            out = ms.tick()
            if 0 in out:
                got.append(out[0])
        outs[u8] = np.concatenate(got)
    np.testing.assert_allclose(outs[True], outs[False], atol=0)

    # fractional frames: quantization-bounded difference, not garbage
    vid_frac = (vid_int + rng.uniform(-0.49, 0.49, vid_int.shape)
                ).astype(np.float32).clip(0, 255)
    outs = {}
    for u8 in (False, True):
        ms = MultiStreamAVVAD(model, variables, n_streams=1, block_frames=4,
                              video_uint8=u8)
        ms.feed(0, pcm=pcm, video_frames=vid_frac)
        got = []
        for _ in range(4):
            out = ms.tick()
            if 0 in out:
                got.append(out[0])
        outs[u8] = np.concatenate(got)
    np.testing.assert_allclose(outs[True], outs[False], atol=0.02)


def test_multistream_av_reset_stream():
    """Recycling one AV stream slot clears its buffers and carries without
    disturbing the other streams."""
    from avvad_tpu.models import AVVAD
    from avvad_tpu.serve import MultiStreamAVVAD

    model = AVVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1, use_mcb=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 513)),
                           jnp.zeros((1, 4, 67, 67)))
    ms = MultiStreamAVVAD(model, variables, n_streams=2, block_frames=4)
    rng = np.random.default_rng(0)
    pcm = rng.normal(size=4096).astype(np.float32)
    vid = rng.normal(size=(8, 67, 67)).astype(np.float32)
    ms.feed(0, pcm=pcm, video_frames=vid)
    ms.feed(1, pcm=pcm, video_frames=vid)
    out = ms.tick()
    assert sorted(out) == [0, 1]
    h_before = np.asarray(ms._carries[0][0])
    assert np.abs(h_before[1]).max() > 0
    ms.reset_stream(1)
    assert len(ms._vbufs[1]) == 0
    h_after = np.asarray(ms._carries[0][0])
    assert np.abs(h_after[1]).max() == 0        # recycled slot zeroed
    np.testing.assert_array_equal(h_after[0], h_before[0])  # other intact


@pytest.mark.slow
def test_streaming_video_matches_offline():
    """Video-only streaming must equal the offline VideoVAD forward of
    the same frames (the tower is frame-local; only the LSTM carries
    cross blocks), including a non-block-aligned tail via flush()."""
    from avvad_tpu.models import VideoVAD
    from avvad_tpu.serve import StreamingVideoVAD

    model = VideoVAD(y_dim=1, lstm_hidden_size=16, lstm_layers=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 67, 67)))
    rng = np.random.default_rng(2)
    video = (rng.random((37, 67, 67)) * 255).astype(np.float32)

    offline = np.asarray(jax.nn.sigmoid(
        model.apply(variables, jnp.asarray(video)[None])[0, :, 0]))

    sv = StreamingVideoVAD(model, variables, block_frames=8)
    got = [sv.feed(video[:5]), sv.feed(video[5:20]), sv.feed(video[20:]),
           sv.flush()]
    got = np.concatenate(got)
    assert got.shape == offline.shape
    np.testing.assert_allclose(got, offline, atol=1e-5)

    # uint8 wire parity: integer-valued frames are bit-identical
    vu = np.round(video)
    sv8 = StreamingVideoVAD(model, variables, block_frames=8,
                            video_uint8=True)
    got8 = np.concatenate([sv8.feed(vu), sv8.flush()])
    ref = StreamingVideoVAD(model, variables, block_frames=8)
    ref8 = np.concatenate([ref.feed(vu), ref.flush()])
    np.testing.assert_allclose(got8, ref8, atol=1e-6)


def test_multistream_video_matches_solo_streams():
    """N batched video streams (masked carries) == N solo runs, with
    ragged per-stream progress."""
    from avvad_tpu.models import VideoVAD
    from avvad_tpu.serve import MultiStreamVideoVAD, StreamingVideoVAD

    model = VideoVAD(y_dim=1, lstm_hidden_size=16, lstm_layers=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 67, 67)))
    rng = np.random.default_rng(3)
    vids = [(rng.random((n, 67, 67)) * 255).astype(np.float32)
            for n in (40, 24, 33)]

    solo = []
    for v in vids:
        sv = StreamingVideoVAD(model, variables, block_frames=8)
        solo.append(np.concatenate([sv.feed(v), sv.flush()]))

    ms = MultiStreamVideoVAD(model, variables, n_streams=3, block_frames=8,
                             max_backlog_blocks=256)
    for i, v in enumerate(vids):
        ms.feed(i, video_frames=v)
    outs = [[] for _ in range(3)]
    for _ in range(6):
        for i, p in ms.tick().items():
            outs[i].append(p)
    for i, v in enumerate(vids):
        n = (len(v) // 8) * 8  # multi-stream emits full blocks only
        got = np.concatenate(outs[i]) if outs[i] else np.zeros(0)
        np.testing.assert_allclose(got[:n], solo[i][:n], atol=1e-5)

    # audio payloads are rejected (the serving front drops such clients)
    import pytest

    with pytest.raises(ValueError, match="audio payload"):
        ms.feed(0, pcm=np.zeros(100, np.float32))


def test_hub_span_assembly_matches_frames():
    """assemble(span=True) must emit the contiguous sample span whose
    on-device framing (ops/stft.frame_signal) reproduces assemble()'s
    materialized windows exactly, with identical consume/gate/peak
    semantics — in both the native (C++) and pure-Python hubs."""
    import pytest

    from avvad_tpu.native import StreamHub
    from avvad_tpu.ops.stft import frame_signal

    nfft, hop, bf = 64, 16, 4
    rng = np.random.default_rng(11)
    feeds = [rng.normal(size=n).astype(np.float32)
             for n in (500, 140, 380)]

    for force_py in (False, True):
        hub_f = StreamHub(3, nfft, hop, bf, force_python=force_py)
        hub_s = StreamHub(3, nfft, hop, bf, force_python=force_py)
        if not force_py and not hub_f.is_native:
            pytest.skip("native library unavailable")
        assert hub_s.span == (bf - 1) * hop + nfft
        for i, x in enumerate(feeds):
            hub_f.feed(i, x)
            hub_s.feed(i, x)
        gates = [None, np.array([1.0, 0.0, 1.0], np.float32), None]
        for gate in gates:
            bl_f, pk_f, ac_f, n_f = hub_f.assemble(gate=gate)
            bl_f, pk_f, ac_f = bl_f.copy(), pk_f.copy(), ac_f.copy()
            bl_s, pk_s, ac_s, n_s = hub_s.assemble(gate=gate, span=True)
            assert n_f == n_s
            np.testing.assert_array_equal(ac_f, ac_s)
            np.testing.assert_array_equal(pk_f, pk_s)
            framed = np.asarray(frame_signal(jnp.asarray(bl_s), nfft, hop))
            for i in range(3):
                if ac_f[i]:
                    np.testing.assert_array_equal(framed[i], bl_f[i])
        # mid-run reset keeps the two consumption states in lockstep
        hub_f.reset_stream(0)
        hub_s.reset_stream(0)
        hub_f.feed(0, feeds[0][:300])
        hub_s.feed(0, feeds[0][:300])
        bl_f, _, ac_f, _ = hub_f.assemble()
        bl_s, _, ac_s, _ = hub_s.assemble(span=True)
        np.testing.assert_array_equal(ac_f, ac_s)
        framed = np.asarray(frame_signal(jnp.asarray(bl_s), nfft, hop))
        for i in range(3):
            if ac_f[i]:
                np.testing.assert_array_equal(framed[i], bl_f[i].copy())


def test_multistream_span_wire_bitexact(ref_subset):
    """span_wire=True ships ~nfft/hop less audio per tick and frames on
    device — the probabilities must be BIT-identical to the frames wire
    (same floats through the same windowed-DFT math)."""
    from avvad_tpu.serve import MultiStreamVAD

    wavs = sorted(glob.glob(os.path.join(
        ref_subset, "processed/ntcd_timit/Clean/**/*.wav"), recursive=True))[:3]
    signals = [read_wav(w)[0][:12000] for w in wavs]
    model, variables = _model_and_vars(h=8, layers=2)

    def run(**kw):
        ms = MultiStreamVAD(model, variables, n_streams=3, block_frames=8,
                            max_backlog_blocks=256, **kw)
        for i, x in enumerate(signals):
            ms.feed(i, x)
        out = [[] for _ in range(3)]
        while True:
            r = ms.tick()
            if not r:
                break
            for i, p in r.items():
                out[i].append(p)
        return [np.concatenate(o) for o in out]

    base = run()
    span = run(span_wire=True)
    for i in range(3):
        np.testing.assert_array_equal(span[i], base[i])

    # hop-DFT frontend on the span: fp32-rounding-level agreement
    hop = run(span_wire=True, hop_dft=True)
    for i in range(3):
        np.testing.assert_allclose(hop[i], base[i], atol=1e-5)

    import pytest

    with pytest.raises(ValueError, match="span_wire"):
        MultiStreamVAD(model, variables, n_streams=3, hop_dft=True)


@pytest.mark.slow
def test_multistream_av_span_wire_bitexact():
    """AV span wire (+ uint8 video): bit-identical to the frames wire,
    including a stream whose video lags (the gated span assemble must
    hold its samples exactly like the frames assemble)."""
    from avvad_tpu.models import AVVAD
    from avvad_tpu.serve import MultiStreamAVVAD

    rng = np.random.default_rng(5)
    cfg = STFTConfig()
    bf = 8
    signals = [rng.normal(size=n).astype(np.float32) * 0.3
               for n in (9000, 7000)]
    videos = [np.round(rng.random((30, 67, 67)) * 255).astype(np.float32)
              for _ in signals]

    model = AVVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1, use_mcb=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 513)),
                           jnp.zeros((1, 4, 67, 67)))

    def run(**kw):
        ms = MultiStreamAVVAD(model, variables, n_streams=2, stft_cfg=cfg,
                              block_frames=bf, video_uint8=True, **kw)
        ms.feed(0, pcm=signals[0], video_frames=videos[0])
        ms.feed(1, pcm=signals[1])  # video drips: exercises the gate
        out = [[] for _ in range(2)]
        v1 = 0
        for _ in range(16):
            if v1 < len(videos[1]):
                ms.feed(1, video_frames=videos[1][v1:v1 + bf])
                v1 += bf
            r = ms.tick()
            if not r and v1 >= len(videos[1]):
                break
            for i, p in r.items():
                out[i].append(p)
        return [np.concatenate(o) if o else np.zeros(0) for o in out]

    base = run()
    span = run(span_wire=True)
    for i in range(2):
        assert len(base[i]) > 0
        np.testing.assert_array_equal(span[i], base[i])

    hop = run(span_wire=True, hop_dft=True)
    for i in range(2):
        np.testing.assert_allclose(hop[i], base[i], atol=1e-5)


@pytest.mark.slow
def test_multistream_av_camera_rate_video_bitexact():
    """Camera-rate video ingestion (video_fps=30): feeding 30 fps source
    frames must be bit-identical to feeding the pre-upsampled 62.5 fps
    stream — the tower runs on each block's unique frames and features
    gather onto the audio timeline per stream (fps_block_schedule is the
    exact ffmpeg duplication schedule). Covers multiple ticks (both 8-
    and 9-source-frame phases at bf=16), a stream whose video lags, and
    the uint8 wire."""
    from avvad_tpu.models import AVVAD
    from avvad_tpu.processing.video import upsample_video
    from avvad_tpu.serve import MultiStreamAVVAD

    rng = np.random.default_rng(7)
    cfg = STFTConfig()
    bf = 16
    # 60 source frames -> 125 upsampled frames -> 7 full blocks
    signals = [rng.normal(size=40000).astype(np.float32) * 0.3
               for _ in range(2)]
    src = [np.round(rng.random((60, 67, 67)) * 255).astype(np.float32)
           for _ in range(2)]

    model = AVVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1, use_mcb=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 513)),
                           jnp.zeros((1, 4, 67, 67)))

    def run(video_fps, videos, drip):
        ms = MultiStreamAVVAD(model, variables, n_streams=2, stft_cfg=cfg,
                              block_frames=bf, video_uint8=True,
                              video_fps=video_fps)
        ms.feed(0, pcm=signals[0], video_frames=videos[0])
        ms.feed(1, pcm=signals[1])  # video drips: exercises the gate
        out = [[] for _ in range(2)]
        v1 = 0
        for _ in range(24):
            if v1 < len(videos[1]):
                ms.feed(1, video_frames=videos[1][v1:v1 + drip])
                v1 += drip
            r = ms.tick()
            if not r and v1 >= len(videos[1]):
                break
            for i, p in r.items():
                out[i].append(p)
        return [np.concatenate(o) if o else np.zeros(0) for o in out]

    base = run(None, [upsample_video(v) for v in src], drip=11)
    cam = run(30.0, src, drip=5)
    for i in range(2):
        assert len(base[i]) >= 7 * bf
        assert len(cam[i]) == len(base[i])
        np.testing.assert_array_equal(cam[i], base[i])

    # reset_stream resets the resample phase: a recycled slot replays
    # identically to a fresh one
    ms = MultiStreamAVVAD(model, variables, n_streams=1, stft_cfg=cfg,
                          block_frames=bf, video_uint8=True, video_fps=30.0)
    ms.feed(0, pcm=signals[0], video_frames=src[0])
    first = ms.tick()[0]
    ms.reset_stream(0)
    ms.feed(0, pcm=signals[0], video_frames=src[0])
    np.testing.assert_array_equal(ms.tick()[0], first)

    import pytest

    with pytest.raises(ValueError, match="exceeds the"):
        MultiStreamAVVAD(model, variables, n_streams=1, video_fps=90.0)


@pytest.mark.slow
def test_multistream_video_camera_rate_bitexact():
    """Video-only camera-rate ingestion: bit-identical to feeding the
    pre-upsampled 62.5 fps stream (tower on unique frames + per-stream
    feature gather), across ticks and a mid-stream reset."""
    from avvad_tpu.models import VideoVAD
    from avvad_tpu.processing.video import upsample_video
    from avvad_tpu.serve import MultiStreamVideoVAD

    rng = np.random.default_rng(11)
    bf = 16
    src = [np.round(rng.random((50, 67, 67)) * 255).astype(np.float32)
           for _ in range(2)]

    model = VideoVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 67, 67)))

    def run(video_fps, videos):
        ms = MultiStreamVideoVAD(model, variables, n_streams=2,
                                 block_frames=bf, video_uint8=True,
                                 video_fps=video_fps)
        out = [[] for _ in range(2)]
        ms.feed(0, video_frames=videos[0])
        fed = 0
        for _ in range(16):
            if fed < len(videos[1]):   # stream 1 drips
                ms.feed(1, video_frames=videos[1][fed:fed + 7])
                fed += 7
            r = ms.tick()
            if not r and fed >= len(videos[1]):
                break
            for i, p in r.items():
                out[i].append(p)
        return [np.concatenate(o) if o else np.zeros(0) for o in out]

    base = run(None, [upsample_video(v) for v in src])
    cam = run(30.0, src)
    for i in range(2):
        assert len(base[i]) >= 6 * bf
        assert len(cam[i]) == len(base[i])
        np.testing.assert_array_equal(cam[i], base[i])


def test_multistream_int16_wire_bitexact(ref_subset):
    """audio_int16 span wire: feeding raw int16 PCM must produce
    BIT-identical probabilities to the float32 wire fed the same
    int16-origin samples — the device frontend divides the cast samples
    by the int-domain peak, the once-rounded quotient of the same real
    ratio. Also composes with hop_dft, and rejects float feeds and
    non-span construction."""
    import pytest

    from avvad_tpu.serve import MultiStreamVAD

    wavs = sorted(glob.glob(os.path.join(
        ref_subset, "processed/ntcd_timit/Clean/**/*.wav"), recursive=True))[:3]
    # wav fixtures are 16-bit PCM: recover the exact int16 grid
    sig_f = [read_wav(w)[0][:12000] for w in wavs]
    sig_i = [np.round(x * 32768.0).astype(np.int16) for x in sig_f]
    for f, i in zip(sig_f, sig_i):
        np.testing.assert_array_equal(i.astype(np.float32) / 32768.0, f)
    model, variables = _model_and_vars(h=8, layers=2)

    def run(signals, **kw):
        ms = MultiStreamVAD(model, variables, n_streams=3, block_frames=8,
                            max_backlog_blocks=256, span_wire=True, **kw)
        for i, x in enumerate(signals):
            ms.feed(i, x)
        out = [[] for _ in range(3)]
        while True:
            r = ms.tick()
            if not r:
                break
            for i, p in r.items():
                out[i].append(p)
        return [np.concatenate(o) for o in out]

    base = run(sig_f)
    i16 = run(sig_i, audio_int16=True)
    for i in range(3):
        np.testing.assert_array_equal(i16[i], base[i])

    i16_hop = run(sig_i, audio_int16=True, hop_dft=True)
    base_hop = run(sig_f, hop_dft=True)
    for i in range(3):
        np.testing.assert_array_equal(i16_hop[i], base_hop[i])

    with pytest.raises(ValueError, match="span_wire"):
        MultiStreamVAD(model, variables, n_streams=3, audio_int16=True)
    ms = MultiStreamVAD(model, variables, n_streams=3, span_wire=True,
                        audio_int16=True)
    with pytest.raises(TypeError, match="int16"):
        ms.feed(0, sig_f[0])


def test_multistream_av_int16_wire_bitexact():
    """AV audio_int16 + uint8 video: bit-identical to the float32 span
    wire, including a video-lagging stream (the int16 gated span assemble
    must hold samples exactly like the float one)."""
    from avvad_tpu.models import AVVAD
    from avvad_tpu.serve import MultiStreamAVVAD

    rng = np.random.default_rng(13)
    cfg = STFTConfig()
    bf = 8
    sig_i = [rng.integers(-32768, 32768, size=n, dtype=np.int16)
             for n in (9000, 7000)]
    sig_f = [x.astype(np.float32) / 32768.0 for x in sig_i]
    videos = [np.round(rng.random((30, 67, 67)) * 255).astype(np.float32)
              for _ in sig_i]

    model = AVVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1, use_mcb=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 513)),
                           jnp.zeros((1, 4, 67, 67)))

    def run(signals, **kw):
        ms = MultiStreamAVVAD(model, variables, n_streams=2, stft_cfg=cfg,
                              block_frames=bf, video_uint8=True,
                              span_wire=True, **kw)
        ms.feed(0, pcm=signals[0], video_frames=videos[0])
        ms.feed(1, pcm=signals[1])  # video drips: exercises the gate
        out = [[] for _ in range(2)]
        v1 = 0
        for _ in range(16):
            if v1 < len(videos[1]):
                ms.feed(1, video_frames=videos[1][v1:v1 + bf])
                v1 += bf
            r = ms.tick()
            if not r and v1 >= len(videos[1]):
                break
            for i, p in r.items():
                out[i].append(p)
        return [np.concatenate(o) if o else np.zeros(0) for o in out]

    base = run(sig_f)
    i16 = run(sig_i, audio_int16=True)
    for i in range(2):
        assert len(base[i]) > 0
        np.testing.assert_array_equal(i16[i], base[i])


def test_tick_pipelined_matches_sync_one_tick_late():
    """tick_pipelined returns exactly the sync tick's probabilities,
    delayed one tick, with flush_pipelined draining the tail."""
    from avvad_tpu.serve import MultiStreamVAD

    model, variables = _model_and_vars(h=8)
    rng = np.random.default_rng(0)
    chunks = [rng.normal(size=4 * 256 + 768).astype(np.float32) * 0.1] + \
             [rng.normal(size=4 * 256).astype(np.float32) * 0.1
              for _ in range(5)]

    def play(pipelined):
        ms = MultiStreamVAD(model, variables, n_streams=2, block_frames=4)
        outs = []
        for c in chunks:
            for i in range(2):
                ms.feed(i, c)
            outs.append(ms.tick_pipelined() if pipelined
                        else ms.tick(fetch=True))
        # trailing EMPTY ticks: the pending result must survive them (the
        # hub reuses its assemble buffers — regression guard for the
        # in-place active-mask zeroing bug)
        for _ in range(2):
            outs.append(ms.tick_pipelined() if pipelined
                        else ms.tick(fetch=True))
        if pipelined:
            outs.append(ms.flush_pipelined())
        return outs

    sync, piped = play(False), play(True)
    assert piped[0] == {}  # nothing pending on the first tick
    # every sync tick's output reappears one position later
    for t, want in enumerate(sync[:len(chunks)]):
        got = piped[t + 1]
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_allclose(got[k], want[k], atol=1e-6)
    # per-stream concatenation must be identical overall (catches results
    # lost across trailing empty ticks / the flush)
    for i in range(2):
        want = np.concatenate([o[i] for o in sync if i in o])
        got = np.concatenate([o[i] for o in piped if i in o])
        np.testing.assert_allclose(got, want, atol=1e-6)
    # flush with nothing pending is a clean no-op
    ms = MultiStreamVAD(model, variables, n_streams=1, block_frames=4)
    assert ms.flush_pipelined() == {}


def test_reset_stream_cancels_pending_pipelined_result():
    """A recycled slot must NOT deliver the in-flight pipelined result of
    the stream that previously owned it (cross-client data delivery —
    advisor finding r4). reset_stream scrubs the slot from the pending
    tick; other streams' pending results are unaffected; reset() drops
    the whole pending tick."""
    from avvad_tpu.serve import MultiStreamVAD

    model, variables = _model_and_vars(h=8)
    rng = np.random.default_rng(1)
    pcm = rng.normal(size=4 * 256 + 768).astype(np.float32) * 0.1

    ms = MultiStreamVAD(model, variables, n_streams=2, block_frames=4)
    ms.feed(0, pcm)
    ms.feed(1, pcm)
    assert ms.tick_pipelined() == {}          # both results now in flight
    assert ms.pending_streams() == {0, 1}
    ms.reset_stream(0)                        # slot 0 recycled mid-flight
    assert ms.pending_streams() == {1}
    out = ms.flush_pipelined()
    assert set(out) == {1}                    # slot 0's stale probs gone

    # whole-streamer reset drops the pending tick entirely
    ms.feed(0, pcm)
    ms.feed(1, pcm)
    assert ms.tick_pipelined() == {}
    ms.reset()
    assert ms.pending_streams() == set()
    assert ms.flush_pipelined() == {}
