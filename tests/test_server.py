"""TCP serving front: per-connection streams must match single-stream
classification, and slots must recycle."""

import socket
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avvad_tpu.models import AudioVAD
from avvad_tpu.serve import MultiStreamVAD, StreamingVAD
from avvad_tpu.server import VADServer, stream_client


def _model_and_vars(h=16, layers=2):
    model = AudioVAD(y_dim=1, lstm_hidden_size=h, lstm_layers=layers)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 513)))
    return model, variables


def _signals(n, samples=12000):
    rng = np.random.default_rng(7)
    out = []
    for _ in range(n):
        s = np.clip(rng.normal(size=samples) * 0.2, -1, 1).astype(np.float32)
        # pin the running peak from the very first sample so the causal
        # peak normalization is independent of server tick timing
        s[0] = 1.0
        out.append(s)
    return out


def test_server_round_trip_matches_single_stream():
    model, variables = _model_and_vars()
    bf = 8
    ms = MultiStreamVAD(model, variables, n_streams=4, block_frames=bf)
    server = VADServer(ms)
    t = threading.Thread(target=server.serve_forever,
                        kwargs={"timeout": 0.002}, daemon=True)
    t.start()
    try:
        signals = _signals(2)
        cfg = ms.cfg
        n_frames = [1 + (len(s) - cfg.nfft) // cfg.hopsamp for s in signals]
        n_out = [(f // bf) * bf for f in n_frames]

        results = [None, None]
        errs = []

        def run(i):
            try:
                results[i] = stream_client(server.address, signals[i],
                                           n_out[i])
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=60)
        assert not errs, errs

        # oracle: each signal alone through a StreamingVAD
        for i, sig in enumerate(signals):
            sv = StreamingVAD(model, variables, block_frames=bf,
                              fixed_peak=1.0)
            ref = np.concatenate([sv.feed(sig), sv.flush()])[: n_out[i]]
            assert results[i] is not None and len(results[i]) == n_out[i]
            np.testing.assert_allclose(results[i], ref, atol=1e-5,
                                       err_msg=f"stream {i}")
    finally:
        server.stop()
        t.join(timeout=10)
        server.close()


def test_server_slot_recycling():
    model, variables = _model_and_vars(h=8, layers=1)
    ms = MultiStreamVAD(model, variables, n_streams=1, block_frames=4)
    server = VADServer(ms)
    t = threading.Thread(target=server.serve_forever,
                        kwargs={"timeout": 0.002}, daemon=True)
    t.start()
    try:
        sig = _signals(1, samples=6000)[0]
        cfg = ms.cfg
        nf = 1 + (len(sig) - cfg.nfft) // cfg.hopsamp
        n_out = (nf // 4) * 4
        # two sequential sessions on the single slot: identical results
        # prove the slot state (buffer, peak, carries) was recycled
        a = stream_client(server.address, sig, n_out)
        b = stream_client(server.address, sig, n_out)
        np.testing.assert_allclose(a, b, atol=0)

        # with the slot held, an extra connection is refused
        hold = socket.create_connection(server.address, timeout=5)
        try:
            hold.sendall(b"\x00\x00\x00\x00")
            extra = socket.create_connection(server.address, timeout=5)
            extra.settimeout(5)
            assert extra.recv(1) == b""  # server closed it immediately
            extra.close()
        finally:
            hold.close()
    finally:
        server.stop()
        t.join(timeout=10)
        server.close()


def test_server_emits_tail_after_half_close():
    """A client that half-closes (shutdown(SHUT_WR)) after sending must
    still receive probabilities for every block fully buffered at close
    time — EOF defers the drop until the buffered blocks have drained."""
    model, variables = _model_and_vars(h=8, layers=1)
    bf = 4
    ms = MultiStreamVAD(model, variables, n_streams=2, block_frames=bf)
    server = VADServer(ms)
    t = threading.Thread(target=server.serve_forever,
                         kwargs={"timeout": 0.002, "warmup": False},
                         daemon=True)
    t.start()
    try:
        sig = _signals(1, samples=12000)[0]
        cfg = ms.cfg
        nf = 1 + (len(sig) - cfg.nfft) // cfg.hopsamp
        n_out = (nf // bf) * bf
        want = n_out * 4
        with socket.create_connection(server.address, timeout=10) as s:
            s.settimeout(10)
            # send EVERYTHING, then half-close before reading anything —
            # several full blocks are still buffered server-side here
            s.sendall(np.asarray(sig, dtype="<f4").tobytes())
            s.shutdown(socket.SHUT_WR)
            out = b""
            while len(out) < want:
                part = s.recv(1 << 20)
                if not part:
                    break
                out += part
        got = np.frombuffer(out, dtype="<f4")
        sv = StreamingVAD(model, variables, block_frames=bf, fixed_peak=1.0)
        ref = np.concatenate([sv.feed(sig), sv.flush()])[:n_out]
        assert len(got) == n_out, (len(got), n_out)
        np.testing.assert_allclose(got, ref, atol=1e-5)
    finally:
        server.stop()
        t.join(timeout=10)
        server.close()


def test_multistream_backlog_caps():
    """Per-stream backlogs are bounded: a client pushing one modality far
    ahead (or audio far past the drain rate) raises instead of growing
    server memory without limit."""
    import pytest

    from avvad_tpu.models import AVVAD
    from avvad_tpu.serve import MultiStreamAVVAD

    model = AVVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1, use_mcb=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 513)),
                           jnp.zeros((1, 4, 67, 67)))
    ms = MultiStreamAVVAD(model, variables, n_streams=1, block_frames=4,
                          max_backlog_blocks=2)
    cap_frames = 2 * 4
    # video-only flood: fine up to exactly the cap, then refused — and a
    # SINGLE oversized message is refused too (the bound is on the
    # post-feed state, not the pre-feed state, so one big message cannot
    # overshoot it)
    ms.feed(0, video_frames=np.zeros((cap_frames, 67, 67), np.float32))
    with pytest.raises(ValueError, match="video backlog"):
        ms.feed(0, video_frames=np.zeros((1, 67, 67), np.float32))
    # audio-only flood on the other modality: cap_frames buffered is fine,
    # one more frame's worth of samples is refused
    cfg = ms.cfg
    samples_per_cap = cfg.nfft + cfg.hopsamp * (cap_frames - 1)
    ms.feed(0, pcm=np.zeros(samples_per_cap, np.float32))
    with pytest.raises(ValueError, match="audio backlog"):
        ms.feed(0, pcm=np.zeros(cfg.hopsamp, np.float32))
    # a SINGLE oversized message is refused too: the bound is on the
    # post-feed state, so one big message cannot overshoot it
    ms2 = MultiStreamAVVAD(model, variables, n_streams=1, block_frames=4,
                           max_backlog_blocks=2)
    with pytest.raises(ValueError, match="audio backlog"):
        ms2.feed(0, pcm=np.zeros(cfg.nfft + cfg.hopsamp * 100 * cap_frames,
                                 np.float32))
    with pytest.raises(ValueError, match="video backlog"):
        ms2.feed(0, video_frames=np.zeros((10 * cap_frames, 67, 67),
                                          np.float32))
    # draining via ticks frees budget again
    ms.tick()
    ms.feed(0, pcm=np.zeros(cfg.hopsamp, np.float32))
    ms.feed(0, video_frames=np.zeros((1, 67, 67), np.float32))

    audio_only = MultiStreamVAD(
        AudioVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1),
        _model_and_vars(h=8, layers=1)[1], n_streams=1, block_frames=4,
        max_backlog_blocks=2)
    audio_only.feed(0, np.zeros(samples_per_cap, np.float32))
    with pytest.raises(ValueError, match="audio backlog"):
        audio_only.feed(0, np.zeros(cfg.hopsamp, np.float32))


def test_av_server_round_trip_matches_solo_stream():
    """Framed A/V protocol: a TCP connection feeding interleaved PCM +
    lip-frame messages must match a solo StreamingAVVAD run."""
    from avvad_tpu.models import AVVAD
    from avvad_tpu.serve import MultiStreamAVVAD, StreamingAVVAD
    from avvad_tpu.server import av_stream_client

    model = AVVAD(y_dim=1, lstm_hidden_size=16, lstm_layers=2, use_mcb=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 513)),
                           jnp.zeros((1, 8, 67, 67)))
    bf = 8
    ms = MultiStreamAVVAD(model, variables, n_streams=2, block_frames=bf)
    server = VADServer(ms)
    t = threading.Thread(target=server.serve_forever,
                        kwargs={"timeout": 0.002}, daemon=True)
    t.start()
    try:
        sig = _signals(1, samples=9000)[0]
        cfg = ms.cfg
        n_frames = 1 + (len(sig) - cfg.nfft) // cfg.hopsamp
        rng = np.random.default_rng(3)
        video = rng.normal(size=(n_frames, 67, 67)).astype(np.float32)
        n_out = (n_frames // bf) * bf

        got = av_stream_client(server.address, sig, video, n_out)

        sv = StreamingAVVAD(model, variables, block_frames=bf,
                            fixed_peak=1.0)
        ref = np.concatenate([sv.feed(sig, video), sv.flush()])[:n_out]
        assert len(got) == n_out
        np.testing.assert_allclose(got, ref, atol=1e-5)
    finally:
        server.stop()
        t.join(timeout=10)
        server.close()


def test_av_server_uint8_video_wire_matches_float():
    """Type-U (uint8) lip-frame messages through the TCP front must give
    the same probabilities as the float path for integer-valued frames."""
    from avvad_tpu.models import AVVAD
    from avvad_tpu.serve import MultiStreamAVVAD
    from avvad_tpu.server import av_stream_client

    model = AVVAD(y_dim=1, lstm_hidden_size=16, lstm_layers=1, use_mcb=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 513)),
                           jnp.zeros((1, 8, 67, 67)))
    bf = 8
    ms = MultiStreamAVVAD(model, variables, n_streams=2, block_frames=bf,
                          video_uint8=True)
    server = VADServer(ms)
    t = threading.Thread(target=server.serve_forever,
                         kwargs={"timeout": 0.002}, daemon=True)
    t.start()
    try:
        sig = _signals(1, samples=9000)[0]
        cfg = ms.cfg
        n_frames = 1 + (len(sig) - cfg.nfft) // cfg.hopsamp
        rng = np.random.default_rng(3)
        video = rng.integers(0, 256, size=(n_frames, 67, 67)
                             ).astype(np.float32)
        n_out = (n_frames // bf) * bf
        got_u8 = av_stream_client(server.address, sig, video, n_out,
                                  video_wire="u8")
        got_f32 = av_stream_client(server.address, sig, video, n_out,
                                   video_wire="f32")
        assert len(got_u8) == n_out
        np.testing.assert_allclose(got_u8, got_f32, atol=0)
    finally:
        server.stop()
        t.join(timeout=10)
        server.close()


def test_av_server_drops_malformed_connection():
    """A connection sending an unknown message type is dropped and its
    slot recycled; the listener keeps serving."""
    import socket as socket_mod

    from avvad_tpu.models import AVVAD
    from avvad_tpu.serve import MultiStreamAVVAD

    model = AVVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1, use_mcb=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 513)),
                           jnp.zeros((1, 4, 67, 67)))
    ms = MultiStreamAVVAD(model, variables, n_streams=1, block_frames=4)
    server = VADServer(ms)
    t = threading.Thread(target=server.serve_forever,
                        kwargs={"timeout": 0.002, "warmup": False},
                        daemon=True)
    t.start()
    try:
        with socket_mod.create_connection(server.address, timeout=5) as s:
            s.sendall(b"X" + (4).to_bytes(4, "little") + b"\0\0\0\0")
            import time as time_mod
            deadline = time_mod.time() + 5
            # wait on _free (the LAST step of _drop) — _conn_slot empties
            # earlier, mid-drop
            while server._free != [0] and time_mod.time() < deadline:
                time_mod.sleep(0.01)
        assert not server._conn_slot          # dropped
        assert server._free == [0]            # slot recycled
    finally:
        server.stop()
        t.join(timeout=10)
        server.close()


def test_av_server_drops_on_disconnect_with_partial_message():
    """A client that disconnects mid-message must be dropped and its slot
    recycled (a dead socket must not spin the selector or leak the slot)."""
    import socket as socket_mod
    import time as time_mod

    from avvad_tpu.models import AVVAD
    from avvad_tpu.serve import MultiStreamAVVAD

    model = AVVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1, use_mcb=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 513)),
                           jnp.zeros((1, 4, 67, 67)))
    ms = MultiStreamAVVAD(model, variables, n_streams=1, block_frames=4)
    server = VADServer(ms)
    t = threading.Thread(target=server.serve_forever,
                        kwargs={"timeout": 0.002, "warmup": False},
                        daemon=True)
    t.start()
    try:
        s = socket_mod.create_connection(server.address, timeout=5)
        # valid header claiming 1 frame, but only half the payload
        s.sendall(b"V" + (67 * 67 * 4).to_bytes(4, "little") + b"\0" * 100)
        time_mod.sleep(0.1)
        s.close()  # EOF with a non-empty partial buffer
        deadline = time_mod.time() + 5
        while server._free != [0] and time_mod.time() < deadline:
            time_mod.sleep(0.01)
        assert server._free == [0] and not server._conn_slot
    finally:
        server.stop()
        t.join(timeout=10)
        server.close()


def test_av_server_survives_arbitrary_fragmentation():
    """The framed protocol must be invariant to TCP segmentation: the same
    wire bytes delivered in adversarially tiny/ragged fragments (headers
    split across reads, messages spanning fragments) must produce the
    same probabilities as one clean send."""
    import socket as socket_mod

    from avvad_tpu.models import AVVAD
    from avvad_tpu.serve import MultiStreamAVVAD, StreamingAVVAD
    from avvad_tpu.server import av_frame

    model = AVVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1, use_mcb=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 513)),
                           jnp.zeros((1, 4, 67, 67)))
    bf = 4
    ms = MultiStreamAVVAD(model, variables, n_streams=1, block_frames=bf)
    server = VADServer(ms)
    t = threading.Thread(target=server.serve_forever,
                        kwargs={"timeout": 0.002, "warmup": False},
                        daemon=True)
    t.start()
    try:
        sig = _signals(1, samples=6000)[0]
        cfg = ms.cfg
        n_frames = 1 + (len(sig) - cfg.nfft) // cfg.hopsamp
        rng = np.random.default_rng(11)
        video = rng.normal(size=(n_frames, 67, 67)).astype(np.float32)
        n_out = (n_frames // bf) * bf

        # the full wire byte stream: interleaved A/V messages, 4 frames per
        # video message, matching audio spans
        wire = b""
        spp = cfg.hopsamp * 4
        a_off = v_off = 0
        while a_off < len(sig) or v_off < n_frames:
            a_end = min(a_off + spp + (cfg.nfft if a_off == 0 else 0),
                        len(sig))
            if a_end > a_off:
                wire += av_frame(b"A", sig[a_off:a_end]
                                 .astype("<f4").tobytes())
                a_off = a_end
            v_end = min(v_off + 4, n_frames)
            if v_end > v_off:
                wire += av_frame(b"V", video[v_off:v_end]
                                 .astype("<f4").tobytes())
                v_off = v_end

        got = []
        with socket_mod.create_connection(server.address, timeout=30) as s:
            s.settimeout(30)
            off = 0
            while off < len(wire):
                # ragged fragments, frequently 1-3 bytes (splits headers)
                n = int(rng.integers(1, 4)) if rng.random() < 0.5 \
                    else int(rng.integers(4, 2000))
                s.sendall(wire[off:off + n])
                off += n
                # drain whatever the server emitted meanwhile
                s.settimeout(0.0)
                try:
                    part = s.recv(1 << 20)
                    if part:
                        got.append(part)
                except (BlockingIOError, socket_mod.timeout, OSError):
                    pass
                s.settimeout(30)
            while sum(len(p) for p in got) < n_out * 4:
                part = s.recv(1 << 20)
                if not part:
                    break
                got.append(part)
        probs = np.frombuffer(b"".join(got), dtype="<f4")[:n_out]

        sv = StreamingAVVAD(model, variables, block_frames=bf,
                            fixed_peak=1.0)
        ref = np.concatenate([sv.feed(sig, video), sv.flush()])[:n_out]
        assert len(probs) == n_out
        np.testing.assert_allclose(probs, ref, atol=1e-5)
    finally:
        server.stop()
        t.join(timeout=10)
        server.close()


@pytest.mark.slow
def test_video_server_round_trip_matches_solo_stream():
    """Video-only TCP mode: framed V/U messages in, probabilities out,
    equal to a solo StreamingVideoVAD; A payloads drop the connection."""
    import socket as socket_mod

    from avvad_tpu.models import VideoVAD
    from avvad_tpu.serve import MultiStreamVideoVAD, StreamingVideoVAD
    from avvad_tpu.server import av_frame, video_stream_client

    model = VideoVAD(y_dim=1, lstm_hidden_size=16, lstm_layers=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 67, 67)))
    bf = 8
    ms = MultiStreamVideoVAD(model, variables, n_streams=2, block_frames=bf)
    server = VADServer(ms)
    t = threading.Thread(target=server.serve_forever,
                        kwargs={"timeout": 0.002, "warmup": False},
                        daemon=True)
    t.start()
    try:
        rng = np.random.default_rng(9)
        video = (rng.random((40, 67, 67)) * 255).astype(np.float32)
        n_out = (len(video) // bf) * bf

        got = video_stream_client(server.address, video, n_out)
        got_u8 = video_stream_client(server.address, np.round(video), n_out,
                                     video_wire="u8")

        sv = StreamingVideoVAD(model, variables, block_frames=bf)
        ref = np.concatenate([sv.feed(video), sv.flush()])[:n_out]
        np.testing.assert_allclose(got, ref, atol=1e-5)
        sv8 = StreamingVideoVAD(model, variables, block_frames=bf)
        ref8 = np.concatenate([sv8.feed(np.round(video)), sv8.flush()])[:n_out]
        np.testing.assert_allclose(got_u8, ref8, atol=1e-5)

        # an audio message drops the connection and recycles the slot
        with socket_mod.create_connection(server.address, timeout=5) as s:
            s.sendall(av_frame(b"A", np.zeros(64, "<f4").tobytes()))
            import time as time_mod
            deadline = time_mod.time() + 5
            while len(server._free) != 2 and time_mod.time() < deadline:
                time_mod.sleep(0.01)
        assert len(server._free) == 2
    finally:
        server.stop()
        t.join(timeout=10)
        server.close()


def test_server_round_trip_span_wire_matches_frames_wire():
    """A VADServer on a span-wire streamer must serve byte-identical
    probabilities to the frames-wire server (the wire change is invisible
    to clients): same signals, two servers, equal outputs."""
    model, variables = _model_and_vars(h=8, layers=1)
    bf = 8
    sig = _signals(1)[0]

    def serve_once(**kw):
        ms = MultiStreamVAD(model, variables, n_streams=2, block_frames=bf,
                            **kw)
        server = VADServer(ms)
        t = threading.Thread(target=server.serve_forever,
                             kwargs={"timeout": 0.002}, daemon=True)
        t.start()
        try:
            cfg = ms.cfg
            n_frames = 1 + (len(sig) - cfg.nfft) // cfg.hopsamp
            n_out = (n_frames // bf) * bf
            return stream_client(server.address, sig, n_out)
        finally:
            server.stop()
            t.join(timeout=10)
            server.close()

    base = serve_once()
    span = serve_once(span_wire=True)
    np.testing.assert_array_equal(span, base)


def test_server_round_trip_int16_wire_matches_f32():
    """An audio_int16 server fed raw int16 PCM must serve BIT-identical
    probabilities to the float32 server fed the same int16-origin
    samples; float "A"-style raw feeds are impossible on the raw wire
    (dtype is fixed by server config), so also check the framed AV "P"
    message path dequantizes exactly onto a float32 streamer."""
    from avvad_tpu.models import AVVAD
    from avvad_tpu.serve import MultiStreamAVVAD
    from avvad_tpu.server import av_stream_client

    model, variables = _model_and_vars(h=8, layers=1)
    bf = 8
    sig_f = _signals(1)[0]
    sig_i = np.clip(np.round(sig_f.astype(np.float64) * 32768.0),
                    -32768, 32767).astype(np.int16)
    sig_fq = sig_i.astype(np.float32) / 32768.0  # int16-grid float twin

    def serve_once(sig, audio_wire="f32", **kw):
        ms = MultiStreamVAD(model, variables, n_streams=2, block_frames=bf,
                            span_wire=True, **kw)
        server = VADServer(ms)
        t = threading.Thread(target=server.serve_forever,
                             kwargs={"timeout": 0.002}, daemon=True)
        t.start()
        try:
            cfg = ms.cfg
            n_frames = 1 + (len(sig) - cfg.nfft) // cfg.hopsamp
            n_out = (n_frames // bf) * bf
            return stream_client(server.address, sig, n_out,
                                 audio_wire=audio_wire)
        finally:
            server.stop()
            t.join(timeout=10)
            server.close()

    base = serve_once(sig_fq)
    i16 = serve_once(sig_i, audio_wire="i16", audio_int16=True)
    np.testing.assert_array_equal(i16, base)

    # framed protocol: "P" int16 messages onto an int16 AV streamer match
    # "A" float messages of the grid twin onto a float32 AV streamer
    av_model = AVVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1,
                     use_mcb=True)
    av_vars = av_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 513)),
                            jnp.zeros((1, 4, 67, 67)))
    rng = np.random.default_rng(3)
    video = np.round(rng.random((40, 67, 67)) * 255).astype(np.float32)

    def serve_av_once(sig, audio_wire="f32", **kw):
        ms = MultiStreamAVVAD(av_model, av_vars, n_streams=2,
                              block_frames=bf, span_wire=True,
                              video_uint8=True, **kw)
        server = VADServer(ms)
        t = threading.Thread(target=server.serve_forever,
                             kwargs={"timeout": 0.002}, daemon=True)
        t.start()
        try:
            cfg = ms.cfg
            n_frames = 1 + (len(sig) - cfg.nfft) // cfg.hopsamp
            n_out = min((n_frames // bf) * bf, (len(video) // bf) * bf)
            return av_stream_client(server.address, sig, video, n_out,
                                    audio_wire=audio_wire,
                                    video_wire="u8")
        finally:
            server.stop()
            t.join(timeout=10)
            server.close()

    av_base = serve_av_once(sig_fq)
    av_i16 = serve_av_once(sig_i, audio_wire="i16", audio_int16=True)
    np.testing.assert_array_equal(av_i16, av_base)
    # "P" messages dequantize exactly onto a FLOAT32 streamer too
    av_p_on_f32 = serve_av_once(sig_i, audio_wire="i16")
    np.testing.assert_array_equal(av_p_on_f32, av_base)


def test_pipelined_server_round_trip_matches_single_stream():
    """pipelined=True serves identical probabilities (one block later),
    including the final block of a half-closing connection, whose result
    is still in flight when the client stops sending."""
    model, variables = _model_and_vars()
    bf = 8
    ms = MultiStreamVAD(model, variables, n_streams=2, block_frames=bf)
    server = VADServer(ms, pipelined=True)
    t = threading.Thread(target=server.serve_forever,
                         kwargs={"timeout": 0.002}, daemon=True)
    t.start()
    try:
        sig = _signals(1)[0]
        cfg = ms.cfg
        n_frames = 1 + (len(sig) - cfg.nfft) // cfg.hopsamp
        n_out = (n_frames // bf) * bf
        got = stream_client(server.address, sig, n_out)
        sv = StreamingVAD(model, variables, block_frames=bf, fixed_peak=1.0)
        ref = np.concatenate([sv.feed(sig), sv.flush()])[:n_out]
        assert len(got) == n_out
        np.testing.assert_allclose(got, ref, atol=1e-5)
    finally:
        server.stop()
        t.join(timeout=10)
        server.close()


@pytest.mark.slow
def test_pipelined_server_soak_under_connection_churn():
    """Long-run churn soak (VERDICT r4 next-#7): thousands of pipelined
    server polls while clients connect, stream in random-size chunks,
    half-close to drain, or disconnect abruptly mid-stream — with slots
    recycling continuously. EVERY byte any client receives must equal
    the prefix of ITS OWN signal's offline classification: this pins the
    round-4 buffer-aliasing bug class (hub assemble reuse, pending-tick
    slot recycling) under realistic lifecycle churn, not just the
    single-scenario regressions."""
    import time

    model, variables = _model_and_vars(h=8, layers=1)
    bf = 4
    n_streams = 4
    ms = MultiStreamVAD(model, variables, n_streams=n_streams,
                        block_frames=bf)
    server = VADServer(ms, pipelined=True)
    t = threading.Thread(target=server.serve_forever,
                         kwargs={"timeout": 0.001}, daemon=True)
    t.start()

    n_sessions = 48
    cfg = ms.cfg
    sig_rng = np.random.default_rng(42)
    signals, expected = [], []
    solo = MultiStreamVAD(model, variables, n_streams=1, block_frames=bf)
    for i in range(n_sessions):
        n = int(sig_rng.integers(6000, 20000))
        s = np.clip(sig_rng.normal(size=n) * 0.2, -1, 1).astype(np.float32)
        s[0] = 1.0  # causal peak pinned from the first sample
        signals.append(s)
        # offline oracle: the same signal through a solo streamer
        solo.reset()
        solo.feed(0, s)
        chunks = []
        while True:
            out = solo.tick()
            if not out:
                break
            chunks.append(np.asarray(out[0]))
        expected.append(np.concatenate(chunks) if chunks else np.zeros(0))

    failures = []

    def run_session(i):
        rng = np.random.default_rng(1000 + i)
        sig, want = signals[i], expected[i]
        drain = rng.uniform() < 0.6  # else: abrupt mid-stream disconnect
        data = sig.tobytes()
        for _attempt in range(80):
            got = b""
            refused = False
            try:
                c = socket.create_connection(server.address, timeout=10.0)
            except OSError:
                time.sleep(0.02)
                continue
            try:
                cut = (len(data) if drain
                       else 4 * int(rng.integers(len(sig) // 3,
                                                 2 * len(sig) // 3)))
                pos = 0
                while pos < cut:
                    k = 4 * int(rng.integers(300, 3000))
                    c.sendall(data[pos:pos + k])
                    pos += k
                    try:
                        c.settimeout(0.0)
                        part = c.recv(1 << 20)
                        if part:
                            got += part
                        elif pos >= cut:
                            pass
                    except (BlockingIOError, socket.timeout):
                        pass
                    finally:
                        c.settimeout(10.0)
                if drain:
                    c.shutdown(socket.SHUT_WR)
                    while True:
                        part = c.recv(1 << 20)
                        if not part:
                            break
                        got += part
            except (ConnectionError, BrokenPipeError, OSError):
                refused = True  # slot-refused (or raced a recycle): retry
            finally:
                c.close()
            if drain and not got and not refused:
                refused = True  # accepted-then-closed refusal: no slot
            if refused and not got:
                time.sleep(0.02)
                continue
            break
        probs = np.frombuffer(got, dtype="<f4")
        n_frames = 1 + (len(sig) - cfg.nfft) // cfg.hopsamp
        n_full = (n_frames // bf) * bf
        if drain and len(probs) != n_full:
            failures.append((i, "drain length", len(probs), n_full))
            return
        if len(probs) > len(want):
            failures.append((i, "overdelivery", len(probs), len(want)))
            return
        if not np.allclose(probs, want[:len(probs)], atol=1e-5):
            failures.append((i, "cross-delivery/mismatch", len(probs)))

    try:
        pending = list(range(n_sessions))
        while pending:
            wave = [threading.Thread(target=run_session, args=(i,))
                    for i in pending[:6]]
            pending = pending[6:]
            for th in wave:
                th.start()
            for th in wave:
                th.join(timeout=120)
        assert not failures, failures[:5]
        # the server survived the churn: one clean session end-to-end
        sig, want = signals[0], expected[0]
        n_frames = 1 + (len(sig) - cfg.nfft) // cfg.hopsamp
        n_full = (n_frames // bf) * bf
        got = stream_client(server.address, sig, n_full)
        np.testing.assert_allclose(got, want[:n_full], atol=1e-5)
    finally:
        server.stop()
        t.join(timeout=10)
        server.close()
