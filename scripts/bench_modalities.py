#!/usr/bin/env python
"""Per-modality inference benchmarks (BASELINE.json configs 0-1).

bench.py ships the flagship AV headline; this measures the remaining
named configs on the same pipelined fetch-barrier harness:
- audio-only, spectrogram path (AudioVAD: on-device log-power frontend
  -> 2x1024 LSTM -> Dense)
- audio-only, raw-waveform path (RawAudioVAD: WaveNet encoder frontend)
- video-only (VideoVAD: ResNet-18 tower on unique 30 fps frames,
  features gathered onto the 62.5 fps label timeline, int8-static tower)

Prints one json line per config. Usage: python scripts/bench_modalities.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from avvad_tpu.utils import enable_compilation_cache

enable_compilation_cache()

FS = 16000
HOP = 256
FRAME_RATE = FS / HOP


def bench(serve, inputs, audio_seconds, n_iters=20, rounds=3):
    out = serve(*inputs)
    jax.block_until_ready(out)
    # chained-form warmups (fresh-scalar + committed-carry): either form
    # can land in its own jit-cache entry; compile both so no timed
    # round hides a recompile (see bench.py time_serve)
    carry = jnp.float32(0.0)
    out = serve(inputs[0] + carry * 0.0, *inputs[1:])
    carry = out.ravel()[0]
    out = serve(inputs[0] + carry * 0.0, *inputs[1:])
    jax.block_until_ready(out)
    best = None
    for _ in range(rounds):
        carry = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = serve(inputs[0] + carry * 0.0, *inputs[1:])
            carry = out.ravel()[0]
        float(carry)  # fetch barrier (the only reliable sync here)
        dt = (time.perf_counter() - t0) / n_iters
        best = dt if best is None else min(best, dt)
    return audio_seconds / best, best


def audio_spec_config(b, t):
    from avvad_tpu.models import AudioVAD
    from avvad_tpu.ops.stft import log_power_frontend

    model = AudioVAD(y_dim=1, lstm_hidden_size=1024, lstm_layers=2,
                     use_pallas_lstm=True, dtype=jnp.bfloat16)
    n_samples = HOP * (t - 1) + 1024
    wave = jax.random.normal(jax.random.PRNGKey(0), (b, n_samples))
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((b, t, 513)))

    @jax.jit
    def serve(wave):
        feats = log_power_frontend(wave, fs=FS, wlen_sec=64e-3,
                                   hop_percent=0.25, center=False,
                                   pad_at_end=True)[:, :t, :]
        return jax.nn.sigmoid(model.apply(variables, feats))

    return serve, (wave,), b * t / FRAME_RATE


def audio_wavenet_config(b, t):
    from avvad_tpu.models import RawAudioVAD

    n_samples = HOP * (t - 1) + 1024
    model = RawAudioVAD(y_dim=1, lstm_hidden_size=1024, lstm_layers=2,
                        out_frames=t, dtype=jnp.bfloat16)
    wave = jax.random.normal(jax.random.PRNGKey(0), (b, n_samples))
    variables = model.init(jax.random.PRNGKey(1), wave)

    @jax.jit
    def serve(wave):
        return jax.nn.sigmoid(model.apply(variables, wave))

    return serve, (wave,), b * t / FRAME_RATE


def video_config(b, t, int8=True, pallas=False):
    from avvad_tpu.models import VideoVAD
    from avvad_tpu.models.quantize import calibrate
    from avvad_tpu.processing.video import fps_resample_indices

    t_src = int(np.ceil(t * 30.0 / FRAME_RATE))
    while len(fps_resample_indices(t_src, 30.0, FRAME_RATE)) < t:
        t_src += 1
    frame_idx = jnp.asarray(fps_resample_indices(t_src, 30.0, FRAME_RATE)[:t])
    model = VideoVAD(y_dim=1, lstm_hidden_size=1024, lstm_layers=2,
                     use_pallas_lstm=True, dtype=jnp.bfloat16,
                     tower_int8=int8,
                     tower_quant_mode="static" if int8 else "dynamic",
                     tower_pallas=pallas)
    video = jax.random.normal(jax.random.PRNGKey(0), (b, t_src, 67, 67))
    variables = model.init(jax.random.PRNGKey(1), video,
                           video_frame_indices=frame_idx)
    if int8:
        cal = model.clone(tower_quant_mode="calibrate", tower_pallas=False)
        variables = calibrate(cal, variables, [(video[:2],)], train=False,
                              video_frame_indices=frame_idx)

    @jax.jit
    def serve(video):
        return jax.nn.sigmoid(model.apply(variables, video,
                                          video_frame_indices=frame_idx))

    return serve, (video,), b * t / FRAME_RATE


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="+",
                    default=["audio", "wavenet", "video"],
                    choices=["audio", "wavenet", "video", "video-pallas"])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frames", type=int, default=512)
    args = ap.parse_args()

    builders = {
        "audio": lambda: audio_spec_config(args.batch, args.frames),
        "wavenet": lambda: audio_wavenet_config(args.batch, args.frames),
        "video": lambda: video_config(args.batch, args.frames),
        "video-pallas": lambda: video_config(args.batch, args.frames,
                                             pallas=True),
    }
    for name in args.configs:
        serve, inputs, audio_sec = builders[name]()
        rt, step = bench(serve, inputs, audio_sec)
        print(json.dumps({
            "metric": f"{name}_vad_inference_rt_factor",
            "value": round(rt, 2),
            "unit": "x_realtime_per_chip",
            "ms_per_step": round(step * 1e3, 2),
            "vs_baseline": round(rt / 50.0, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
