"""Headline benchmark: AV-VAD inference throughput per chip.

Measures the full on-device serving pipeline — raw waveform -> fused
log-power STFT frontend -> AVVAD (ResNet-18 video tower + MCB fusion +
2x1024 LSTM) -> frame probabilities — and reports the real-time factor
(audio-seconds classified per wall-clock second on one chip).

Baseline (BASELINE.md): the reference publishes no numbers; the target is
>= 50x real time per chip, so `vs_baseline` = rt_factor / 50.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.

Regression gate: the committed BENCH_HISTORY.json records the best-known
ms/step per (mode, shape key). After the full measurement the result is
compared against it; a winner >5% slower than the recorded best adds a
"regression_vs_best" field to the JSON line and a loud stderr note, so a
silently-shipped slowdown of the headline is visible in the round
artifact. AVVAD_BENCH_WRITE_HISTORY=1 merges the freshly-measured
numbers back into the file (run on real hardware only).

`python bench.py --train` (or AVVAD_BENCH_MODE=train) instead measures
the jitted AV TRAIN step at the reference recipe's configuration
(/root/reference/scripts/train_AV_net.py:193-329: batch 16, Adam 1e-4,
frozen ResNet trunk, BN stats updating) — BASELINE.json config 5 — and
reports train-audio-seconds/sec/chip with the same chained-dependency
timing (each step consumes the previous step's donated state, so the
dispatch queue stays full exactly as trainer.py runs it).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# The ambient TPU-tunnel sitecustomize pins jax_platforms programmatically,
# overriding the env var — re-pin it so JAX_PLATFORMS=cpu smoke runs work
# (no-op under the driver, which sets JAX_PLATFORMS=axon anyway).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp

from avvad_tpu.utils import enable_compilation_cache

enable_compilation_cache()
import numpy as np

_HISTORY_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_HISTORY.json")


def _require_live_backend() -> None:
    """Fail fast, with a parseable JSON line, if the device never answers.

    The tunneled backend has been observed to wedge entirely (an 8x128
    matmul hangs forever while jax.devices() still lists the chip —
    BENCH_NOTES.md round-5 endgame note). A bench invocation against a
    wedged backend would otherwise hang until the caller's timeout with
    nothing on stdout; instead probe a trivial op in a daemon thread and,
    if it hasn't answered after AVVAD_BENCH_LIVENESS_S (default 600 s —
    generous: a live-but-slow tunnel answers a tiny op in seconds), emit
    an explicit error record and exit. min_compile_time 1 s keeps the
    probe out of the persistent cache."""
    import threading

    timeout_s = float(os.environ.get("AVVAD_BENCH_LIVENESS_S", "600"))
    done = threading.Event()

    def _probe():
        x = jnp.ones((8, 128))
        float((x @ x.T).sum())
        done.set()

    threading.Thread(target=_probe, daemon=True).start()
    if not done.wait(timeout_s):
        print(f"bench: backend unresponsive after {timeout_s:.0f}s "
              "liveness probe — see BENCH_NOTES.md (tunnel outage); "
              "numbers in BENCH_TRAIN_r05.json/BENCH_HISTORY.json were "
              "measured before the outage", file=sys.stderr)
        print(json.dumps({
            "metric": "av_vad_inference_rt_factor", "value": 0.0,
            "unit": "x_realtime_per_chip", "vs_baseline": 0.0,
            "error": f"tpu backend unresponsive after {timeout_s:.0f}s "
                     "liveness probe (tunnel outage; see BENCH_NOTES.md "
                     "round-5 endgame note — last live headline: "
                     "11,417x, BENCH_HISTORY.json)",
        }))
        os._exit(0)


def _load_history() -> dict:
    try:
        with open(_HISTORY_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _gate_and_record(mode: str, shape_key: str, winner: str,
                     step_time: float, rep_times: list[float],
                     candidates: dict | None = None) -> dict:
    """Compare the measured winner against the recorded best; optionally
    merge fresh numbers back (AVVAD_BENCH_WRITE_HISTORY=1). Returns extra
    fields for the result JSON ({} when in-family and no history)."""
    ms = step_time * 1e3
    history = _load_history()
    entry = history.get(mode, {}).get(shape_key)
    extra: dict = {}
    if entry and "best_ms_per_step" in entry:
        best = float(entry["best_ms_per_step"])
        if ms > best * 1.05:
            extra["regression_vs_best"] = round(ms / best, 3)
            extra["best_known_ms"] = round(best, 2)
            print(f"bench REGRESSION: {mode}/{shape_key} winner {winner} "
                  f"measured {ms:.2f} ms/step vs best-known {best:.2f} "
                  f"({ms / best:.2f}x) — investigate before shipping",
                  file=sys.stderr)
    if os.environ.get("AVVAD_BENCH_WRITE_HISTORY") == "1":
        sect = history.setdefault(mode, {})
        cur = sect.setdefault(shape_key, {})
        if "best_ms_per_step" not in cur or ms < cur["best_ms_per_step"]:
            cur["best_ms_per_step"] = round(ms, 3)
            cur["best_config"] = winner
        cur["last"] = {
            "winner": winner, "ms_per_step": round(ms, 3),
            "rep_ms": [round(r * 1e3, 3) for r in rep_times],
            "mean_ms": round(float(np.mean(rep_times)) * 1e3, 3),
            "spread_ms": round((max(rep_times) - min(rep_times)) * 1e3, 3),
        }
        if candidates:
            cur["candidates_ms"] = {
                k: {"rep_ms": [round(r * 1e3, 3) for r in v],
                    "min_ms": round(min(v) * 1e3, 3),
                    "mean_ms": round(float(np.mean(v)) * 1e3, 3)}
                for k, v in candidates.items()
            }
        with open(_HISTORY_PATH, "w") as f:
            json.dump(history, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"bench history updated: {mode}/{shape_key}", file=sys.stderr)
    return extra


def _train_bench_one(modality: str, freeze: bool, b: int, t: int,
                     iters: int, reps: int, lstm_h: int) -> dict:
    """Measure one jitted train-step config; returns the result record.

    Configs mirror the reference recipes (BASELINE.json):
    - av frozen:   train_AV_net.py:238-245 (Adam on non-trunk params;
      optax set_to_zero lets XLA drop the trunk backward pass, exactly
      as torch's requires_grad=False does; BN stats still update)
    - av unfrozen: same step with the full ResNet backward
    - audio:       train_audio_net.py:144-372 (2x1024 LSTM + head)
    - video:       train_video_net.py:138-319 (full ResNet-18 trained
      from scratch — nothing frozen)
    """
    from avvad_tpu.data.batching import Batch
    from avvad_tpu.models import AVVAD, AudioVAD, VideoVAD
    from avvad_tpu.train.state import (create_train_state, make_optimizer,
                                       trainable_except_video_trunk)
    from avvad_tpu.train.steps import make_train_step

    fs, hop = 16000, 256
    frame_rate = fs / hop
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(b, t, 513)), jnp.float32)
    video = jnp.asarray(rng.normal(size=(b, t, 67, 67)), jnp.float32)
    if modality == "audio":
        model = AudioVAD(y_dim=1, lstm_hidden_size=lstm_h, lstm_layers=2)
        example = (jnp.zeros((1, 4, 513)),)
        batch_kw = {"audio": audio, "video": None}
    elif modality == "video":
        model = VideoVAD(y_dim=1, lstm_hidden_size=lstm_h, lstm_layers=2)
        example = (jnp.zeros((1, 4, 67, 67)),)
        batch_kw = {"audio": None, "video": video}
    else:
        model = AVVAD(y_dim=1, lstm_hidden_size=lstm_h, lstm_layers=2,
                      use_mcb=True)
        example = (jnp.zeros((1, 4, 513)), jnp.zeros((1, 4, 67, 67)))
        batch_kw = {"audio": audio, "video": video}
    tx = make_optimizer(
        1e-4,
        freeze_filter=trainable_except_video_trunk if freeze else None)
    state = create_train_state(model, jax.random.PRNGKey(0), example, tx)

    batch = Batch(
        label=jnp.asarray(rng.integers(0, 2, size=(b, t, 1)), jnp.float32),
        lengths=jnp.full((b,), t, jnp.int32),
        mask=jnp.ones((b, t), jnp.float32),
        **batch_kw,
    )
    step = make_train_step(modality)

    state, metrics = step(state, batch, None)  # compile + warm
    jax.block_until_ready(metrics["loss"])
    rep_times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            # each step consumes the previous step's donated state: the
            # chain is the real trainer's dependency structure
            state, metrics = step(state, batch, None)
        float(metrics["loss"])  # barrier: value fetch syncs the chain
        rep_times.append((time.perf_counter() - t0) / iters)
    step_time = min(rep_times)

    rt_factor = (b * t / frame_rate) / step_time
    shape_key = f"{modality}_b{b}_t{t}_frozen{int(freeze)}"
    extra = _gate_and_record("train", shape_key, f"{modality}_train_step",
                             step_time, rep_times)
    return {
        "metric": f"{modality}_vad_train_rt_factor",
        "value": round(rt_factor, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rt_factor / 50.0, 3),
        "config": f"{modality}_train b={b} t={t} "
                  f"frozen_trunk={int(freeze)} "
                  f"ms_per_step={step_time * 1e3:.1f}",
        **extra,
    }


def _train_bench_env():
    return (int(os.environ.get("AVVAD_BENCH_TRAIN_B", "16")),
            int(os.environ.get("AVVAD_BENCH_TRAIN_T", "512")),
            int(os.environ.get("AVVAD_BENCH_ITERS", "10")),
            int(os.environ.get("AVVAD_BENCH_REPS", "3")),
            # AVVAD_BENCH_TRAIN_H: off-TPU smoke only; measured config 1024
            int(os.environ.get("AVVAD_BENCH_TRAIN_H", "1024")))


def train_main():
    """BASELINE.json config 5: end-to-end train step throughput.

    AVVAD_BENCH_TRAIN_MODALITY selects av (default) / audio / video;
    AVVAD_BENCH_TRAIN_FREEZE=0 measures the unfrozen (full ResNet
    backward) AV step. Prints ONE json line."""
    b, t, iters, reps, lstm_h = _train_bench_env()
    modality = os.environ.get("AVVAD_BENCH_TRAIN_MODALITY", "av")
    freeze = (os.environ.get("AVVAD_BENCH_TRAIN_FREEZE", "1") == "1"
              and modality == "av")
    print(json.dumps(_train_bench_one(modality, freeze, b, t, iters, reps,
                                      lstm_h)))


def train_matrix_main():
    """The 4-config train-bench matrix (VERDICT r4 next-#5): frozen AV,
    unfrozen AV, audio-only, video-only — each gated against
    BENCH_HISTORY. Prints ONE json line holding all four records."""
    b, t, iters, reps, lstm_h = _train_bench_env()
    records = []
    for modality, freeze in (("av", True), ("av", False),
                             ("audio", False), ("video", False)):
        rec = _train_bench_one(modality, freeze, b, t, iters, reps, lstm_h)
        print(f"train matrix: {rec['config']} -> {rec['value']}x rt",
              file=sys.stderr)
        records.append(rec)
    print(json.dumps({"metric": "train_matrix", "configs": records}))


def kernel_tripwire_main():
    """Mosaic re-measure tripwire (VERDICT r4 next-#8): re-time the parked
    Pallas kernels against their XLA equivalents on the live toolchain.

    ops/conv_pallas.py (fused int8 BasicBlock stages) and
    ops/stem_pallas.py (fused stem epilogue) are exactness-tested but
    measured-NEGATIVE under the current Mosaic (BENCH_NOTES.md: relayouts
    on small spatial dims dominate). This one command re-ranks them so a
    toolchain upgrade that flips the sign is noticed instead of
    rediscovered. Prints ONE json line; any "pallas_faster": true entry
    is the tripwire firing — wire the kernel into the serving config and
    re-run the headline bench."""
    from avvad_tpu.models.resnet import ResNet18
    from avvad_tpu.ops.stem_pallas import (stem_epilogue_pool_quant,
                                           stem_epilogue_reference)

    n = int(os.environ.get("AVVAD_TRIPWIRE_N", "512"))
    reps = int(os.environ.get("AVVAD_BENCH_REPS", "3"))
    iters = int(os.environ.get("AVVAD_BENCH_ITERS", "10"))
    rng = np.random.default_rng(0)

    def time_fn(fn, *args):
        out = fn(*args)  # compile + warm
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    results = []

    # 1. full int8 trunk: fused Pallas stages vs XLA convs + epilogues,
    #    identical calibrated variables (the serving tower path)
    x = jnp.asarray(rng.normal(size=(n, 67, 67, 1)), jnp.float32)
    cal = ResNet18(gray_input=True, quant_int8=True, quant_mode="calibrate")
    variables = cal.init(jax.random.PRNGKey(0), x[:8])
    _, updated = cal.apply(variables, x[:8], mutable=["quant"])
    variables = {**variables, "quant": updated["quant"]}
    xla_t = ResNet18(gray_input=True, quant_int8=True, quant_mode="static")
    pal_t = ResNet18(gray_input=True, quant_int8=True, quant_mode="static",
                     stages_pallas=True)
    t_xla = time_fn(jax.jit(xla_t.apply), variables, x)
    t_pal = time_fn(jax.jit(pal_t.apply), variables, x)
    results.append({"kernel": f"conv_pallas.trunk_stages(N={n})",
                    "pallas_ms": round(t_pal * 1e3, 2),
                    "xla_ms": round(t_xla * 1e3, 2),
                    "ratio_pallas_over_xla": round(t_pal / t_xla, 3),
                    "pallas_faster": bool(t_pal < t_xla)})

    # 2. stem epilogue (BN-affine + relu + 3x3s2 maxpool + requant)
    xs = jnp.asarray(rng.normal(size=(n, 34, 34, 64)), jnp.float32)
    a = jnp.asarray(rng.uniform(0.5, 1.5, 64), jnp.float32)
    b = jnp.asarray(rng.normal(size=64), jnp.float32)
    t_xla = time_fn(jax.jit(stem_epilogue_reference), xs, a, b)
    t_pal = time_fn(jax.jit(stem_epilogue_pool_quant), xs, a, b)
    results.append({"kernel": f"stem_pallas.epilogue(N={n})",
                    "pallas_ms": round(t_pal * 1e3, 2),
                    "xla_ms": round(t_xla * 1e3, 2),
                    "ratio_pallas_over_xla": round(t_pal / t_xla, 3),
                    "pallas_faster": bool(t_pal < t_xla)})

    fired = [r["kernel"] for r in results if r["pallas_faster"]]
    if fired:
        print("TRIPWIRE: Mosaic now favors " + ", ".join(fired)
              + " — wire it into the serving config and re-run bench.py",
              file=sys.stderr)
    print(json.dumps({"metric": "kernel_tripwire", "results": results,
                      "tripwire_fired": bool(fired)}))


def main():
    from avvad_tpu.models import AVVAD

    fs = 16000
    hop = 256
    frame_rate = fs / hop  # 62.5

    # Batch of utterances x ~8.2 s. Larger batches amortize the (row-bound)
    # LSTM recurrence — per-step LSTM cost is flat to B=128 — while ResNet
    # scales linearly. Measured (unique-frame tower): B=32 6200x, B=64
    # 6453x, B=80 6518x, B=96 OOM; B=64 ships (margin from the HBM cliff).
    # Overridable for sweeps: AVVAD_BENCH_B / _INT8.
    b = int(os.environ.get("AVVAD_BENCH_B", "64"))
    # AVVAD_BENCH_T / _ITERS / _REPS: shrink for off-TPU smoke tests only;
    # the measured config is the defaults.
    t = int(os.environ.get("AVVAD_BENCH_T", "512"))
    # AVVAD_BENCH_INT8: 0 = float tower, 1 = dynamic W8A8, 2 = calibrated
    # static W8A8 (int8-resident stage activations; see models/quantize.py).
    # Default 2: measured 9709x vs 6453x bf16 at B=64; tower features agree
    # with f32 to 1.5% rel / corr 0.9998 (test_int8_tower_close_to_fp32)
    # and the trained-model quality gate is in QUALITY.md.
    int8_mode = int(os.environ.get("AVVAD_BENCH_INT8", "2"))
    # AVVAD_BENCH_CHUNK: frames per tower pass (0 = single pass over all
    # B*T_src frames). Chunking scans the trunk over fixed-size frame
    # slices so peak tower activation memory is set by the chunk, not the
    # batch — lifting the B>=96 OOM ceiling (see _VideoTower.chunk).
    tower_chunk = int(os.environ.get("AVVAD_BENCH_CHUNK", "0"))
    # AVVAD_BENCH_CHUNK_UNROLL=1: unrolled (python-loop) chunks instead of
    # lax.scan — independent trunk subgraphs the scheduler may overlap,
    # vs the scan's strict serialization (see _VideoTower.chunk_unroll).
    chunk_unroll = os.environ.get("AVVAD_BENCH_CHUNK_UNROLL") == "1"
    # AVVAD_BENCH_STEM_INT8: quantize the stem conv too (calibrated input
    # scale; lip frames are 8-bit pixels by construction). Candidate to
    # remove the stem chain's float conv-output traffic (BENCH_NOTES stem
    # probe: 13.75 ms, ~9 ms of it HBM round-trips). Requires int8_mode 2.
    stem_int8 = os.environ.get("AVVAD_BENCH_STEM_INT8", "0") == "1"
    # AVVAD_BENCH_PALLAS_TOWER=1: fused whole-BasicBlock Pallas int8
    # kernels for the four trunk stages (ops/conv_pallas.py) instead of
    # XLA convs + separate epilogue passes. Requires int8_mode == 2.
    pallas_tower = os.environ.get("AVVAD_BENCH_PALLAS_TOWER") == "1"
    # MCB matmul precision. The serving default is DEFAULT (bf16 inputs,
    # f32 accumulation): with the sketch folded into the DFT bases the
    # fusion is ~6x cheaper than round 1's fp32-HIGHEST path, and measured
    # probabilities move by max 2.3e-6 vs HIGHEST at this config. HIGHEST
    # remains the model-class default for reference parity work.
    mcb_prec = (jax.lax.Precision.HIGHEST
                if os.environ.get("AVVAD_BENCH_MCB_PREC") == "highest"
                else jax.lax.Precision.DEFAULT)
    # Frontend DFT precision stays HIGHEST: HIGH (bf16x3) is ~1 ms faster
    # but costs up to ~1 log-unit on the quietest bins of real speech
    # (fine on synthetic noise, not worth the asterisk on real audio).
    fe_prec = (jax.lax.Precision.HIGH
               if os.environ.get("AVVAD_BENCH_FE_PREC") == "high"
               else jax.lax.Precision.HIGHEST)
    # these require the calibrated static-int8 tower; dropping them
    # silently would mislabel the measured config (same misconfiguration
    # class scripts/evaluate.py rejects)
    if pallas_tower and int8_mode != 2:
        raise SystemExit("AVVAD_BENCH_PALLAS_TOWER=1 requires "
                         "AVVAD_BENCH_INT8=2 (calibrated static scales)")
    if stem_int8 and int8_mode != 2:
        raise SystemExit("AVVAD_BENCH_STEM_INT8=1 requires "
                         "AVVAD_BENCH_INT8=2 (calibrated static scales)")
    n_samples = hop * (t - 1) + 1024  # exactly t STFT frames, no end pad

    # bf16 towers (+12% vs f32, probabilities agree to <1e-4); the DFT
    # frontend stays fp32-pinned internally.
    # AVVAD_BENCH_LSTM_QUANT: quantize the Pallas LSTM recurrence state
    # ("bf16" or "int8"; inference-only — ops/lstm_pallas.py). int8 runs
    # the recurrent matmul W8A8 at 2x the bf16 MXU rate with the hidden
    # state on its natural fixed scale (h is (-1,1)-bounded).
    lstm_quant = os.environ.get("AVVAD_BENCH_LSTM_QUANT", "none")
    # AVVAD_BENCH_LSTM_H: off-TPU smoke only (interpret-mode Pallas at
    # H=1024 is minutes/step on CPU); the measured config is 1024.
    lstm_h = int(os.environ.get("AVVAD_BENCH_LSTM_H", "1024"))
    model = AVVAD(y_dim=1, lstm_hidden_size=lstm_h, lstm_layers=2, use_mcb=True,
                  use_pallas_lstm=True, lstm_state_quant=lstm_quant,
                  dtype=jnp.bfloat16,
                  tower_int8=int8_mode > 0,
                  tower_quant_mode="static" if int8_mode == 2 else "dynamic",
                  tower_pallas=pallas_tower,
                  tower_stem_int8=stem_int8,
                  tower_chunk=tower_chunk, tower_chunk_unroll=chunk_unroll,
                  mcb_precision=mcb_prec)
    # Serving ingests the camera's native 30 fps stream: the 62.5 fps video
    # timeline is pure frame DUPLICATION (ffmpeg fps-filter schedule), so
    # the tower runs on the ~0.48*t unique source frames and features are
    # gathered onto the audio timeline — bit-identical to classifying
    # pre-upsampled video (tests/test_models.py pins it), at ~52% less
    # tower compute.
    from avvad_tpu.processing.video import fps_resample_indices

    video_fps = 30.0
    t_src = int(np.ceil(t * video_fps / frame_rate))
    while len(fps_resample_indices(t_src, video_fps, frame_rate)) < t:
        t_src += 1
    frame_idx = jnp.asarray(
        fps_resample_indices(t_src, video_fps, frame_rate)[:t])

    rng = jax.random.PRNGKey(0)
    audio_wave = jax.random.normal(rng, (b, n_samples), dtype=jnp.float32)
    video = jax.random.normal(jax.random.PRNGKey(1), (b, t_src, 67, 67),
                              dtype=jnp.float32)
    init_audio = jnp.zeros((b, t, 513), dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), init_audio, video,
                           video_frame_indices=frame_idx)
    if int8_mode == 2:
        # Record activation scales on a small batch (same distribution);
        # per-tensor max-abs needs little data and the calibration program
        # compiles much faster at b=2 on this remote-compile backend.
        from avvad_tpu.models.quantize import calibrate

        cal_model = model.clone(tower_quant_mode="calibrate",
                                tower_pallas=False)
        variables = calibrate(
            cal_model, variables,
            [(init_audio[:2], video[:2])],
            train=False, video_frame_indices=frame_idx)

    # AVVAD_BENCH_HOP_DFT=1: hop-block DFT frontend (one K=256 matmul per
    # hop block + exact radix-4 assembly + frequency-domain Hann) — ~4x
    # fewer frontend matmul FLOPs at the same fp32 precision
    # (ops/stft._dft_hop_blocks; exactness pinned in test_ops_stft).
    hop_dft = os.environ.get("AVVAD_BENCH_HOP_DFT") == "1"

    from avvad_tpu.export import make_waveform_serving_fn

    def make_serve(mdl, use_hop_dft, vars_=None):
        # the SAME composition deployment exports (export.py) — the bench
        # measures the program users actually ship
        fn = make_waveform_serving_fn(
            mdl, variables if vars_ is None else vars_, t_frames=t,
            hop_dft=use_hop_dft, fe_precision=fe_prec,
            video_frame_indices=frame_idx)
        return jax.jit(fn)

    # Timed steady state, pipelined with a forced data dependency: each
    # iteration's input depends on the previous output, so the chain cannot
    # be elided and the final sync covers every step — while the dispatch
    # queue stays full, as in a real serving loop. (Per-call
    # block_until_ready costs ~29 ms of dead tunnel-sync time on this
    # backend and would understate sustained throughput ~2x.)
    def time_serve(serve, n_iters, reps):
        """-> per-rep step times (seconds); min is the headline."""
        out = serve(audio_wave, video)  # warm up / compile
        jax.block_until_ready(out)
        # chained-form warmups: the fresh-scalar and committed-carry
        # input forms can each land in their OWN jit-cache entry whose
        # recompile would otherwise hide inside a timed rep (min over
        # reps absorbs it, but the ladder's runs are short —
        # keep every rep clean; see scripts/bench_artifact_overhead.py)
        warm_carry = jnp.float32(0.0)
        out = serve(audio_wave + warm_carry * 0.0, video)
        warm_carry = out[0, 0, 0]
        out = serve(audio_wave + warm_carry * 0.0, video)
        jax.block_until_ready(out)
        times = []
        for _ in range(reps):
            carry = jnp.float32(0.0)
            t0 = time.perf_counter()
            for _ in range(n_iters):
                out = serve(audio_wave + carry * 0.0, video)
                carry = out[0, 0, 0]
            float(carry)  # value fetch: the only reliable barrier here
            times.append((time.perf_counter() - t0) / n_iters)
        return times

    # AVVAD_BENCH_AUTO (default on unless a candidate flag is set
    # explicitly): time the shipped config against the quality-gated
    # round-3 candidates — bf16/int8-state LSTM recurrence and the
    # hop-block DFT frontend (gates: QUALITY.md round 3; hop-DFT is
    # probability-exact, bf16 state 0.05% flips, int8 state 0.66% flips /
    # ΔAUC 0.002 at grid scale) — and report the fastest. Selection uses
    # short runs; the winner gets the full 3x20 measurement. Candidates
    # that fail or exceed the compile budget are skipped (the shipped
    # config always completes).
    explicit = ("AVVAD_BENCH_HOP_DFT" in os.environ
                or "AVVAD_BENCH_LSTM_QUANT" in os.environ
                or "AVVAD_BENCH_MCB_HOIST" in os.environ)
    auto = os.environ.get("AVVAD_BENCH_AUTO",
                          "0" if explicit else "1") == "1"
    budget_s = float(os.environ.get("AVVAD_BENCH_AUTO_BUDGET_S", "1800"))
    full_iters = int(os.environ.get("AVVAD_BENCH_ITERS", "20"))
    full_reps = int(os.environ.get("AVVAD_BENCH_REPS", "3"))

    # AVVAD_BENCH_MCB_HOIST=1: hoisted MCB sketch fold. Applies to the
    # explicit single-config run AND (when AVVAD_BENCH_AUTO=1 is forced
    # alongside it) to every ladder candidate.
    mcb_hoist = os.environ.get("AVVAD_BENCH_MCB_HOIST") == "1"
    if mcb_hoist:
        from avvad_tpu.models.mcb import fold_sketch_collection

        model = model.clone(mcb_folded_vars=True)
        variables = fold_sketch_collection(variables)
    serve = make_serve(model, hop_dft)
    candidate_reps: dict[str, list[float]] = {}
    if not auto:
        rep_times = time_serve(serve, n_iters=full_iters, reps=full_reps)
        step_time = min(rep_times)
        winner = f"explicit:hop_dft={int(hop_dft)},lstm={lstm_quant}"
    else:
        t_start = time.perf_counter()
        # Order = measured expected value (2026-08-18 hardware pass,
        # BENCH_NOTES "round-3 hardware results"): bf16 LSTM state was the
        # fastest single candidate (45.8 ms/step vs 48.5 shipped), int8
        # state next (47.0); the hop-DFT frontend's probe-level 6.7x is
        # <1 ms at step level (small slice, floor-dominated step) and its
        # measured combos with quantized state were slower than the state
        # change alone, so only the plain hop_dft candidate stays. If the
        # compile budget truncates the ladder, the highest-expected-value
        # candidates have already run.
        candidates = [("shipped", hop_dft, lstm_quant)]
        if lstm_quant == "none":
            candidates.append(("lstm_bf16", hop_dft, "bf16"))
            candidates.append(("lstm_int8", hop_dft, "int8"))
        if not hop_dft:
            candidates.append(("hop_dft", True, lstm_quant))
        timings = {}
        serves = {"shipped": serve}
        first_error = None
        for name, use_hop, quant in candidates:
            if name != "shipped" and \
                    time.perf_counter() - t_start > budget_s:
                print(f"bench auto: budget exhausted, skipping {name}",
                      file=sys.stderr)
                continue
            try:
                s = serves.get(name)
                if s is None:
                    mdl = (model if quant == lstm_quant
                           else model.clone(lstm_state_quant=quant))
                    s = serves[name] = make_serve(mdl, use_hop)
                candidate_reps[name] = time_serve(
                    s, n_iters=max(2, full_iters // 2), reps=3)
                timings[name] = min(candidate_reps[name])
                print(f"bench auto: {name}: "
                      f"{timings[name] * 1e3:.2f} ms/step "
                      f"(reps {[f'{r * 1e3:.1f}' for r in candidate_reps[name]]})",
                      file=sys.stderr)
            except Exception as e:  # never lose the headline to a candidate
                first_error = first_error or e
                print(f"bench auto: {name} failed: {e!r}", file=sys.stderr)
        if not timings:
            # even the shipped config failed: surface the REAL error, not
            # an opaque empty-min crash
            raise first_error
        winner = min(timings, key=timings.get)
        # Greedy final candidate: hoisted MCB sketch fold on top of the
        # winner (identical math — fold_sketch_collection moves the
        # constant fold matmuls out of the step; exactness pinned in
        # tests/test_models.py::test_avvad_mcb_folded_vars_*). Skipped
        # when the env flag already hoisted every candidate.
        if not mcb_hoist and time.perf_counter() - t_start <= budget_s:
            try:
                from avvad_tpu.models.mcb import fold_sketch_collection

                cfg = {c[0]: c[1:] for c in candidates}[winner]
                mdl = model.clone(lstm_state_quant=cfg[1],
                                  mcb_folded_vars=True)
                name = winner + "+mcb_hoist"
                serves[name] = make_serve(mdl, cfg[0],
                                          fold_sketch_collection(variables))
                candidate_reps[name] = time_serve(
                    serves[name], n_iters=max(2, full_iters // 2), reps=3)
                timings[name] = min(candidate_reps[name])
                print(f"bench auto: {name}: "
                      f"{timings[name] * 1e3:.2f} ms/step", file=sys.stderr)
                winner = min(timings, key=timings.get)
            except Exception as e:
                print(f"bench auto: mcb_hoist failed: {e!r}", file=sys.stderr)
        print(f"bench auto: winner = {winner}", file=sys.stderr)
        rep_times = time_serve(serves[winner], n_iters=full_iters,
                               reps=full_reps)
        step_time = min(rep_times)
    audio_seconds = b * t / frame_rate
    rt_factor = audio_seconds / step_time

    shape_key = (f"b{b}_t{t}_int8{int8_mode}"
                 + ("_stem" if stem_int8 else "")
                 + ("_pallas" if pallas_tower else "")
                 + (f"_chunk{tower_chunk}" if tower_chunk else ""))
    extra = _gate_and_record("inference", shape_key,
                             winner + ("+mcb_hoist(env)" if mcb_hoist else ""),
                             step_time, rep_times, candidate_reps or None)
    print(json.dumps({
        "metric": "av_vad_inference_rt_factor",
        "value": round(rt_factor, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rt_factor / 50.0, 3),
        # which program produced the number (quality gates per config:
        # QUALITY.md "Combined candidates")
        "config": winner + ("+mcb_hoist(env)" if mcb_hoist else ""),
        **extra,
    }))


if __name__ == "__main__":
    _require_live_backend()
    if "--train-matrix" in sys.argv[1:] or \
            os.environ.get("AVVAD_BENCH_MODE") == "train_matrix":
        train_matrix_main()
    elif "--train" in sys.argv[1:] or \
            os.environ.get("AVVAD_BENCH_MODE") == "train":
        train_main()
    elif "--kernel-tripwire" in sys.argv[1:]:
        kernel_tripwire_main()
    else:
        main()
