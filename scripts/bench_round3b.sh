#!/usr/bin/env bash
# One-shot measurement plan for the two quality-gated, timing-pending
# round-3 candidates (BENCH_NOTES.md "late session"): run on a live TPU.
# Each step appends to $OUT; flip the bench defaults only for winners.
set -uo pipefail
cd /root/repo
OUT=${1:-/tmp/bench_round3b.log}
run() { echo "=== $* ===" | tee -a "$OUT"; "$@" 2>&1 | tee -a "$OUT"; }

# 0) tunnel sanity (jax.devices() HANGS when the tunnel is dead — probe
#    the relay port first)
timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8082' \
  || { echo "TPU tunnel down; aborting" | tee -a "$OUT"; exit 1; }

# 1) component probe: MXU vs VPU split of the LSTM step, quantized
#    variants, and direct-vs-hop frontend timing
run timeout 1800 python scripts/bench_lstm_probe.py --iters 30

# 2) headline bench: the auto ladder (AVVAD_BENCH_AUTO default) times
#    shipped, hop_dft+lstm_int8, hop_dft, lstm_int8, then the hoisted
#    MCB fold on the interim winner, and full-measures the fastest —
#    one invocation covers the whole candidate table (stderr has the
#    per-candidate ms/step lines).
AVVAD_BENCH_AUTO_BUDGET_S=3000 run timeout 4800 python bench.py
# bf16 LSTM state is the one gated candidate outside the ladder
AVVAD_BENCH_LSTM_QUANT=bf16 run timeout 3600 python bench.py

# 2b) streaming tick: span audio wire (+ hop-DFT frontend) on top of the
#     shipped uint8+int8 config — bit-exact wire change, payload
#     4.4 -> 2.9 MB/tick at 32 streams (BENCH_NOTES "span audio wire")
run timeout 1800 python scripts/bench_streaming.py --av-int8 --av-u8
run timeout 1800 python scripts/bench_streaming.py --av-int8 --av-u8 --audio-span
run timeout 1800 python scripts/bench_streaming.py --av-int8 --av-u8 --hop-dft

# 3) record the candidate table in BENCH_NOTES.md (the ladder already
#    ships the winner as the headline); re-run the committed quality
#    gates on hardware only if numerics differ from the CPU gates (they
#    should not: both paths are platform-agnostic fp32/int8 math).

# 4) serving-artifact overhead check: an exported StableHLO program
#    should run at jit speed (same compiled executable, different entry
#    path). Times direct jit vs artifact.call at a small serving shape.
run timeout 1800 python - <<'EOF'
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from avvad_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from avvad_tpu.models import AVVAD
from avvad_tpu.export import ServingArtifact, make_waveform_serving_fn
t, b = 64, 8
n = 256 * (t - 1) + 1024
model = AVVAD(lstm_hidden_size=1024, lstm_layers=2, use_mcb=True,
              dtype=jnp.bfloat16)
wave = jax.random.normal(jax.random.PRNGKey(0), (b, n))
video = jax.random.normal(jax.random.PRNGKey(1), (b, t, 67, 67))
variables = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 4, 513)),
                       jnp.zeros((1, 4, 67, 67)))
fn = make_waveform_serving_fn(model, variables, t_frames=t)
jitted = jax.jit(fn)
art = ServingArtifact.build({"e": (fn, (wave, video))})
def clock(f):
    out = f(wave, video); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(wave, video)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / 20
print(f"direct jit: {clock(jitted)*1e3:.2f} ms; "
      f"artifact.call: {clock(lambda *a: art.call('e', *a))*1e3:.2f} ms")
EOF
echo "done -> $OUT"
