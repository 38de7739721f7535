#!/usr/bin/env bash
# One-shot measurement plan for the two quality-gated, timing-pending
# round-3 candidates (BENCH_NOTES.md "late session"): run on a live TPU.
# Each step appends to $OUT; flip the bench defaults only for winners.
#
# EXECUTED 2026-08-18; results recorded in BENCH_NOTES.md "Round 3
# hardware results". Kept as the reproducible harness.
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
#    path). Times direct jit vs artifact.call at a small serving shape,
#    with the chained data-dependency + value-fetch methodology.
run timeout 1800 python scripts/bench_artifact_overhead.py --iters 20
echo "done -> $OUT"
