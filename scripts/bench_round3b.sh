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

# 2) headline bench: shipped config, then each candidate alone, then the
#    best combination (expected order: hop_dft +~7% if frontend is
#    MXU-bound; lstm int8 +~5-9% if the recurrence is MXU-bound)
run timeout 3600 python bench.py
AVVAD_BENCH_HOP_DFT=1 run timeout 3600 python bench.py
AVVAD_BENCH_LSTM_QUANT=int8 run timeout 3600 python bench.py
AVVAD_BENCH_LSTM_QUANT=bf16 run timeout 3600 python bench.py
AVVAD_BENCH_HOP_DFT=1 AVVAD_BENCH_LSTM_QUANT=int8 \
  run timeout 3600 python bench.py

# 3) if a winner emerges, make it the bench default (bench.py env
#    defaults), record the table in BENCH_NOTES.md, and re-run the
#    already-committed quality gates on hardware if numerics differ
#    from the CPU gates (they should not: both paths are
#    platform-agnostic fp32/int8 math).
echo "done -> $OUT"
