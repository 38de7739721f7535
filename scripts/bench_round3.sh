#!/bin/bash
# Round-3 TPU measurement pass, run serially (the tunneled backend's
# compile service queues globally — overlapping jobs starve each other).
set -uo pipefail
cd /root/repo
OUT=${1:-/tmp/bench_round3.log}
: > "$OUT"

run() {
  echo "=== $* ===" >> "$OUT"
  "$@" >> "$OUT" 2>&1
  echo "--- rc=$? ---" >> "$OUT"
}

# 1) headline as shipped (warms the driver's bench cache too)
run python bench.py
# 2) bigger serving batches (VERDICT #2): LSTM rows are free to B=128
AVVAD_BENCH_B=96 run python bench.py
AVVAD_BENCH_B=128 run python bench.py
# 3) streaming: f32 wire vs uint8 wire, int8 tower (VERDICT #6/#7)
run python scripts/bench_streaming.py --av --ticks 40
run python scripts/bench_streaming.py --av --av-u8 --ticks 40
run python scripts/bench_streaming.py --av --av-int8 --ticks 40
run python scripts/bench_streaming.py --av --av-int8 --av-u8 --ticks 40
# 4) remaining BASELINE.json configs (VERDICT #5)
run python scripts/bench_modalities.py --configs audio wavenet video
echo "ALL DONE" >> "$OUT"
