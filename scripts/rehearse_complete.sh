#!/bin/bash
# Complete-corpus dress rehearsal (VERDICT r3 next-#4): synthesize a
# full NTCD-TIMIT-shaped raw tree (6 noises x 3 SNRs x 20 speakers x 10
# utts — thousands of files in the reference's u/drspeech raw-noisy
# layout), then drive the ENTIRE offline + training + evaluation chain
# at --dataset-size complete: create_train_files.py (audio + video
# builders with per-bin statistics), one audio and one AV training
# epoch, evaluate.py over the complete test split, run_metrics.py with
# the grouped per-SNR/per-noise tables. Records builder and loader
# throughput along the way. Everything only the subset layout had
# exercised before — path resolution at grid scale, builder pool
# throughput, bucketed loading over ~180-utterance splits — runs here.
set -euo pipefail
cd /root/repo
R=${REHEARSAL_DIR:-runs/rehearsal}
RAW=$R/data/raw
PROC=$R/data/processed
EPOCHS=${REHEARSAL_EPOCHS:-1}

echo "=== [1/6] synthesize the raw complete-mode tree ==="
[ -e "$RAW/ntcd_timit" ] || python scripts/synth_complete_corpus.py \
  --out "$RAW" --train-speakers 14 --dev-speakers 3 --test-speakers 3 \
  --utts 10
find "$RAW" -type f | wc -l | xargs echo "raw files:"

echo "=== [2/6] offline builders at complete size ==="
T0=$(date +%s)
python scripts/create_train_files.py --raw-dir "$RAW" \
  --processed-dir "$PROC" --dataset-size complete \
  --splits train validation test --workers 0
echo "builder wall: $(( $(date +%s) - T0 )) s" | tee "$R/builder_time.txt"
find "$PROC" -type f | wc -l | xargs echo "processed files:"

# train/evaluate read the quality-pipeline layout (<root>/<size>/processed)
mkdir -p "$R/data/complete"
[ -e "$R/data/complete/processed" ] || ln -s ../processed "$R/data/complete/processed"

echo "=== [3/6] audio training epoch(s) at complete size ==="
python scripts/train.py --config configs/reference_av.yaml --modality audio \
  --data-root "$R/data" --dataset-size complete --epochs "$EPOCHS" \
  --model-dir "$R/audio"

echo "=== [4/6] AV training epoch(s) at complete size ==="
python scripts/train.py --config configs/reference_av.yaml --modality av \
  --data-root "$R/data" --dataset-size complete --epochs "$EPOCHS" \
  --model-dir "$R/av"

echo "=== [5/6] evaluate + metrics over the complete test grid ==="
python scripts/evaluate.py --modality audio --data-root "$R/data" \
  --dataset-size complete --split test --checkpoint "$R/audio" \
  --output-dir "$R/audio_preds"
python scripts/run_metrics.py --data-root "$R/data" \
  --dataset-size complete --split test --predictions-dir "$R/audio_preds" \
  > "$R/audio_metrics.txt"
head -8 "$R/audio_metrics.txt"

echo "=== [6/6] AV evaluate + metrics ==="
python scripts/evaluate.py --modality av --data-root "$R/data" \
  --dataset-size complete --split test --checkpoint "$R/av" \
  --output-dir "$R/av_preds"
python scripts/run_metrics.py --data-root "$R/data" \
  --dataset-size complete --split test --predictions-dir "$R/av_preds" \
  > "$R/av_metrics.txt"
head -8 "$R/av_metrics.txt"

echo "COMPLETE-CORPUS REHEARSAL DONE"
