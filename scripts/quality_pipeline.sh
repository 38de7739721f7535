#!/bin/bash
# End-to-end trained-quality pipeline on the subset fixture (VERDICT r1 #3):
# regenerate the processed tree, run the reference recipe (video pretrain ->
# frozen-trunk AV; audio standalone), evaluate the test split, score with
# accuracy/P/R/F1/AUC. Everything runs on the default (TPU) platform.
set -euo pipefail
cd /root/repo
Q=runs/quality
DR=$Q/data
D=$Q/data/subset/processed

echo "=== [1/8] build processed tree ==="
python scripts/create_train_files.py \
  --raw-dir /root/reference/data/subset/raw \
  --processed-dir "$D" --dataset-size subset \
  --splits train validation test --workers 4

echo "=== [2/8] video pretrain ==="
python scripts/train.py --config configs/reference_av.yaml --modality video \
  --data-root "$DR" --dataset-size subset --epochs 60 \
  --model-dir "$Q/video"

echo "=== [3/8] AV train (frozen trunk) ==="
python scripts/train.py --config configs/reference_av.yaml --modality av \
  --data-root "$DR" --dataset-size subset --epochs 100 \
  --pretrained-video "$Q/video" --model-dir "$Q/av"

echo "=== [4/8] audio train ==="
python scripts/train.py --config configs/reference_av.yaml --modality audio \
  --data-root "$DR" --dataset-size subset --epochs 100 \
  --model-dir "$Q/audio"

echo "=== [5/8] evaluate AV ==="
python scripts/evaluate.py --modality av --data-root "$DR" \
  --dataset-size subset --split test --checkpoint "$Q/av" \
  --output-dir "$Q/av_preds"

echo "=== [6/8] evaluate audio ==="
python scripts/evaluate.py --modality audio --data-root "$DR" \
  --dataset-size subset --split test --checkpoint "$Q/audio" \
  --output-dir "$Q/audio_preds"

echo "=== [7/8] score AV ==="
python scripts/run_metrics.py --data-root "$DR" --dataset-size subset \
  --split test --predictions-dir "$Q/av_preds" | tee "$Q/av_metrics.txt"

echo "=== [8/8] score audio ==="
python scripts/run_metrics.py --data-root "$DR" --dataset-size subset \
  --split test --predictions-dir "$Q/audio_preds" | tee "$Q/audio_metrics.txt"

echo "QUALITY PIPELINE DONE"
