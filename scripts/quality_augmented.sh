#!/bin/bash
# Augmented-grid quality study (VERDICT r2 next-#4): retrain audio + AV on
# the synthesized 6-noise x 3-SNR grid (data.augment), then score BOTH the
# augmented and the round-2 single-condition models over the full grid test
# split (synth_noisy_testset.py must have rendered it first), producing the
# per-SNR / per-noise AUC tables behind the AV-vs-audio analysis in
# QUALITY.md. Self-contained: step [0/8] renders the synthetic grid and
# aliases the complete/ layout. Runs on the default (TPU) platform.
set -euo pipefail
cd /root/repo
Q=runs/quality
DR=$Q/data

echo "=== [0/8] render the synthetic grid (idempotent) ==="
# The grouped-stats scoring below runs with --dataset-size complete; the
# quality-pipeline data root only has a subset tree, so alias it (the
# catalog's complete/subset distinction is a directory-layout choice, and
# the synthesized Noisy/<kind>/<snr>/ grid mirrors the complete layout).
[ -e "$DR/complete" ] || ln -s subset "$DR/complete"
# Render dev+test so static-int8 calibration has a non-test split to
# draw from (the synthesized grid has no train split).
python scripts/synth_noisy_testset.py --data-root "$DR" \
  --splits validation test --seed 123

echo "=== [1/8] audio train (augmented grid) ==="
python scripts/train.py --config configs/reference_av.yaml --modality audio \
  --data-root "$DR" --dataset-size subset --epochs 100 --augment \
  --model-dir "$Q/audio_aug" --resume
python scripts/summarize_training.py "$Q/audio_aug" \
  --json-out "$Q/audio_aug/curve.json"

echo "=== [2/8] AV train (augmented grid, frozen round-2 video trunk) ==="
python scripts/train.py --config configs/reference_av.yaml --modality av \
  --data-root "$DR" --dataset-size subset --epochs 100 --augment \
  --pretrained-video "$Q/video" --model-dir "$Q/av_aug" --resume
python scripts/summarize_training.py "$Q/av_aug" \
  --json-out "$Q/av_aug/curve.json"

echo "=== [3/8] evaluate augmented models on the full grid ==="
python scripts/evaluate.py --modality audio --data-root "$DR" \
  --dataset-size complete --split test --checkpoint "$Q/audio_aug" \
  --output-dir "$Q/audio_aug_preds"
python scripts/evaluate.py --modality av --data-root "$DR" \
  --dataset-size complete --split test --checkpoint "$Q/av_aug" \
  --output-dir "$Q/av_aug_preds"

echo "=== [4/8] evaluate round-2 (single-condition) models on the grid ==="
python scripts/evaluate.py --modality audio --data-root "$DR" \
  --dataset-size complete --split test --checkpoint "$Q/audio" \
  --output-dir "$Q/audio_grid_preds"
python scripts/evaluate.py --modality av --data-root "$DR" \
  --dataset-size complete --split test --checkpoint "$Q/av" \
  --output-dir "$Q/av_grid_preds"

echo "=== [5/8] score augmented models ==="
python scripts/run_metrics.py --data-root "$DR" --dataset-size complete \
  --split test --predictions-dir "$Q/audio_aug_preds" \
  | tee "$Q/audio_aug_metrics.txt"
python scripts/run_metrics.py --data-root "$DR" --dataset-size complete \
  --split test --predictions-dir "$Q/av_aug_preds" \
  | tee "$Q/av_aug_metrics.txt"

echo "=== [6/8] score round-2 models on the grid ==="
python scripts/run_metrics.py --data-root "$DR" --dataset-size complete \
  --split test --predictions-dir "$Q/audio_grid_preds" \
  | tee "$Q/audio_grid_metrics.txt"
python scripts/run_metrics.py --data-root "$DR" --dataset-size complete \
  --split test --predictions-dir "$Q/av_grid_preds" \
  | tee "$Q/av_grid_metrics.txt"

echo "=== [7/8] fixture-condition scores (comparable to round 2 table) ==="
python scripts/evaluate.py --modality audio --data-root "$DR" \
  --dataset-size subset --split test --checkpoint "$Q/audio_aug" \
  --output-dir "$Q/audio_aug_preds_subset"
python scripts/evaluate.py --modality av --data-root "$DR" \
  --dataset-size subset --split test --checkpoint "$Q/av_aug" \
  --output-dir "$Q/av_aug_preds_subset"
python scripts/run_metrics.py --data-root "$DR" --dataset-size subset \
  --split test --predictions-dir "$Q/audio_aug_preds_subset" \
  | tee "$Q/audio_aug_metrics_subset.txt"
python scripts/run_metrics.py --data-root "$DR" --dataset-size subset \
  --split test --predictions-dir "$Q/av_aug_preds_subset" \
  | tee "$Q/av_aug_metrics_subset.txt"

echo "=== [7b/8] int8 gate over the full grid (54 utterances) ==="
python scripts/evaluate.py --modality av --data-root "$DR" \
  --dataset-size complete --split test --checkpoint "$Q/av_aug" \
  --tower-int8 --tower-quant-mode static --calibrate-split validation \
  --output-dir "$Q/av_aug_preds_int8"
python scripts/run_metrics.py --data-root "$DR" --dataset-size complete \
  --split test --predictions-dir "$Q/av_aug_preds_int8" \
  | tee "$Q/av_aug_metrics_int8.txt"

echo "=== [8/8] video-only baseline on the fixture (AUC context) ==="
python scripts/evaluate.py --modality video --data-root "$DR" \
  --dataset-size subset --split test --checkpoint "$Q/video" \
  --output-dir "$Q/video_preds" || true
python scripts/run_metrics.py --data-root "$DR" --dataset-size subset \
  --split test --predictions-dir "$Q/video_preds" --video-classif \
  | tee "$Q/video_metrics.txt" || true

echo "AUGMENTED QUALITY STUDY DONE"
