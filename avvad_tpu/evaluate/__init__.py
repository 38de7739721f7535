"""Evaluation: sharded inference writers, per-utterance scoring, stats.

Covers the reference's evaluate_*_net.py / run_metrics_*_classif.py /
packages/metrics.py capability surface:
- `predict`: run a trained model over a split, save per-utterance hard and
  soft predictions (the reference's *_y_hat_{hard,soft}.pt writers,
  evaluate_AV_net.py:239-250 — .npy here),
- `classify`: per-utterance accuracy/precision/recall/F1 against targets,
- `stats`: 95% t-confidence intervals and grouped aggregation by
  SNR / noise type / speaker, plus SI-SDR/SI-SIR/SI-SAR decomposition.
"""

from .stats import (
    compute_stats,
    roc_auc,
    energy_ratios,
    mean_confidence_interval,
    si_sdr_components,
)
from .predict import (calibrate_quant_scales, evaluate_split,
                      planned_bucket_shapes, prediction_paths,
                      prewarm_predict, write_predictions)
from .classify import compute_metrics_utt, score_split, score_video_split
