"""avvad_tpu — a TPU-native audio-visual voice-activity-detection framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the PyTorch
reference `sp-uhh/audio-visual-vad` (Ariav & Cohen, IEEE JSTSP 2019):
frame-level speech / non-speech classification of STFT frames from audio
(noisy log-power spectrograms), video (67x67 lip-region crops), or a fused
audio-visual stream, trained on the NTCD-TIMIT corpus.

Layout (mirrors the reference's capability surface, not its code):
  processing/  host-side (numpy) DSP: STFT, VAD/IBM targets, lip-video decode
  ops/         jittable JAX/Pallas device ops: STFT frontend, IDCT, MCB, LSTM
  datasets/    dataset catalogs (NTCD-TIMIT, CSR-1-WSJ-0 path resolution)
  data/        input pipeline: readers, batching/padding, device prefetch
  models/      Flax models: AudioVAD, VideoVAD, AVVAD, ResNet-18, WaveNet
  parallel/    mesh / sharding / pjit scale-out (replaces DataParallel)
  train/       training loops (optax + Orbax checkpoints)
  evaluate/    sharded inference, prediction writers, metrics, stats
  utils/       config system, logging, misc
"""

__version__ = "0.1.0"
