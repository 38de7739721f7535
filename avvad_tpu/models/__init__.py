"""Flax model zoo: the reference's model families, re-designed for TPU.

  AudioVAD   <- DeepVAD_audio  (/root/reference/packages/models/Audio_Net.py:11)
  VideoVAD   <- DeepVAD_video  (/root/reference/packages/models/Video_Net.py:12)
  AVVAD      <- DeepVAD_AV     (/root/reference/packages/models/AV_Net.py:12)
  ResNet18   <- torchvision resnet18 trunk (the video feature tower)
  LSTMStack  <- packed nn.LSTM stacks, as lax.scan with fused input projections
  CompactBilinearPooling <- scatter_add+FFT MCB, as sketch-matmul + real-DFT
  WaveNetEncoder <- wavenet_autoencoder (dilated causal conv encoder)
"""

from .lstm import LSTMStack, lstm_import_torch_weights
from .resnet import ResNet18
from .mcb import CompactBilinearPooling, count_sketch_matrix
from .vad_nets import AudioVAD, VideoVAD, AVVAD, RawAudioVAD
from .quantize import calibrate as calibrate_int8
from .wavenet import WaveNetEncoder
from .losses import (
    binary_cross_entropy,
    binary_cross_entropy_2classes,
    f1_metrics,
    masked_sequence_bce,
    itakura_saito_divergence,
    elbo,
    mean_square_error_signal,
    mean_square_error_mask,
    magnitude_spectrum_approximation_loss,
    log_sum_exp,
    onehot,
    enumerate_discrete,
    init_normal,
)
