"""Host-side (numpy) signal processing.

Numerically matches the reference's L0 layer
(/root/reference/packages/processing/{stft.py,target.py,video.py}) so that
labels/features built by this framework are bit-compatible with the
reference's `data/*/processed` artifacts. The jittable on-device versions
of these ops live in `avvad_tpu.ops`.
"""

from .stft import stft, istft, log_power_spectrogram, hann_window, pad_for_stft
from .targets import (
    clean_speech_VAD,
    clean_speech_IBM,
    noise_robust_clean_speech_IBM,
    noise_aware_IBM,
    threshold_IBM,
)
from .audio_io import read_wav, write_wav
