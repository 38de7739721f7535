"""Jittable JAX/Pallas device ops — the TPU compute path.

Each op mirrors a host-side `avvad_tpu.processing` function (which carries
the reference-parity contract) but is traced/compiled by XLA with static
shapes, batched layouts, and MXU-friendly formulations.
"""

from .stft import (stft_frames, istft_frames, log_power_frontend,
                   frame_signal, frame_energy_vad, hann_window)
from .video import idct2_decode, make_idct_matrix, fps_resample_indices
