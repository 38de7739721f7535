"""Dataset catalogs: filesystem path resolution for the supported corpora.

Pure-Python, no I/O beyond globbing. Emitted relative paths are verified
against the reference catalog's outputs in tests (tests/test_catalog.py).
"""

from .ntcd_timit import (
    NTCD_NOISE_TYPES,
    NTCD_SNRS,
    kaldi_list,
    noisy_clean_pair_dict,
    noisy_speech_dict,
    proc_noisy_clean_pair_dict,
    proc_video_audio_pair_dict,
    speech_list,
    video_list,
)
from . import csr1_wjs0
