"""Utilities: profiling/tracing, torch-checkpoint import, misc helpers."""

from .profiling import PhaseTimer, trace
from .torch_import import (
    import_reference_audio_vad,
    import_reference_avvad,
    import_reference_video_vad,
    import_torch_lstm,
    import_torch_resnet18,
    load_torch_state_dict,
)
from .misc import count_parameters
from .cache import enable_compilation_cache
