"""Input pipeline: utterance sources, padded/bucketed batching, prefetch.

Replaces the reference's torch Dataset/DataLoader/collate stack
(/root/reference/packages/data_handling.py, /root/reference/packages/utils.py)
with a framework-neutral numpy pipeline feeding jitted TPU steps:
- sources yield whole utterances (time-major numpy arrays),
- batches are zero-padded to bucketed lengths (static shapes per bucket, so
  jit retraces are bounded) with explicit length masks,
- an async prefetcher overlaps host loading with device compute.
"""

from .records import (
    load_audio_logspec,
    load_label,
    load_video,
    load_waveform,
)
from .sources import (
    AudioSequenceSource,
    AudioVisualSource,
    AudioVisualWaveformSource,
    AudioWaveformSource,
    FrameStore,
    SpectrogramChunkSource,
    SpectrogramFrameSource,
    SpectrogramWindowSource,
    VideoClipSource,
    VideoSequenceSource,
)
from .augment import AugmentingSource, feature_stats, mix_at_snr, synth_noise
from .batching import Batch, pad_batch, bucket_length
from .prewarm import planned_batch_shapes, prewarm_step
from .pipeline import DataLoader, Prefetcher
from .statistics import load_statistics, save_statistics, welford_merge
