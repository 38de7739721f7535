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


def _honor_env_platforms() -> None:
    """Restore JAX_PLATFORMS env semantics.

    The ambient TPU-tunnel sitecustomize pins jax_platforms to the
    tunnel backend programmatically at interpreter start, silently
    overriding the documented JAX_PLATFORMS env var — so
    `JAX_PLATFORMS=cpu python scripts/...` would still dispatch to the
    (possibly unreachable) tunnel. Re-apply the env choice at package
    import, before any backend initializes — but ONLY over the
    sitecustomize's own pin: a config value changed in-process after
    interpreter start (e.g. jax.config.update("jax_platforms", "cpu")
    before importing this package) always wins over the ambient env.
    """
    import os

    val = os.environ.get("JAX_PLATFORMS")
    if not val:
        return
    import jax

    current = jax.config.jax_platforms
    # "axon,..." is the tunnel sitecustomize's pin; anything else at this
    # point was set deliberately in-process — leave it alone. Compare
    # leading platforms so env=axon does not strip the pin's cpu fallback.
    if current is not None and not current.startswith("axon"):
        return
    if current is None or current.split(",")[0] != val.split(",")[0]:
        jax.config.update("jax_platforms", val)


_honor_env_platforms()
