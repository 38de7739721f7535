"""Post-training int8 calibration for the video tower.

The trunk's W8A8 path (models/resnet.py) has three activation-scale modes:

- "dynamic": per-tensor max-abs computed on the fly. Numerically the
  safest, but every quantization costs an extra full read of the f32
  activation (the reduce) and forces the f32 buffer to materialize in HBM
  — measured in round 1, this ate the int8 MXU win almost entirely.
- "calibrate": dynamic math, plus it records the running max of every
  quantization point into the `quant` variable collection.
- "static": uses the recorded scales. The quantize chain is then pure
  elementwise work that XLA fuses into the producing op's epilogue, so
  stage activations materialize in HBM as int8: 4x less activation
  bandwidth AND a 4x lower activation-memory ceiling (bigger serving
  batches before OOM).

Typical use (serving):

    model      = AVVAD(..., tower_int8=True, tower_quant_mode="static")
    cal_model  = model.clone(tower_quant_mode="calibrate")
    variables  = calibrate(cal_model, variables, calibration_batches,
                           train=False)
    probs = jax.nn.sigmoid(model.apply(variables, audio, video))

Calibration data should cover the deployment input distribution; a few
hundred frames is plenty for per-tensor max-abs scales.
"""

from __future__ import annotations

from typing import Iterable, Sequence


def calibrate(cal_model, variables: dict, batches: Iterable[Sequence],
              **apply_kwargs) -> dict:
    """Run calibration batches through a quant_mode="calibrate" model.

    `batches` yields positional-argument tuples for `cal_model.apply`
    (e.g. `(audio, video)` for AVVAD, `(video,)` for VideoVAD);
    `apply_kwargs` are passed to every apply (e.g. train=False,
    video_frame_indices=...). Returns `variables` with the calibrated
    `quant` collection merged in (other collections untouched). The model
    is then served with quant_mode="static" on the returned variables.
    """
    variables = dict(variables)
    for batch in batches:
        if not isinstance(batch, (tuple, list)):
            batch = (batch,)
        _, updated = cal_model.apply(variables, *batch, mutable=["quant"],
                                     **apply_kwargs)
        variables["quant"] = updated["quant"]
    return variables
