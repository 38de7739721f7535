"""Training: jitted SPMD steps, state, loops, checkpoints.

Replaces the reference's three ~400-line eager training scripts
(/root/reference/scripts/train_{audio,video,AV}_net.py) with one trainer
parameterized by modality. Differences by design:
- the whole step (normalize -> forward -> masked BCE -> Adam update ->
  metrics) is one compiled XLA program, run under a device mesh,
- checkpoints (Orbax) carry params + optimizer state + normalization stats
  (the reference saved model weights only, :441-448),
- logging still lands in output_batch.log / output_epoch.log for
  side-by-side comparison with reference runs.
"""

from .state import TrainState, create_train_state
from .steps import make_eval_step, make_train_step
from .trainer import Trainer
from .checkpoint import restore_checkpoint, save_checkpoint, latest_checkpoint
