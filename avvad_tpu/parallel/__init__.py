"""Scale-out: device meshes, shardings, SPMD train/eval steps.

Replaces the reference's single-process nn.DataParallel
(/root/reference/scripts/train_AV_net.py:193) and spawn-pool eval
(/root/reference/scripts/evaluate_AV_net.py:299-339) with a
`jax.sharding.Mesh` + NamedSharding design: batch arrays are sharded over
the `data` axis, parameters are replicated (with optional `model`-axis
sharding for the wide LSTM kernels), and XLA inserts the gradient psum over
ICI.
"""

from .distributed import (
    initialize_multihost,
    local_batch_slice,
    make_multihost_mesh,
)
from .mesh import (
    batch_sharding,
    make_mesh,
    opt_sharding_tree,
    param_sharding_rules,
    replicated,
    shard_batch,
    shard_opt_state,
    shard_params,
    sharding_tree,
)
