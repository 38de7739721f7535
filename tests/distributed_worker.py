"""Worker process for the real multi-process jax.distributed test.

Launched (2x) by tests/test_distributed.py. Each process owns 4 virtual
CPU devices; together they form one 8-device global mesh. Runs ONE
data-parallel train step on a deterministic synthetic batch — feeding
only its own host-local rows via local_batch_slice +
jax.make_array_from_process_local_data — and reports the loss, so the
launcher can pin dp-step equality against the single-process oracle.

Usage: python distributed_worker.py <coordinator> <n_proc> <pid> <out.json>
"""

import json
import sys

# env (JAX_PLATFORMS=cpu, xla_force_host_platform_device_count=4) is set
# by the launcher BEFORE python starts; only path setup happens here
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def main():
    coordinator, n_proc, pid, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    from avvad_tpu.parallel import (
        initialize_multihost,
        local_batch_slice,
        make_multihost_mesh,
    )

    assert initialize_multihost(coordinator, n_proc, pid)
    mesh = make_multihost_mesh(n_model=1)

    from avvad_tpu.models import AudioVAD

    model = AudioVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 513)))

    rng = np.random.default_rng(0)
    gb = 8
    x_global = rng.normal(size=(gb, 16, 513)).astype(np.float32)
    y_global = (rng.uniform(size=(gb, 16, 1)) > 0.5).astype(np.float32)

    # per-host loader: this process materializes ONLY its own rows
    sl = local_batch_slice(gb)
    bs = NamedSharding(mesh, P("data"))
    x = jax.make_array_from_process_local_data(bs, x_global[sl])
    y = jax.make_array_from_process_local_data(bs, y_global[sl])
    params = jax.device_put(variables, NamedSharding(mesh, P()))

    def loss_fn(p, x, y):
        logits = model.apply(p, x)
        per = (jnp.maximum(logits, 0) - logits * y
               + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        return jnp.mean(per)

    @jax.jit
    def step(p, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, y)
        new_p = jax.tree_util.tree_map(lambda w, g: w - 0.1 * g, p, grads)
        return loss, new_p

    loss, new_params = step(params, x, y)
    pnorm = jax.jit(lambda t: jnp.sqrt(sum(
        jnp.sum(v * v) for v in jax.tree_util.tree_leaves(t))))(new_params)

    with open(out_path, "w") as f:
        json.dump({
            "loss": float(loss),
            "pnorm": float(pnorm),
            "process_count": jax.process_count(),
            "n_devices": len(jax.devices()),
            "n_local_devices": len(jax.local_devices()),
            "local_slice": [sl.start, sl.stop],
        }, f)


if __name__ == "__main__":
    main()
