"""Worker process for the real multi-process jax.distributed test.

Launched (2x or 4x) by tests/test_distributed.py. Each process owns
8/n_proc virtual CPU devices; together they form one 8-device global
mesh. Three phases, each pinned by the launcher against a
single-process oracle:

1. ONE data-parallel train step on a deterministic synthetic batch —
   feeding only its own host-local rows via local_batch_slice +
   jax.make_array_from_process_local_data — reporting the loss.
2. Orbax checkpoint round-trip under jax.distributed: process 0 writes
   the stepped params through train.checkpoint.save_checkpoint, all
   hosts barrier then restore and verify bitwise equality with their
   in-memory replicas (the multi-host analog of resume).
3. Distributed evaluation: the utterance list is sharded across
   processes (the reference's spawn-pool fan-out,
   /root/reference/scripts/evaluate_audio_net.py:216-257), each host
   runs jitted batch-1 inference on its shard only, and per-utterance
   correct/total counts are merged with process_allgather.

Usage: python distributed_worker.py <coordinator> <n_proc> <pid> \
           <out.json> <ckpt_dir>
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


def eval_utterance(i, model, variables):
    """Deterministic synthetic utterance i -> (n_correct, n_frames) under
    jitted batch-1 inference (the shape the reference's eval pool runs)."""
    rng = np.random.default_rng(100 + i)
    T = int(rng.integers(6, 20))
    x = jnp.asarray(rng.normal(size=(1, T, 513)).astype(np.float32))
    y = (rng.uniform(size=(1, T, 1)) > 0.5).astype(np.float32)
    logits = jax.jit(model.apply)(variables, x)
    hard = np.asarray(jax.nn.sigmoid(logits) > 0.5, dtype=np.float32)
    return float((hard == y).sum()), float(y.size)


def main():
    coordinator, n_proc, pid, out_path, ckpt_dir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        sys.argv[5])

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

    # --- phase 2: checkpoint round-trip (process-0 write, all-host
    # restore). Params are replicated, so every host holds a full copy;
    # the write is host-side numpy through the repo's own save path.
    import types

    from jax.experimental import multihost_utils

    from avvad_tpu.train.checkpoint import latest_checkpoint, save_checkpoint

    host_params = jax.tree_util.tree_map(
        lambda a: np.asarray(jax.device_get(a)), new_params)
    # Orbax save is itself a cross-process collective: EVERY process calls
    # it; for host (numpy) trees only the primary process writes bytes
    state = types.SimpleNamespace(params=host_params, opt_state={},
                                  step=1, batch_stats=None, sketch=None,
                                  quant=None)
    save_checkpoint(ckpt_dir, state, epoch=1, valid_loss=0.0)
    multihost_utils.sync_global_devices("ckpt_written")
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(
        os.path.abspath(latest_checkpoint(ckpt_dir)), target=None)
    ckpt_equal = all(
        np.array_equal(a, b) for a, b in zip(
            jax.tree_util.tree_leaves(host_params),
            jax.tree_util.tree_leaves(restored["params"])))

    # --- phase 3: distributed evaluation — shard utterances by process,
    # jitted batch-1 inference on host-local devices only, merge counts
    n_utts = 6
    my_utts = np.array_split(np.arange(n_utts), n_proc)[pid]
    local = np.zeros(2, dtype=np.float32)
    for i in my_utts:
        c, t = eval_utterance(int(i), model, variables)
        local += [c, t]
    merged = np.asarray(multihost_utils.process_allgather(local)).sum(axis=0)
    eval_accuracy = float(merged[0] / merged[1])

    with open(out_path, "w") as f:
        json.dump({
            "loss": float(loss),
            "pnorm": float(pnorm),
            "process_count": jax.process_count(),
            "n_devices": len(jax.devices()),
            "n_local_devices": len(jax.local_devices()),
            "local_slice": [sl.start, sl.stop],
            "ckpt_equal": bool(ckpt_equal),
            "eval_shard": [int(i) for i in my_utts],
            "eval_accuracy": eval_accuracy,
        }, f)


if __name__ == "__main__":
    main()
