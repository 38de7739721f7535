"""Mesh/sharding tests on the virtual 8-device CPU platform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avvad_tpu.parallel import make_mesh, shard_batch, shard_params
from avvad_tpu.parallel.mesh import param_sharding_rules


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())
    mesh2 = make_mesh(n_data=4, n_model=2)
    assert mesh2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh(n_data=3, n_model=2)


def test_data_parallel_step_matches_single_device():
    """The sharded AV train step must compute the same loss as unsharded."""
    from avvad_tpu.data.batching import Batch
    from avvad_tpu.models import AudioVAD
    from avvad_tpu.train import create_train_state, make_train_step

    b, t = 8, 12
    model = AudioVAD(y_dim=1, lstm_hidden_size=16, lstm_layers=1)
    rng = jax.random.PRNGKey(0)
    audio = jax.random.normal(rng, (b, t, 513))
    label = (jax.random.uniform(rng, (b, t, 1)) > 0.5).astype(jnp.float32)
    batch = Batch(audio=audio, video=None, label=label,
                  lengths=jnp.full((b,), t, dtype=jnp.int32),
                  mask=jnp.ones((b, t)))

    state = create_train_state(model, rng, (audio,))
    step = make_train_step("audio", donate=False)
    _, metrics_single = step(state, batch, None)

    mesh = make_mesh(n_data=8, n_model=1)
    with mesh:
        state_sh = state.replace(params=shard_params(mesh, state.params))
        batch_sh = shard_batch(mesh, batch)
        _, metrics_sharded = step(state_sh, batch_sh, None)

    np.testing.assert_allclose(float(metrics_single["loss"]),
                               float(metrics_sharded["loss"]), rtol=1e-5)


def test_tp_sharding_rules_target_wide_lstm_kernels():
    big = np.zeros((513, 4096))
    small = np.zeros((513, 128))

    class K:  # fake flax DictKey
        def __init__(self, key):
            self.key = key

    spec_big = param_sharding_rules((K("lstm"), K("w_ih")), big)
    spec_small = param_sharding_rules((K("lstm"), K("w_ih")), small)
    spec_other = param_sharding_rules((K("conv1"), K("kernel")), big)
    assert spec_big == jax.sharding.PartitionSpec(None, "model")
    assert spec_small == jax.sharding.PartitionSpec()
    assert spec_other == jax.sharding.PartitionSpec()


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
