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


@pytest.mark.slow
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


@pytest.mark.slow
def test_dp_tp_step_matches_single_device():
    """dp4 x tp2 mesh: the `model`-axis sharded step must agree numerically
    with the unsharded step (TP correctness, not just shape validity)."""
    from avvad_tpu.data.batching import Batch
    from avvad_tpu.models import AudioVAD
    from avvad_tpu.train import create_train_state, make_train_step

    b, t = 8, 12
    # hidden 512 -> 4H = 2048 = _TP_MIN_COLS, so w_ih/w_hh actually shard.
    model = AudioVAD(y_dim=1, lstm_hidden_size=512, lstm_layers=2)
    rng = jax.random.PRNGKey(0)
    audio = jax.random.normal(rng, (b, t, 513))
    label = (jax.random.uniform(rng, (b, t, 1)) > 0.5).astype(jnp.float32)
    batch = Batch(audio=audio, video=None, label=label,
                  lengths=jnp.full((b,), t, dtype=jnp.int32),
                  mask=jnp.ones((b, t)))

    state = create_train_state(model, rng, (audio,))
    step = make_train_step("audio", donate=False)
    new_single, metrics_single = step(state, batch, None)

    mesh = make_mesh(n_data=4, n_model=2)
    from avvad_tpu.parallel import shard_opt_state

    with mesh:
        state_sh = state.replace(
            params=shard_params(mesh, state.params),
            opt_state=shard_opt_state(mesh, state.opt_state))
        batch_sh = shard_batch(mesh, batch)
        new_sharded, metrics_sharded = step(state_sh, batch_sh, None)

    np.testing.assert_allclose(float(metrics_single["loss"]),
                               float(metrics_sharded["loss"]), rtol=1e-5)
    # updated params agree leaf-for-leaf, including the TP-sharded kernels
    flat_a = jax.tree_util.tree_leaves(new_single.params)
    flat_b = jax.tree_util.tree_leaves(new_sharded.params)
    for a, bb in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-5)


def test_opt_state_moments_carry_param_sharding():
    """Adam mu/nu for a TP-sharded kernel must carry the same PartitionSpec
    as the kernel itself — not be left replicated/unsharded."""
    from avvad_tpu.models import AudioVAD
    from avvad_tpu.parallel import shard_opt_state
    from avvad_tpu.train import create_train_state

    model = AudioVAD(y_dim=1, lstm_hidden_size=512, lstm_layers=1)
    rng = jax.random.PRNGKey(0)
    audio = jax.random.normal(rng, (2, 4, 513))
    state = create_train_state(model, rng, (audio,))

    mesh = make_mesh(n_data=4, n_model=2)
    params = shard_params(mesh, state.params)
    opt_state = shard_opt_state(mesh, state.opt_state)

    def specs_by_leafname(tree):
        out = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            names = [getattr(p, "key", str(p)) for p in path]
            if hasattr(leaf, "sharding"):
                out[tuple(names[-3:])] = leaf.sharding.spec
        return out

    pspecs = specs_by_leafname(params)
    sharded_keys = {k: v for k, v in pspecs.items()
                    if v == jax.sharding.PartitionSpec(None, "model")}
    assert sharded_keys, "expected at least one TP-sharded kernel"

    moment_specs = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(opt_state)[0]:
        names = [getattr(p, "key", str(p)) for p in path]
        if hasattr(leaf, "sharding") and leaf.ndim == 2:
            moment_specs[tuple(names[-3:])] = leaf.sharding.spec
    # every sharded param's mu and nu appear with the same spec
    for key, spec in sharded_keys.items():
        matches = [s for k, s in moment_specs.items() if k == key]
        assert matches, f"no Adam moments found for sharded param {key}"
        for s in matches:
            assert s == spec, f"moment for {key} has {s}, want {spec}"


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_multistream_serving_sharded_over_mesh_matches_single_device():
    """Serving scales over chips by sharding streams on the `data` axis
    (ticks are independent per stream — no collectives). Same feeds, same
    carries, probabilities must match the unmeshed server; stream resets
    must keep working on the sharded carries."""
    import numpy as np

    from avvad_tpu.models import AudioVAD, AVVAD
    from avvad_tpu.serve import MultiStreamAVVAD, MultiStreamVAD

    model = AudioVAD(y_dim=1, lstm_hidden_size=16, lstm_layers=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 513)))
    rng = np.random.default_rng(5)
    sigs = [np.clip(rng.normal(size=9000) * 0.3, -1, 1).astype(np.float32)
            for _ in range(8)]
    for s in sigs:
        s[0] = 1.0  # pin the causal peak

    mesh = make_mesh(n_data=8, n_model=1)

    def run(mesh_arg, pipelined=False):
        ms = MultiStreamVAD(model, variables, n_streams=8, block_frames=8,
                            max_backlog_blocks=256, mesh=mesh_arg)
        ms.warmup()  # must compile the same (sharded) signature as tick()
        outs = [[] for _ in range(8)]
        for i, s in enumerate(sigs):
            ms.feed(i, s)
        ms.reset_stream(3)  # exercise .at[].set on (possibly) sharded carries
        ms.feed(3, sigs[3])
        for _ in range(6):
            tick = ms.tick_pipelined if pipelined else ms.tick
            for i, p in tick().items():
                outs[i].append(p)
        if pipelined:
            for i, p in ms.flush_pipelined().items():
                outs[i].append(p)
        return [np.concatenate(o) if o else np.zeros(0) for o in outs]

    ref = run(None)
    got = run(mesh)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(g, r, atol=1e-6)
    # pipelined ticks over the mesh: same concatenated outputs (the
    # async D2H of a sharded pending tick must assemble correctly)
    piped = run(mesh, pipelined=True)
    for r, g in zip(ref, piped):
        assert len(g) >= len(r) - 8  # at most the undispatched tail block
        np.testing.assert_allclose(g[:len(r)][: len(g)], r[: len(g)],
                                   atol=1e-6)

    # AV variant: one sharded tick runs and matches unmeshed
    av = AVVAD(y_dim=1, lstm_hidden_size=16, lstm_layers=2, use_mcb=True)
    av_vars = av.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 513)),
                      jnp.zeros((1, 8, 67, 67)))
    vid = (rng.random((80, 67, 67)) * 255).astype(np.float32)

    def run_av(mesh_arg):
        ms = MultiStreamAVVAD(av, av_vars, n_streams=8, block_frames=8,
                              max_backlog_blocks=256, mesh=mesh_arg)
        outs = {}
        for i, s in enumerate(sigs):
            ms.feed(i, pcm=s, video_frames=vid)
        for _ in range(3):
            for i, p in ms.tick().items():
                outs.setdefault(i, []).append(p)
        return {i: np.concatenate(v) for i, v in outs.items()}

    ref_av = run_av(None)
    got_av = run_av(mesh)
    assert set(got_av) == set(ref_av)
    for i in ref_av:
        np.testing.assert_allclose(got_av[i], ref_av[i], atol=1e-5)

    # misconfigurations fail loudly
    import pytest

    with pytest.raises(ValueError, match="divisible"):
        MultiStreamVAD(model, variables, n_streams=6, block_frames=8,
                       mesh=mesh)
