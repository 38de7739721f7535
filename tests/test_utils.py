"""Utils tests: torch checkpoint import, profiling, param count."""

import numpy as np
import jax
import jax.numpy as jnp


def _fake_torchvision_resnet18_state(rng, prefix="features."):
    """Synthesize a state dict with torchvision's trunk names/shapes
    (Sequential-index form, as the reference's checkpoints store it)."""
    s = {}

    def conv(o, i, k):
        return rng.normal(size=(o, i, k, k)).astype(np.float32)

    def bn(pfx, c):
        s[f"{pfx}.weight"] = rng.normal(size=c).astype(np.float32)
        s[f"{pfx}.bias"] = rng.normal(size=c).astype(np.float32)
        s[f"{pfx}.running_mean"] = rng.normal(size=c).astype(np.float32)
        s[f"{pfx}.running_var"] = np.abs(rng.normal(size=c)).astype(np.float32) + 0.5

    s[prefix + "0.weight"] = conv(64, 3, 7)
    bn(prefix + "1", 64)
    widths = [64, 128, 256, 512]
    for stage, seq_idx in enumerate([4, 5, 6, 7]):
        w = widths[stage]
        w_in = widths[stage - 1] if stage > 0 else 64
        for block in range(2):
            t = f"{prefix}{seq_idx}.{block}"
            cin = w_in if block == 0 else w
            s[f"{t}.conv1.weight"] = conv(w, cin, 3)
            bn(f"{t}.bn1", w)
            s[f"{t}.conv2.weight"] = conv(w, w, 3)
            bn(f"{t}.bn2", w)
            if block == 0 and stage > 0:
                s[f"{t}.downsample.0.weight"] = conv(w, cin, 1)
                bn(f"{t}.downsample.1", w)
    return s


def test_import_torch_resnet18_structure_and_numerics():
    from avvad_tpu.models import ResNet18
    from avvad_tpu.utils import import_torch_resnet18

    rng = np.random.default_rng(0)
    state = _fake_torchvision_resnet18_state(rng)
    params, stats = import_torch_resnet18(state)

    # must slot into the flax model and run
    model = ResNet18()
    x = jnp.asarray(rng.normal(size=(2, 67, 67, 3)).astype(np.float32))
    ref_vars = model.init(jax.random.PRNGKey(0), x)
    # identical tree structure
    assert jax.tree_util.tree_structure(ref_vars["params"]) == \
        jax.tree_util.tree_structure(jax.tree_util.tree_map(jnp.asarray, params))
    y = model.apply({"params": params, "batch_stats": stats}, x)
    assert y.shape == (2, 512)
    assert np.isfinite(np.asarray(y)).all()

    # a known kernel round-trips with the OIHW->HWIO transpose
    np.testing.assert_array_equal(
        np.asarray(params["conv1"]["kernel"]),
        state["features.0.weight"].transpose(2, 3, 1, 0),
    )


def test_import_into_video_tower_and_freeze_path():
    """Imported trunk slots under the AVVAD 'tower/features' subtree."""
    from avvad_tpu.models import AVVAD
    from avvad_tpu.utils import import_torch_resnet18

    rng = np.random.default_rng(1)
    params, stats = import_torch_resnet18(_fake_torchvision_resnet18_state(rng))

    model = AVVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1, use_mcb=False)
    a = jnp.zeros((1, 2, 513))
    v = jnp.zeros((1, 2, 67, 67))
    variables = model.init(jax.random.PRNGKey(0), a, v)
    new_params = dict(variables["params"])
    tower = dict(new_params["tower"])
    tower["features"] = jax.tree_util.tree_map(jnp.asarray, params)
    new_params["tower"] = tower
    new_stats = dict(variables["batch_stats"])
    tower_stats = dict(new_stats["tower"])
    tower_stats["features"] = jax.tree_util.tree_map(jnp.asarray, stats)
    new_stats["tower"] = tower_stats

    y = model.apply({"params": new_params, "batch_stats": new_stats}, a, v)
    assert y.shape == (1, 2, 1)


def test_phase_timer_report():
    import time

    from avvad_tpu.utils import PhaseTimer

    t = PhaseTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    rep = t.report()
    assert "a" in rep and "b" in rep and t.counts["a"] == 2


def test_count_parameters():
    from avvad_tpu.utils import count_parameters

    params = {"w": np.zeros((3, 4)), "b": np.zeros(4)}
    assert count_parameters(params) == 16


def test_profiler_trace_context(tmp_path):
    import jax.numpy as jnp

    from avvad_tpu.utils import trace

    with trace(str(tmp_path)):
        (jnp.ones((8, 8)) * 2).block_until_ready()
    import os

    assert any("plugins" in d for d, _, _ in
               [(r, d, f) for r, d, f in os.walk(tmp_path)][:10]) or \
        len(list(tmp_path.iterdir())) > 0


def test_import_reference_avvad_full_checkpoint():
    """A complete DeepVAD_AV-shaped torch state dict assembles into AVVAD
    variables (trunk + BN stats + LSTM + head + MCB buffers) and runs."""
    import jax.numpy as jnp

    from avvad_tpu.models import AVVAD
    from avvad_tpu.utils import import_reference_avvad

    rng = np.random.default_rng(0)
    h, y_dim, mcb_out = 32, 1, 64
    state = _fake_torchvision_resnet18_state(rng)

    def lstm_keys(prefix, d, hh, layers=2):
        for layer in range(layers):
            din = d if layer == 0 else hh
            state[f"{prefix}.weight_ih_l{layer}"] = rng.normal(
                size=(4 * hh, din)).astype(np.float32) * 0.05
            state[f"{prefix}.weight_hh_l{layer}"] = rng.normal(
                size=(4 * hh, hh)).astype(np.float32) * 0.05
            state[f"{prefix}.bias_ih_l{layer}"] = rng.normal(
                size=4 * hh).astype(np.float32) * 0.05
            state[f"{prefix}.bias_hh_l{layer}"] = rng.normal(
                size=4 * hh).astype(np.float32) * 0.05

    lstm_keys("lstm_merged", mcb_out, h)
    state["vad_merged.weight"] = rng.normal(size=(y_dim, h)).astype(np.float32)
    state["vad_merged.bias"] = rng.normal(size=y_dim).astype(np.float32)
    state["mcb.sketch1.h"] = rng.integers(0, mcb_out, 513)
    state["mcb.sketch1.s"] = (rng.integers(0, 2, 513) * 2 - 1).astype(np.float32)
    state["mcb.sketch2.h"] = rng.integers(0, mcb_out, 512)
    state["mcb.sketch2.s"] = (rng.integers(0, 2, 512) * 2 - 1).astype(np.float32)
    state["mcb_bn.weight"] = np.ones(mcb_out, np.float32)
    state["mcb_bn.bias"] = np.zeros(mcb_out, np.float32)
    state["mcb_bn.running_mean"] = np.zeros(mcb_out, np.float32)
    state["mcb_bn.running_var"] = np.ones(mcb_out, np.float32)

    model = AVVAD(y_dim=y_dim, lstm_hidden_size=h, lstm_layers=2,
                  use_mcb=True, mcb_output_size=mcb_out)
    audio = jnp.asarray(rng.normal(size=(1, 3, 513)).astype(np.float32))
    video = jnp.asarray(rng.normal(size=(1, 3, 67, 67)).astype(np.float32))
    init_vars = model.init(jax.random.PRNGKey(0), audio, video)

    variables = import_reference_avvad(state, model, init_vars)
    # same tree structure as init (checkpoint-compatible)
    assert jax.tree_util.tree_structure(
        jax.tree_util.tree_map(jnp.asarray, variables["params"])
    ) == jax.tree_util.tree_structure(init_vars["params"])

    # sketch matrices reproduce (h, s)
    m1 = np.asarray(variables["sketch"]["mcb"]["sketch1"])
    hh = state["mcb.sketch1.h"]
    assert (m1[np.arange(513), hh] == state["mcb.sketch1.s"]).all()
    assert (np.abs(m1).sum(axis=1) == 1).all()

    y = model.apply(variables, audio, video)
    assert y.shape == (1, 3, 1)
    assert np.isfinite(np.asarray(y)).all()

    # the imported LSTM+head must match torch on the fused features
    import torch

    feats = rng.normal(size=(1, 3, mcb_out)).astype(np.float32)
    t_lstm = torch.nn.LSTM(mcb_out, h, num_layers=2, batch_first=True)
    t_lin = torch.nn.Linear(h, y_dim)
    with torch.no_grad():
        for k, v in t_lstm.state_dict().items():
            v.copy_(torch.from_numpy(state[f"lstm_merged.{k}"]))
        t_lin.weight.copy_(torch.from_numpy(state["vad_merged.weight"]))
        t_lin.bias.copy_(torch.from_numpy(state["vad_merged.bias"]))
        ref_out = t_lin(t_lstm(torch.from_numpy(feats))[0]).numpy()

    from avvad_tpu.models import LSTMStack
    import flax.linen as fnn

    ours = LSTMStack(hidden_size=h, num_layers=2).apply(
        {"params": variables["params"]["lstm_merged"]}, jnp.asarray(feats))
    ours = fnn.Dense(y_dim).apply(
        {"params": variables["params"]["vad_merged"]}, ours)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-5)


def test_import_reference_audio_and_video_vad():
    import jax.numpy as jnp

    from avvad_tpu.models import AudioVAD, VideoVAD
    from avvad_tpu.utils import (import_reference_audio_vad,
                                 import_reference_video_vad)

    rng = np.random.default_rng(3)
    h = 16
    # audio
    state = {}
    for layer in range(2):
        din = 513 if layer == 0 else h
        state[f"lstm_audio.weight_ih_l{layer}"] = rng.normal(size=(4*h, din)).astype(np.float32) * 0.05
        state[f"lstm_audio.weight_hh_l{layer}"] = rng.normal(size=(4*h, h)).astype(np.float32) * 0.05
        state[f"lstm_audio.bias_ih_l{layer}"] = np.zeros(4*h, np.float32)
        state[f"lstm_audio.bias_hh_l{layer}"] = np.zeros(4*h, np.float32)
    state["vad_audio.weight"] = rng.normal(size=(1, h)).astype(np.float32)
    state["vad_audio.bias"] = np.zeros(1, np.float32)

    model = AudioVAD(y_dim=1, lstm_hidden_size=h, lstm_layers=2)
    x = jnp.asarray(rng.normal(size=(1, 4, 513)).astype(np.float32))
    variables = import_reference_audio_vad(state, model.init(jax.random.PRNGKey(0), x))
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["lstm_audio"]["layer_0"]["w_ih"]),
        state["lstm_audio.weight_ih_l0"].T)
    assert np.isfinite(np.asarray(model.apply(variables, x))).all()

    # video
    vstate = _fake_torchvision_resnet18_state(rng)
    for layer in range(1):
        vstate[f"lstm_video.weight_ih_l{layer}"] = rng.normal(size=(4*h, 512)).astype(np.float32) * 0.05
        vstate[f"lstm_video.weight_hh_l{layer}"] = rng.normal(size=(4*h, h)).astype(np.float32) * 0.05
        vstate[f"lstm_video.bias_ih_l{layer}"] = np.zeros(4*h, np.float32)
        vstate[f"lstm_video.bias_hh_l{layer}"] = np.zeros(4*h, np.float32)
    vstate["vad_video.weight"] = rng.normal(size=(1, h)).astype(np.float32)
    vstate["vad_video.bias"] = np.zeros(1, np.float32)

    vmodel = VideoVAD(y_dim=1, lstm_hidden_size=h, lstm_layers=1)
    v = jnp.asarray(rng.normal(size=(1, 2, 67, 67)).astype(np.float32))
    vv = import_reference_video_vad(vstate, vmodel.init(jax.random.PRNGKey(1), v))
    y = vmodel.apply(vv, v)
    assert y.shape == (1, 2, 1) and np.isfinite(np.asarray(y)).all()


def test_env_platforms_honored_in_subprocess():
    """Importing avvad_tpu restores JAX_PLATFORMS env semantics that the
    ambient TPU-tunnel sitecustomize overrides — so JAX_PLATFORMS=cpu
    scripts actually run on CPU (and cannot hang on a dead tunnel)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c",
         "import avvad_tpu, jax; print(jax.config.jax_platforms)"],
        capture_output=True, text=True, env=env, timeout=120, cwd=cwd)
    assert r.returncode == 0, r.stderr[-500:]
    assert r.stdout.strip().splitlines()[-1] == "cpu"

    # ...but an explicit in-process config choice made BEFORE importing
    # the package always beats the ambient env (the hook only undoes the
    # sitecustomize pin, never a deliberate jax.config.update)
    env = dict(os.environ, JAX_PLATFORMS="axon")
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "import avvad_tpu; print(jax.config.jax_platforms)"],
        capture_output=True, text=True, env=env, timeout=120, cwd=cwd)
    assert r.returncode == 0, r.stderr[-500:]
    assert r.stdout.strip().splitlines()[-1] == "cpu"
