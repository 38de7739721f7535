"""Checkpoint roundtrip: params + optimizer state + norm stats + resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avvad_tpu.data.batching import Batch
from avvad_tpu.models import AudioVAD
from avvad_tpu.train import (
    create_train_state,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
)
from avvad_tpu.train.checkpoint import latest_checkpoint
from avvad_tpu.train.state import make_optimizer


def _trained_state_and_batch():
    model = AudioVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (jnp.zeros((2, 6, 513)),), make_optimizer(1e-2))
    batch = Batch(audio=jax.random.normal(jax.random.PRNGKey(1), (2, 6, 513)),
                  video=None, label=jnp.ones((2, 6, 1)),
                  lengths=jnp.asarray([6, 6]), mask=jnp.ones((2, 6)))
    step = make_train_step("audio", donate=False)
    state, _ = step(state, batch, None)
    return model, state, batch, step


@pytest.mark.slow
def test_full_roundtrip_including_optimizer(tmp_path):
    model, state, batch, step = _trained_state_and_batch()
    path = save_checkpoint(str(tmp_path), state,
                           {"audio_mean": np.ones((513, 1), np.float32)},
                           epoch=3, valid_loss=0.51)

    fresh = create_train_state(model, jax.random.PRNGKey(42),
                               (jnp.zeros((2, 6, 513)),), make_optimizer(1e-2))
    restored, norm, epoch = restore_checkpoint(path, fresh)

    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer moments must survive exactly (the reference never saved them)
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert epoch == 3
    assert norm is not None and "audio_mean" in norm

    # resumed state must step identically to the original
    s1, m1 = step(state, batch, None)
    s2, m2 = step(restored, batch, None)
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-6


def test_latest_checkpoint_ordering(tmp_path):
    model, state, _, _ = _trained_state_and_batch()
    save_checkpoint(str(tmp_path), state, epoch=1, valid_loss=2.0)
    save_checkpoint(str(tmp_path), state, epoch=10, valid_loss=1.0)
    save_checkpoint(str(tmp_path), state, epoch=2, valid_loss=0.5)
    latest = latest_checkpoint(str(tmp_path))
    assert latest is not None and "epoch_010" in latest
    assert latest_checkpoint(str(tmp_path / "nonexistent")) is None


def test_resolve_checkpoint_prefers_best_vloss(tmp_path):
    """Model dirs resolve to the lowest-vloss epoch (the selection the
    reference hard-coded by filename, evaluate_AV_net.py:117)."""
    import os

    from avvad_tpu.train.checkpoint import (best_checkpoint,
                                            resolve_checkpoint)

    d = tmp_path / "model"
    for name in ["epoch_001_vloss_4.48", "epoch_007_vloss_2.11",
                 "epoch_060_vloss_9.99", "notes.txt"]:
        os.makedirs(d / name, exist_ok=True) if "epoch" in name else \
            (d / name).parent.mkdir(parents=True, exist_ok=True)
    (d / "notes.txt").write_text("x")

    best = best_checkpoint(str(d))
    assert best.endswith("epoch_007_vloss_2.11")
    assert resolve_checkpoint(str(d)).endswith("epoch_007_vloss_2.11")
    # concrete checkpoint paths pass through untouched
    exact = str(d / "epoch_060_vloss_9.99")
    assert resolve_checkpoint(exact) == exact


def test_prune_checkpoints_keeps_best_and_latest(tmp_path):
    import os

    from avvad_tpu.train.checkpoint import prune_checkpoints

    d = tmp_path / "m"
    names = ["epoch_001_vloss_4.00", "epoch_002_vloss_1.50",
             "epoch_003_vloss_2.00", "epoch_004_vloss_3.00",
             "epoch_005_vloss_5.00"]
    for n in names:
        os.makedirs(d / n)
    removed = prune_checkpoints(str(d), keep_latest=2)
    left = sorted(os.listdir(d))
    assert removed == 2
    assert left == ["epoch_002_vloss_1.50",  # best vloss
                    "epoch_004_vloss_3.00", "epoch_005_vloss_5.00"]


def test_prune_checkpoints_sweeps_crashed_tmp_dirs(tmp_path):
    """Interrupted Orbax saves leave *.orbax-checkpoint-tmp staging dirs;
    retention must remove them even when no real checkpoint is prunable."""
    import os

    from avvad_tpu.train.checkpoint import prune_checkpoints

    d = tmp_path / "m"
    os.makedirs(d / "epoch_001_vloss_2.00")
    tmp_dir = d / "epoch_002_vloss_9.99.orbax-checkpoint-tmp"
    os.makedirs(tmp_dir)
    (tmp_dir / ".__lock").write_text("")
    removed = prune_checkpoints(str(d), keep_latest=1)
    assert removed == 1
    assert sorted(os.listdir(d)) == ["epoch_001_vloss_2.00"]
