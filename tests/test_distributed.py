"""Distributed helpers + mesh-mode Trainer on the virtual 8-device platform."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avvad_tpu.parallel import (
    local_batch_slice,
    make_mesh,
    make_multihost_mesh,
)


def test_make_multihost_mesh_single_process():
    mesh = make_multihost_mesh(n_model=2)
    assert mesh.devices.shape == (len(jax.devices()) // 2, 2)
    assert set(mesh.axis_names) == {"data", "model"}


def test_local_batch_slice_single_process():
    s = local_batch_slice(32)
    assert s == slice(0, 32)


def test_initialize_multihost_noop_without_coordinator(monkeypatch):
    from avvad_tpu.parallel import initialize_multihost

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert initialize_multihost() is False


def test_trainer_with_mesh(ref_subset, tmp_path):
    """Trainer in mesh mode trains on real data across 8 virtual devices."""
    from avvad_tpu.data import AudioSequenceSource, DataLoader
    from avvad_tpu.models import AudioVAD
    from avvad_tpu.train import Trainer, create_train_state
    from avvad_tpu.train.state import make_optimizer

    root = os.path.join(ref_subset, "processed/")
    src = AudioSequenceSource(root, "train", "subset", "vad_labels",
                              upsampled=False)
    # batch must divide the data axis: pad batches to 8 rows
    dl = DataLoader(src, batch_size=8, shuffle=False, bucket=64,
                    pad_batch_to_full=True)
    model = AudioVAD(y_dim=1, lstm_hidden_size=16, lstm_layers=1)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (jnp.zeros((1, 64, 513)),),
                               make_optimizer(1e-3))
    mesh = make_mesh(n_data=8, n_model=1)
    trainer = Trainer(state, "audio", str(tmp_path), mesh=mesh,
                      prefetch=False)
    metrics = trainer.train_epoch(dl, epoch=1)
    assert np.isfinite(metrics["loss"])
    valid = trainer.eval_epoch(dl)
    assert np.isfinite(valid["loss"])
