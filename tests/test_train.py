"""Training-step tests: gradient flow, freezing, loss descent on real data."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avvad_tpu.data import AudioSequenceSource, DataLoader
from avvad_tpu.models import AudioVAD, AVVAD
from avvad_tpu.train import create_train_state, make_eval_step, make_train_step
from avvad_tpu.train.state import make_optimizer, trainable_except_video_trunk


@pytest.fixture(scope="module")
def root(ref_subset):
    return os.path.join(ref_subset, "processed/")


def test_audio_train_loss_descends_on_subset(root):
    """End-to-end slice: real subset batches, tiny AudioVAD, loss must drop."""
    src = AudioSequenceSource(root, "train", "subset", "vad_labels", upsampled=False)
    loader = DataLoader(src, batch_size=3, shuffle=False, bucket=64)
    batch = next(iter(loader))

    model = AudioVAD(y_dim=1, lstm_hidden_size=32, lstm_layers=1)
    tx = make_optimizer(learning_rate=1e-2)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (jnp.asarray(batch.audio),), tx
    )
    step = make_train_step("audio", donate=False)

    # dataset-level std-normalization, as the reference training loop does
    norm_stats = {
        "audio_mean": batch.audio.mean(axis=(0, 1))[:, None],
        "audio_std": batch.audio.std(axis=(0, 1))[:, None],
    }
    losses = []
    for _ in range(30):
        state, metrics = step(state, batch, norm_stats)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.6, losses
    assert 0.0 <= float(metrics["f1"]) <= 1.0


def test_metrics_match_reference_formula_on_batch(root):
    src = AudioSequenceSource(root, "train", "subset", "vad_labels", upsampled=False)
    loader = DataLoader(src, batch_size=3, shuffle=False, bucket=64)
    batch = next(iter(loader))

    model = AudioVAD(y_dim=1, lstm_hidden_size=16, lstm_layers=1)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (jnp.asarray(batch.audio),))
    metrics, y_soft = make_eval_step("audio")(state, batch, None)

    # recompute per-sequence F1 by the reference's python loop
    from avvad_tpu.models import f1_metrics

    y_hard = (np.asarray(y_soft) > 0.5).astype(np.float32)
    accs = []
    for i in range(batch.batch_size):
        L = int(batch.lengths[i])
        acc, *_ = f1_metrics(jnp.asarray(y_hard[i, :L]),
                             jnp.asarray(batch.label[i, :L]))
        accs.append(float(acc))
    assert abs(float(metrics["accuracy"]) - np.mean(accs)) < 1e-5


@pytest.mark.slow
def test_frozen_trunk_receives_no_updates():
    model = AVVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1, use_mcb=False)
    audio = jnp.zeros((2, 4, 513))
    video = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 67, 67))
    tx = make_optimizer(learning_rate=1e-2,
                        freeze_filter=trainable_except_video_trunk,
                        )
    state = create_train_state(model, jax.random.PRNGKey(0), (audio, video), tx)

    from avvad_tpu.data.batching import Batch

    label = jnp.ones((2, 4, 1))
    mask = jnp.ones((2, 4))
    batch = Batch(audio=audio, video=video, label=label,
                  lengths=jnp.asarray([4, 4]), mask=mask)

    trunk_before = jax.tree_util.tree_leaves(
        state.params["tower"]["features"]
    )
    head_before = jax.tree_util.tree_leaves(state.params["vad_merged"])
    state2, _ = make_train_step("av", donate=False)(state, batch, None)
    trunk_after = jax.tree_util.tree_leaves(state2.params["tower"]["features"])
    head_after = jax.tree_util.tree_leaves(state2.params["vad_merged"])

    for a, b in zip(trunk_before, trunk_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(head_before, head_after)
    )


def test_normalization_matches_reference_order():
    from avvad_tpu.train.steps import normalize

    x = np.random.default_rng(0).normal(size=(2, 5, 513)).astype(np.float32)
    mean = np.random.default_rng(1).normal(size=(513, 1)).astype(np.float32)
    std = np.abs(np.random.default_rng(2).normal(size=(513, 1))).astype(np.float32)
    eps = 1e-8
    ours = np.asarray(normalize(jnp.asarray(x), jnp.asarray(mean),
                                jnp.asarray(std), eps))
    # reference: x_norm = x - mean.T; x_norm /= (std + eps).T  on (B, T, F)
    ref = (x - mean.T) / (std + eps).T
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.slow
def test_batchnorm_updates_in_av_mcb_train_step():
    model = AVVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1, use_mcb=True,
                  mcb_output_size=16)
    audio = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 513))
    video = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 67, 67))
    state = create_train_state(model, jax.random.PRNGKey(0), (audio, video))

    from avvad_tpu.data.batching import Batch

    batch = Batch(audio=audio, video=video, label=jnp.ones((2, 4, 1)),
                  lengths=jnp.asarray([4, 4]), mask=jnp.ones((2, 4)))
    bn_before = np.asarray(state.batch_stats["mcb_bn"]["mean"])
    state2, _ = make_train_step("av", donate=False)(state, batch, None)
    bn_after = np.asarray(state2.batch_stats["mcb_bn"]["mean"])
    assert not np.array_equal(bn_before, bn_after)
    # sketch buffers must be untouched
    np.testing.assert_array_equal(
        np.asarray(state.sketch["mcb"]["sketch1"]),
        np.asarray(state2.sketch["mcb"]["sketch1"]),
    )


@pytest.mark.slow
def test_dropout_option_trains_and_randomizes():
    """dropout_rate>0 + dropout rng: active in train, off at eval."""
    from avvad_tpu.models import AudioVAD
    from avvad_tpu.data.batching import Batch

    model = AudioVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1,
                     dropout_rate=0.5)
    audio = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 513))
    variables = model.init(jax.random.PRNGKey(1), audio)
    # eval is deterministic
    y1 = model.apply(variables, audio, train=False)
    y2 = model.apply(variables, audio, train=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    # train mode with different rngs differs
    t1 = model.apply(variables, audio, train=True,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    t2 = model.apply(variables, audio, train=True,
                     rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(t1), np.asarray(t2))

    state = create_train_state(model, jax.random.PRNGKey(4), (audio,),
                               make_optimizer(1e-3))
    batch = Batch(audio=audio, video=None, label=jnp.ones((2, 6, 1)),
                  lengths=jnp.asarray([6, 6]), mask=jnp.ones((2, 6)))
    step = make_train_step("audio", donate=False, dropout=True)
    state, metrics = step(state, batch, None)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_trainer_prewarm_matches_lazy_path(root, tmp_path):
    """Trainer(prewarm=True) dispatches epoch steps through AOT-compiled
    executables and reproduces the lazy-jit loss trajectory exactly."""
    from avvad_tpu.train import Trainer

    def run(prewarm):
        src = AudioSequenceSource(root, "train", "subset", "vad_labels",
                                  upsampled=False)
        loader = DataLoader(src, batch_size=2, shuffle=False, bucket=64)
        model = AudioVAD(y_dim=1, lstm_hidden_size=16, lstm_layers=1)
        tx = make_optimizer(learning_rate=1e-3)
        state = create_train_state(
            model, jax.random.PRNGKey(0), (jnp.zeros((1, 32, 513)),), tx)
        trainer = Trainer(state, "audio", str(tmp_path / str(prewarm)),
                          prefetch=False, prewarm=prewarm)
        m1 = trainer.train_epoch(loader, epoch=1)
        m2 = trainer.train_epoch(loader, epoch=2)
        mv = trainer.eval_epoch(loader)
        return trainer, m1, m2, mv

    lazy_tr, *lazy = run(False)
    warm_tr, *warm = run(True)
    assert lazy_tr._compiled == {"train": {}, "eval": {}}
    # 9 train utts / B=2 -> a full-B and a partial-B shape per length class
    assert len(warm_tr._compiled["train"]) >= 2
    assert len(warm_tr._compiled["eval"]) >= 2
    for ml, mw in zip(lazy, warm):
        assert ml == mw, (ml, mw)


def test_train_epoch_pins_loader_epoch_for_resume(tmp_path):
    """A resumed run re-creates the DataLoader with its internal epoch
    counter at 0; train_epoch must pin it to the trainer's epoch or the
    resumed epochs replay the shuffle orders and augmentation noise
    realizations already trained on (regression)."""
    from avvad_tpu.train import Trainer

    class RecordingSource:
        def __init__(self):
            self.epochs_seen = []

        def __len__(self):
            return 2

        def set_epoch(self, e):
            self.epochs_seen.append(e)

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            return {"audio": rng.normal(size=(16, 513)).astype(np.float32),
                    "label": np.ones((16, 1), np.float32),
                    "length": 16}

    model = AudioVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1)
    tx = make_optimizer(learning_rate=1e-3)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (jnp.zeros((1, 16, 513)),), tx)
    trainer = Trainer(state, "audio", str(tmp_path), prefetch=False)

    src = RecordingSource()
    loader = DataLoader(src, batch_size=2, shuffle=True, bucket=16)
    trainer.train_epoch(loader, epoch=7)
    # fresh-process loader (epoch counter 0), as after --resume
    src2 = RecordingSource()
    loader2 = DataLoader(src2, batch_size=2, shuffle=True, bucket=16)
    trainer.train_epoch(loader2, epoch=8)
    assert src.epochs_seen == [7]
    assert src2.epochs_seen == [8]
