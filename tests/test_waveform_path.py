"""Raw-waveform model path: WaveNet frontend end to end, remat, IBM labels."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avvad_tpu.data import AudioWaveformSource, DataLoader
from avvad_tpu.models import RawAudioVAD
from avvad_tpu.train import create_train_state, make_train_step
from avvad_tpu.train.state import make_optimizer


@pytest.fixture(scope="module")
def root(ref_subset):
    return os.path.join(ref_subset, "processed/")


def test_waveform_source_and_batching(root):
    src = AudioWaveformSource(root, "train", "subset", "vad_labels",
                              upsampled=False)
    assert len(src) == 3
    item = src[0]
    assert item["waveform"].ndim == 1
    assert item["time_length"] == len(item["waveform"])

    from avvad_tpu.data import pad_batch

    batch = pad_batch([src[i] for i in range(3)], bucket=64)
    assert batch.waveform is not None
    assert batch.waveform.shape[0] == 3
    assert batch.time_lengths is not None


@pytest.mark.slow
def test_raw_audio_vad_trains(root):
    src = AudioWaveformSource(root, "train", "subset", "vad_labels",
                              upsampled=False)
    loader = DataLoader(src, batch_size=3, shuffle=False, bucket=64)
    batch = next(iter(loader))
    t_frames = batch.label.shape[1]

    model = RawAudioVAD(y_dim=1, lstm_hidden_size=16, lstm_layers=1,
                        out_frames=t_frames,
                        wavenet_kwargs=dict(dilations=(1, 2, 4, 8),
                                            residual_channels=8,
                                            dilation_channels=8,
                                            bottleneck_width=8))
    tx = make_optimizer(1e-2)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (jnp.asarray(batch.waveform),), tx)
    step = make_train_step("waveform", donate=False)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch, None)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_remat_video_tower_matches_no_remat():
    from avvad_tpu.models import VideoVAD

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 67, 67))
    m1 = VideoVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1, remat=False)
    m2 = VideoVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1, remat=True)
    v = m1.init(jax.random.PRNGKey(1), x)
    y1 = m1.apply(v, x)
    y2 = m2.apply(v, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_ibm_labels_513_dim_training(root):
    """y_dim=513 (IBM masks) end to end on fixture data."""
    from avvad_tpu.data import AudioSequenceSource
    from avvad_tpu.models import AudioVAD

    src = AudioSequenceSource(root, "train", "subset", "ibm_labels",
                              upsampled=False)
    assert len(src) == 3
    item = src[0]
    assert item["label"].shape[1] == 513

    loader = DataLoader(src, batch_size=3, shuffle=False, bucket=64)
    batch = next(iter(loader))
    model = AudioVAD(y_dim=513, lstm_hidden_size=16, lstm_layers=1)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (jnp.asarray(batch.audio),),
                               make_optimizer(1e-2))
    step = make_train_step("audio", donate=False)
    state, metrics = step(state, batch, None)
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["f1"]) <= 1.0
