"""Transfer learning: video trunk (params + BN stats) grafts into AVVAD."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avvad_tpu.models import AVVAD, VideoVAD
from avvad_tpu.train import create_train_state, save_checkpoint
from avvad_tpu.train.checkpoint import load_pretrained_trunk


@pytest.mark.slow
def test_trunk_transfer_params_and_batch_stats(tmp_path):
    # "pretrain" a video net (just perturb its trunk stats so transfer is
    # observable)
    video = VideoVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1)
    vstate = create_train_state(video, jax.random.PRNGKey(0),
                                (jnp.zeros((1, 2, 67, 67)),))
    bs = jax.tree_util.tree_map(lambda a: a + 0.5, vstate.batch_stats)
    vstate = vstate.replace(batch_stats=bs)
    path = save_checkpoint(str(tmp_path), vstate, epoch=7, valid_loss=4.51)

    av = AVVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1, use_mcb=False)
    astate = create_train_state(
        av, jax.random.PRNGKey(1),
        (jnp.zeros((1, 2, 513)), jnp.zeros((1, 2, 67, 67))))

    new_params, new_bs = load_pretrained_trunk(path, astate.params,
                                               astate.batch_stats)

    # trunk params come from the video checkpoint
    src = jax.tree_util.tree_leaves(vstate.params["tower"]["features"])
    dst = jax.tree_util.tree_leaves(new_params["tower"]["features"])
    for a, b in zip(src, dst):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # BN running stats transferred too (the torch 'features.*' copy
    # includes running_mean/var)
    src = jax.tree_util.tree_leaves(vstate.batch_stats["tower"]["features"])
    dst = jax.tree_util.tree_leaves(new_bs["tower"]["features"])
    for a, b in zip(src, dst):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # non-trunk params untouched
    np.testing.assert_array_equal(
        np.asarray(astate.params["vad_merged"]["kernel"]),
        np.asarray(new_params["vad_merged"]["kernel"]))

    # grafted model runs
    y = av.apply({"params": new_params, "batch_stats": new_bs},
                 jnp.zeros((1, 2, 513)), jnp.zeros((1, 2, 67, 67)))
    assert y.shape == (1, 2, 1)
