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


def test_torch_export_round_trips_trunk():
    """export_resnet18_trunk is the exact inverse of import_torch_resnet18:
    Flax trunk -> 'features.N.*' arrays -> Flax trunk is the identity (the
    duel harness relies on this to hand the reference DeepVAD_AV the SAME
    frozen trunk weights this framework's AV model trains with)."""
    from avvad_tpu.utils.torch_export import export_resnet18_trunk
    from avvad_tpu.utils.torch_import import import_torch_resnet18

    video = VideoVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1)
    vstate = create_train_state(video, jax.random.PRNGKey(2),
                                (jnp.zeros((1, 2, 67, 67)),))
    # make BN running stats non-trivial so a mean/var swap would be caught
    bs = jax.tree_util.tree_map(
        lambda a: a + np.float32(np.pi), vstate.batch_stats)

    trunk_p = vstate.params["tower"]["features"]
    trunk_bs = bs["tower"]["features"]
    flat = export_resnet18_trunk(trunk_p, trunk_bs)

    # reference Sequential layout: conv1=0, bn1=1, layer1..4 = 4..7
    assert "features.0.weight" in flat
    assert flat["features.0.weight"].shape == (64, 3, 7, 7)  # OIHW
    assert "features.4.0.conv1.weight" in flat
    assert "features.5.0.downsample.0.weight" in flat
    assert all(k.startswith("features.") for k in flat)

    re_p, re_bs = import_torch_resnet18(flat, prefix="features.")
    for src, dst in ((trunk_p, re_p), (trunk_bs, re_bs)):
        sl = jax.tree_util.tree_leaves(src)
        dl = jax.tree_util.tree_leaves(dst)
        assert len(sl) == len(dl)
        for a, b in zip(sl, dl):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_export_video_trunk_pt(tmp_path):
    """The .pt writer loads from an Orbax checkpoint dir and produces a
    state dict the reference model accepts for its 'features.*' subset."""
    torch = pytest.importorskip("torch")

    from avvad_tpu.utils.torch_export import export_video_trunk_pt

    video = VideoVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1)
    vstate = create_train_state(video, jax.random.PRNGKey(3),
                                (jnp.zeros((1, 2, 67, 67)),))
    save_checkpoint(str(tmp_path), vstate, epoch=1, valid_loss=1.23)

    out = str(tmp_path / "video_trunk.pt")
    n = export_video_trunk_pt(str(tmp_path), out)
    sd = torch.load(out, map_location="cpu", weights_only=True)
    assert len(sd) == n and n > 100
    assert sd["features.0.weight"].dtype == torch.float32
    np.testing.assert_array_equal(
        sd["features.0.weight"].numpy(),
        np.transpose(np.asarray(
            vstate.params["tower"]["features"]["conv1"]["kernel"]),
            (3, 2, 0, 1)))
