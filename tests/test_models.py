"""Model-zoo tests: numerics vs torch oracles, shapes, masking semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_lstm_matches_torch_with_transferred_weights():
    """Our scan-LSTM must reproduce torch.nn.LSTM given the same weights."""
    import torch

    from avvad_tpu.models import LSTMStack, lstm_import_torch_weights

    b, t, d, h, layers = 3, 17, 12, 24, 2
    torch.manual_seed(0)
    ref = torch.nn.LSTM(input_size=d, hidden_size=h, num_layers=layers,
                        batch_first=True)
    x = torch.randn(b, t, d)
    with torch.no_grad():
        y_ref, _ = ref(x)

    model = LSTMStack(hidden_size=h, num_layers=layers)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((b, t, d)))["params"]
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = lstm_import_torch_weights(params, state, prefix="")
    # torch state keys are like 'weight_ih_l0' (no prefix dot) — adapt:
    if not any("weight_ih_l0" in k for k in state):
        pytest.skip("unexpected torch LSTM state layout")
    y = model.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=2e-5)


def test_lstm_causality_under_padding():
    """Outputs at valid frames must not depend on padded frames."""
    from avvad_tpu.models import LSTMStack

    model = LSTMStack(hidden_size=16, num_layers=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 20, 8))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    y_full = model.apply({"params": params}, x)
    x_trunc = x.at[:, 10:].set(123.0)  # garbage in the "padding"
    y_trunc = model.apply({"params": params}, x_trunc)
    np.testing.assert_allclose(np.asarray(y_full[:, :10]),
                               np.asarray(y_trunc[:, :10]), atol=1e-6)


def test_select_last():
    from avvad_tpu.models.lstm import select_last

    out = jnp.arange(2 * 5 * 3, dtype=jnp.float32).reshape(2, 5, 3)
    lengths = jnp.asarray([2, 5])
    last = select_last(out, lengths)
    np.testing.assert_array_equal(np.asarray(last[0]), np.asarray(out[0, 1]))
    np.testing.assert_array_equal(np.asarray(last[1]), np.asarray(out[1, 4]))


def test_resnet18_shapes_and_param_count():
    from avvad_tpu.models import ResNet18

    model = ResNet18()
    x = jnp.zeros((2, 67, 67, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 512)
    n_params = sum(int(np.prod(p.shape)) for p in
                   jax.tree_util.tree_leaves(variables["params"]))
    # torchvision resnet18 trunk (no fc): 11,176,512 parameters
    assert n_params == 11_176_512, n_params


def test_resnet_stem_matches_torch_oracle():
    """7x7/2 conv + BN + relu + 3x3/2 maxpool vs a torch oracle."""
    import torch

    from avvad_tpu.models import ResNet18

    model = ResNet18()
    x_np = np.random.default_rng(0).normal(size=(2, 67, 67, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np))

    w = np.asarray(variables["params"]["conv1"]["kernel"])  # (7,7,3,64) HWIO

    tconv = torch.nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1)))  # OIHW
        tx = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        ty = torch.nn.functional.max_pool2d(
            torch.relu(tconv(tx)), 3, stride=2, padding=1
        ).numpy()

    # replicate the stem manually: conv (lax) -> BN-at-init (pure scale by
    # 1/sqrt(1+eps)) -> relu -> maxpool
    import flax.linen as fnn

    conv_out = jax.lax.conv_general_dilated(
        jnp.asarray(x_np), jnp.asarray(w), window_strides=(2, 2),
        padding=[(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    bn_out = conv_out / np.sqrt(1.0 + 1e-5)
    stem_out = fnn.max_pool(jax.nn.relu(bn_out), (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)])
    # ty already had relu+pool applied; positive scaling commutes with both
    np.testing.assert_allclose(
        np.asarray(stem_out), ty.transpose(0, 2, 3, 1) / np.sqrt(1.0 + 1e-5),
        atol=1e-4,
    )


def test_mcb_matches_direct_circular_conv():
    """MCB(x, y) must equal the count-sketch circular convolution computed
    naively in numpy (the quantity the reference builds via scatter+FFT)."""
    from avvad_tpu.models import CompactBilinearPooling

    d1, d2, out = 13, 9, 16
    mcb = CompactBilinearPooling(d1, d2, out, seed=7)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, d1))
    y = jax.random.normal(jax.random.PRNGKey(3), (4, d2))
    variables = mcb.init(jax.random.PRNGKey(0), x, y)
    z = np.asarray(mcb.apply(variables, x, y))

    m1 = np.asarray(variables["sketch"]["sketch1"])
    m2 = np.asarray(variables["sketch"]["sketch2"])
    px = np.asarray(x) @ m1
    py = np.asarray(y) @ m2
    ref = np.fft.irfft(np.fft.rfft(px, axis=-1) * np.fft.rfft(py, axis=-1),
                       n=out, axis=-1)
    np.testing.assert_allclose(z, ref, atol=1e-4)


def test_mcb_folded_vars_matches_standard():
    """Hoisted-fold serving layout: a folded_vars=True module applied to
    fold_sketch_collection(vars) reproduces the standard module exactly
    (same matmuls reordered; the fold happens once on the host), and its
    own init produces the folded layout directly."""
    from avvad_tpu.models import CompactBilinearPooling
    from avvad_tpu.models.mcb import fold_sketch_collection

    d1, d2, out = 13, 9, 16
    mcb = CompactBilinearPooling(d1, d2, out, seed=7)
    folded = CompactBilinearPooling(d1, d2, out, seed=7, folded_vars=True)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, d1))
    y = jax.random.normal(jax.random.PRNGKey(3), (4, d2))
    variables = mcb.init(jax.random.PRNGKey(0), x, y)
    z = np.asarray(mcb.apply(variables, x, y))

    fv = fold_sketch_collection(variables)
    assert fv["sketch"]["sketch1"].shape == (2, d1, out // 2 + 1)
    zf = np.asarray(folded.apply(fv, x, y))
    np.testing.assert_allclose(zf, z, atol=1e-5)

    # init of the folded module builds the same folded sketches directly
    fv_init = folded.init(jax.random.PRNGKey(0), x, y)
    np.testing.assert_allclose(np.asarray(fv_init["sketch"]["sketch1"]),
                               np.asarray(fv["sketch"]["sketch1"]), atol=0)

    # untouched collections are shared by reference, and the original
    # variables are not mutated
    assert variables["sketch"]["sketch1"].shape == (d1, out)


def test_avvad_mcb_folded_vars_probability_parity():
    """Whole-model check: AVVAD(mcb_folded_vars=True) on the folded
    variables matches the standard model's logits."""
    from avvad_tpu.models import AVVAD
    from avvad_tpu.models.mcb import fold_sketch_collection

    model = AVVAD(y_dim=1, lstm_hidden_size=16, lstm_layers=1, use_mcb=True)
    b, t = 2, 6
    audio = jax.random.normal(jax.random.PRNGKey(0), (b, t, 513))
    video = jax.random.normal(jax.random.PRNGKey(1), (b, t, 67, 67))
    variables = model.init(jax.random.PRNGKey(2), audio, video)
    base = np.asarray(model.apply(variables, audio, video, train=False))

    folded_model = model.clone(mcb_folded_vars=True)
    fv = fold_sketch_collection(variables)
    out = np.asarray(folded_model.apply(fv, audio, video, train=False))
    np.testing.assert_allclose(out, base, atol=1e-5)


def test_mcb_gradient_matches_reference_backward_shape():
    """Autodiff through the sketch matmul reproduces gather(g, h) * s."""
    from avvad_tpu.models.mcb import count_sketch_matrix

    rng = np.random.default_rng(0)
    m = count_sketch_matrix(rng, 6, 8)
    h = np.argmax(np.abs(m), axis=1)
    s = m[np.arange(6), h]

    g = np.random.default_rng(1).normal(size=(8,)).astype(np.float32)
    grad_x = g @ m.T
    np.testing.assert_allclose(grad_x, g[h] * s, atol=1e-6)


def test_audio_vad_forward():
    from avvad_tpu.models import AudioVAD

    model = AudioVAD(y_dim=1, lstm_hidden_size=32, lstm_layers=2)
    x = jnp.zeros((2, 12, 513))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 12, 1)


def test_video_vad_forward_and_return_last():
    from avvad_tpu.models import VideoVAD

    model = VideoVAD(y_dim=1, lstm_hidden_size=16, lstm_layers=1)
    x = jnp.zeros((2, 3, 67, 67))
    lengths = jnp.asarray([2, 3])
    variables = model.init(jax.random.PRNGKey(0), x, lengths)
    y = model.apply(variables, x, lengths)
    assert y.shape == (2, 3, 1)
    y_last = model.apply(variables, x, lengths, return_last=True)
    assert y_last.shape == (2, 1)


@pytest.mark.parametrize("use_mcb", [False, True])
def test_avvad_forward(use_mcb):
    from avvad_tpu.models import AVVAD

    model = AVVAD(y_dim=1, lstm_hidden_size=16, lstm_layers=1, use_mcb=use_mcb,
                  mcb_output_size=32)
    audio = jnp.zeros((2, 3, 513))
    video = jnp.zeros((2, 3, 67, 67))
    variables = model.init(jax.random.PRNGKey(0), audio, video)
    y = model.apply(variables, audio, video)
    assert y.shape == (2, 3, 1)
    if use_mcb:
        assert "sketch" in variables
        assert variables["sketch"]["mcb"]["sketch1"].shape == (513, 32)


@pytest.mark.slow
def test_wavenet_encoder_shapes_and_receptive_field():
    from avvad_tpu.models import WaveNetEncoder

    enc = WaveNetEncoder(filter_width=2, dilations=(1, 2, 4),
                         quantization_channels=8, residual_channels=4,
                         dilation_channels=4, bottleneck_width=3,
                         pool_kernel_size=5)
    assert enc.receptive_field == (2 - 1) * (7 + 1) + 1  # formula parity
    x = jnp.zeros((2, 64, 8))
    params = enc.init(jax.random.PRNGKey(0), x)
    y = enc.apply(params, x)
    assert y.shape == (2, 5, 3)


def test_losses_match_torch_reference_numerics():
    import torch

    from avvad_tpu.models import binary_cross_entropy, f1_metrics

    r = np.random.default_rng(0).normal(size=(5, 7)).astype(np.float32)
    t = (np.random.default_rng(1).random((5, 7)) > 0.5).astype(np.float32)
    eps = 1e-8

    tr, tt = torch.from_numpy(r), torch.from_numpy(t)
    ref = -torch.mean(
        tt * torch.log(torch.sigmoid(tr) + eps)
        + (1 - tt) * torch.log(1 - torch.sigmoid(tr) + eps)
    ).item()
    ours = float(binary_cross_entropy(jnp.asarray(r), jnp.asarray(t), eps))
    assert abs(ours - ref) < 1e-6

    y_pred = (r > 0).astype(np.float32)
    acc, prec, rec, f1 = (float(v) for v in
                          f1_metrics(jnp.asarray(y_pred), jnp.asarray(t)))
    tp = float((t * y_pred).sum()); tn = float(((1 - t) * (1 - y_pred)).sum())
    fp = float(((1 - t) * y_pred).sum()); fn = float((t * (1 - y_pred)).sum())
    assert abs(acc - (tp + tn) / (tp + tn + fp + fn + eps)) < 1e-6
    assert abs(prec - tp / (tp + fp + eps)) < 1e-6
    assert abs(rec - tp / (tp + fn + eps)) < 1e-6


def test_masked_bce_equals_python_loop():
    from avvad_tpu.models import masked_sequence_bce, binary_cross_entropy

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(3, 10, 1)).astype(np.float32)
    targets = (rng.random((3, 10, 1)) > 0.5).astype(np.float32)
    lengths = np.asarray([4, 10, 7])
    mask = (np.arange(10)[None] < lengths[:, None]).astype(np.float32)

    ours = float(masked_sequence_bce(jnp.asarray(logits), jnp.asarray(targets),
                                     jnp.asarray(mask)))
    ref = sum(
        float(binary_cross_entropy(jnp.asarray(logits[i, : lengths[i]]),
                                   jnp.asarray(targets[i, : lengths[i]])))
        for i in range(3)
    )
    assert abs(ours - ref) < 1e-5


def test_adaptive_avg_pool_matches_torch():
    import torch

    from avvad_tpu.models.wavenet import adaptive_avg_pool1d

    x = np.random.default_rng(0).normal(size=(2, 37, 4)).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool1d(jnp.asarray(x), 10))
    ref = torch.nn.AdaptiveAvgPool1d(10)(
        torch.from_numpy(x.transpose(0, 2, 1))
    ).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.slow
def test_stem_space_to_depth_exact():
    """The s2d-reparameterized stem must match the strided 7x7 conv exactly
    (same param tree, so checkpoints are interchangeable)."""
    from avvad_tpu.models import ResNet18
    from avvad_tpu.models.resnet import _stem_space_to_depth

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 67, 67, 3))
    base = ResNet18(stem_s2d=False)
    v = base.init(jax.random.PRNGKey(1), x)
    y_base = base.apply(v, x)
    y_s2d = ResNet18(stem_s2d=True).apply(v, x)
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_base),
                               atol=1e-5)

    w = v["params"]["conv1"]["kernel"]
    for hw in [64, 65, 67]:
        xi = jax.random.normal(jax.random.PRNGKey(2), (1, hw, hw, 3))
        ref = jax.lax.conv_general_dilated(
            xi, w, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = _stem_space_to_depth(xi, w, jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)


@pytest.mark.slow
def test_gray_stem_exact_vs_rgb_repeat():
    """conv1 over channel-replicated RGB == 1-channel conv with the kernel
    summed over input channels — through the full VideoVAD tower."""
    from avvad_tpu.models import VideoVAD

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 67, 67))
    model = VideoVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1)
    v = model.init(jax.random.PRNGKey(1), x)
    y_gray = model.apply(v, x)  # default gray_stem=True in the tower

    # force the RGB-repeat path with identical params
    from avvad_tpu.models.vad_nets import _VideoTower
    import flax.linen as nn

    class VideoVADRGB(nn.Module):
        # standalone module (not a VideoVAD subclass: VideoVAD is
        # setup-style, so an nn.compact override would double-create
        # "tower") with the same variable-tree names
        @nn.compact
        def __call__(self, video, train=False):
            xx = _VideoTower(dtype=jnp.float32, gray_stem=False,
                             name="tower")(video, train=train)
            from avvad_tpu.models.lstm import LSTMStack
            xx = LSTMStack(8, 1, dtype=jnp.float32,
                           name="lstm_video")(xx)
            return nn.Dense(1, name="vad_video")(xx)

    y_rgb = VideoVADRGB().apply(v, x)
    np.testing.assert_allclose(np.asarray(y_gray), np.asarray(y_rgb),
                               atol=1e-5)


def test_misc_model_utils():
    from avvad_tpu.models import enumerate_discrete, init_normal, onehot

    enc = onehot(3)
    np.testing.assert_array_equal(np.asarray(enc(1)), [0, 1, 0])
    np.testing.assert_array_equal(np.asarray(enc(5)), [0, 0, 0])

    gen = enumerate_discrete(jnp.zeros((2, 4)), 3)
    assert gen.shape == (6, 3)
    np.testing.assert_array_equal(np.asarray(gen[:2]), [[1, 0, 0], [1, 0, 0]])

    from avvad_tpu.models import AudioVAD

    model = AudioVAD(y_dim=1, lstm_hidden_size=8, lstm_layers=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 513)))["params"]
    newp = init_normal(jax.random.PRNGKey(1), params, std=0.005)
    # dense kernel re-drawn tight around 0; bias zeroed; lstm untouched
    k = np.asarray(newp["vad_audio"]["kernel"])
    assert abs(k.mean()) < 0.01 and k.std() < 0.02
    np.testing.assert_array_equal(np.asarray(newp["vad_audio"]["bias"]), 0)
    np.testing.assert_array_equal(
        np.asarray(newp["lstm_audio"]["layer_0"]["w_hh"]),
        np.asarray(params["lstm_audio"]["layer_0"]["w_hh"]))


@pytest.mark.slow
def test_int8_tower_close_to_fp32():
    """W8A8 int8-resident trunk tracks the fp32 trunk closely enough for
    probability-level work (quality is gated on the trained model's metrics
    in BENCH_NOTES; this pins basic numeric sanity), in all three
    activation-scale modes:
    - dynamic: per-tensor max-abs on the fly;
    - calibrate->static on the SAME batch: bit-identical to dynamic (the
      recorded max IS that batch's max);
    - static on a DIFFERENT batch: scales generalize."""
    from avvad_tpu.models.quantize import calibrate
    from avvad_tpu.models.vad_nets import _VideoTower

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(2, 3, 67, 67)).astype(np.float32))
    v2 = jnp.asarray(rng.normal(size=(2, 3, 67, 67)).astype(np.float32))

    tower = _VideoTower()
    variables = tower.init(jax.random.PRNGKey(0), v)
    ref = np.asarray(tower.apply(variables, v, train=False))

    qtower = _VideoTower(quant_int8=True)
    got = np.asarray(qtower.apply(variables, v, train=False))

    assert got.shape == ref.shape
    # relative error of the feature vectors, not elementwise (features are
    # ~zero-mean; elementwise rtol is meaningless at zero crossings)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.05, f"int8 trunk relative error {rel:.4f}"
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.995, f"int8/fp32 feature correlation {corr:.4f}"

    cal = _VideoTower(quant_int8=True, quant_mode="calibrate")
    vars_cal = calibrate(cal, variables, [(v,)], train=False)
    assert "quant" in vars_cal
    stower = _VideoTower(quant_int8=True, quant_mode="static")
    st_same = np.asarray(stower.apply(vars_cal, v, train=False))
    np.testing.assert_array_equal(st_same, got)

    st_new = np.asarray(stower.apply(vars_cal, v2, train=False))
    ref2 = np.asarray(tower.apply(variables, v2, train=False))
    rel2 = np.linalg.norm(st_new - ref2) / np.linalg.norm(ref2)
    assert rel2 < 0.05, f"static int8 rel error on held-out batch {rel2:.4f}"


@pytest.mark.slow
def test_int8_stem_close_to_fp32():
    """stem_int8: quantized-input W8A8 stem conv (resnet._StemInt8) on top
    of the int8-resident trunk. Same param tree as the float stem (the
    torchvision (7,7,3,64) kernel), one extra quant scale ("q_in"), and
    the full tower stays within the int8 noise envelope of the fp32 path
    in all three scale modes (calibrate->static bit-exact on the
    calibration batch, static generalizing to held-out frames)."""
    from avvad_tpu.models.quantize import calibrate
    from avvad_tpu.models.vad_nets import _VideoTower

    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.normal(size=(2, 3, 67, 67)).astype(np.float32))
    v2 = jnp.asarray(rng.normal(size=(2, 3, 67, 67)).astype(np.float32))

    tower = _VideoTower()
    variables = tower.init(jax.random.PRNGKey(0), v)
    ref = np.asarray(tower.apply(variables, v, train=False))

    qtower = _VideoTower(quant_int8=True, stem_int8=True)
    got = np.asarray(qtower.apply(variables, v, train=False))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.05, f"int8-stem trunk relative error {rel:.4f}"
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.995, f"int8-stem/fp32 feature correlation {corr:.4f}"

    cal = _VideoTower(quant_int8=True, stem_int8=True, quant_mode="calibrate")
    vars_cal = calibrate(cal, variables, [(v,)], train=False)
    assert "q_in" in vars_cal["quant"]["features"]
    stower = _VideoTower(quant_int8=True, stem_int8=True, quant_mode="static")
    np.testing.assert_array_equal(
        np.asarray(stower.apply(vars_cal, v, train=False)), got)

    st_new = np.asarray(stower.apply(vars_cal, v2, train=False))
    ref2 = np.asarray(tower.apply(variables, v2, train=False))
    rel2 = np.linalg.norm(st_new - ref2) / np.linalg.norm(ref2)
    assert rel2 < 0.05, f"static int8-stem rel error held-out {rel2:.4f}"


def test_masked_bce_finite_at_saturated_logits_under_jit():
    """Regression: XLA reassociated `1 - p + eps` into `(1 + eps) - p`
    (eps vanishes in fp32), so saturated logits made log(0) = -inf and
    `t * -inf` NaN — killing AV subset training at epoch 68. The loss must
    stay finite under jit for any logit magnitude."""
    from avvad_tpu.models.losses import (binary_cross_entropy,
                                         masked_sequence_bce)

    rng = np.random.default_rng(0)
    logits = jnp.asarray(
        np.concatenate([np.linspace(-40, 40, 256),
                        rng.normal(size=256) * 30]).astype(np.float32)
    ).reshape(1, 512, 1)
    targets = jnp.asarray((rng.uniform(size=(1, 512, 1)) > 0.5)
                          .astype(np.float32))
    mask = jnp.ones((1, 512))

    loss = jax.jit(masked_sequence_bce)(logits, targets, mask)
    assert np.isfinite(float(loss)), float(loss)
    loss2 = jax.jit(binary_cross_entropy)(logits, targets)
    assert np.isfinite(float(loss2)), float(loss2)

    # eps-inside-log parity at moderate logits is untouched
    lg = jnp.asarray(rng.normal(size=(1, 64, 1)).astype(np.float32) * 3)
    t = jnp.asarray((rng.uniform(size=(1, 64, 1)) > 0.5).astype(np.float32))
    p = np.asarray(jax.nn.sigmoid(lg))
    ref = -np.mean(t * np.log(p + 1e-8) + (1 - np.asarray(t)) *
                   np.log(1 - p + 1e-8))
    np.testing.assert_allclose(float(binary_cross_entropy(lg, t)), float(ref),
                               rtol=1e-5)


def test_unique_frame_tower_matches_upsampled():
    """Running the tower on unique 30 fps frames + gathering features onto
    the 62.5 fps timeline must equal running it on the pre-duplicated
    (ffmpeg-schedule upsampled) frames — the serving fast path."""
    from avvad_tpu.models import AVVAD
    from avvad_tpu.processing.video import fps_resample_indices

    rng = np.random.default_rng(0)
    b, t_src = 2, 6
    src = rng.normal(size=(b, t_src, 67, 67)).astype(np.float32)
    idx = fps_resample_indices(t_src, 30.0, 62.5)
    t = len(idx)
    upsampled = src[:, idx]  # what the offline pipeline materializes
    audio = rng.normal(size=(b, t, 513)).astype(np.float32)

    model = AVVAD(y_dim=1, lstm_hidden_size=32, lstm_layers=1, use_mcb=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(audio),
                           jnp.asarray(upsampled))

    ref = model.apply(variables, jnp.asarray(audio), jnp.asarray(upsampled),
                      train=False)
    fast = model.apply(variables, jnp.asarray(audio), jnp.asarray(src),
                       train=False, video_frame_indices=jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-6)


@pytest.mark.slow
def test_chunked_tower_matches_single_pass():
    """`tower_chunk` bounds peak trunk activation memory by scanning the
    trunk over frame slices; frames are row-independent through the trunk,
    so outputs must match the single-pass tower and the variable tree must
    be unchanged (checkpoint compatibility). Covers the padded tail
    (B*T not divisible by chunk) and the int8-static trunk."""
    from avvad_tpu.models import AVVAD
    from avvad_tpu.models.quantize import calibrate

    rng = np.random.default_rng(1)
    b, t = 2, 7  # 14 frames; chunk=4 -> 4 slices with a 2-frame pad tail
    video = rng.normal(size=(b, t, 67, 67)).astype(np.float32)
    audio = rng.normal(size=(b, t, 513)).astype(np.float32)

    for int8 in (False, True):
        kw = dict(y_dim=1, lstm_hidden_size=32, lstm_layers=1, use_mcb=False,
                  tower_int8=int8,
                  tower_quant_mode="static" if int8 else "dynamic")
        ref_model = AVVAD(**kw)
        chunked = AVVAD(**kw, tower_chunk=4)
        variables = ref_model.init(jax.random.PRNGKey(0), jnp.asarray(audio),
                                   jnp.asarray(video))
        if int8:
            cal = ref_model.clone(tower_quant_mode="calibrate")
            variables = calibrate(cal, variables,
                                  [(jnp.asarray(audio), jnp.asarray(video))],
                                  train=False)
        # same variable tree consumed directly: chunking must not rename
        ref = ref_model.apply(variables, jnp.asarray(audio),
                              jnp.asarray(video), train=False)
        out = chunked.apply(variables, jnp.asarray(audio), jnp.asarray(video),
                            train=False)
        # float trunk: exact. int8 trunk: shape-dependent fusion order
        # perturbs pre-quant activations ~2e-7, which can flip round() by
        # one LSB on boundary values — isolated frames then differ within
        # the int8-vs-f32 noise floor (see _VideoTower docstring).
        atol = 5e-3 if int8 else 1e-6
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=atol, err_msg=f"int8={int8}")
        # unrolled chunks (python loop -> independent subgraphs the
        # scheduler may overlap, vs the scan's strict serialization):
        # same equivalence contract, same variable tree.
        unrolled = AVVAD(**kw, tower_chunk=4, tower_chunk_unroll=True)
        out_u = unrolled.apply(variables, jnp.asarray(audio),
                               jnp.asarray(video), train=False)
        np.testing.assert_allclose(np.asarray(out_u), np.asarray(ref),
                                   atol=atol,
                                   err_msg=f"unrolled int8={int8}")


def test_stem_epilogue_pallas_exact():
    """The (unshipped; measured-negative on the current backend, see
    ops/stem_pallas.py) fused stem epilogue kernel must match the XLA
    reference bit-for-bit, including the ragged pad tail."""
    from avvad_tpu.ops.stem_pallas import (stem_epilogue_pool_quant,
                                           stem_epilogue_reference)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(37, 34, 34, 64)).astype(np.float32))
    a = jnp.asarray(rng.uniform(0.5, 2.0, 64).astype(np.float32))
    b = jnp.asarray(rng.normal(size=64).astype(np.float32))
    ref = np.asarray(stem_epilogue_reference(x, a, b))
    got = np.asarray(stem_epilogue_pool_quant(x, a, b))
    assert got.shape == (37, 17, 17, 64)
    assert (ref == got).all()
