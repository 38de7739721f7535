"""Pallas fused LSTM kernel vs the lax.scan reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from avvad_tpu.models import LSTMStack


def test_pallas_lstm_matches_scan():
    """bf16-weight pallas path vs fp32 scan: bf16 weight rounding bounds
    the divergence (~1% of unit-scale hidden activations)."""
    b, t, d, h = 3, 11, 12, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, d))

    scan_model = LSTMStack(hidden_size=h, num_layers=2, use_pallas=False)
    params = scan_model.init(jax.random.PRNGKey(1), x)
    y_scan = scan_model.apply(params, x)

    pallas_model = LSTMStack(hidden_size=h, num_layers=2, use_pallas=True)
    y_pallas = pallas_model.apply(params, x)

    np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_scan),
                               atol=2e-2)

    # with fp32 weights the kernel matches the scan to float tolerance
    from avvad_tpu.ops.lstm_pallas import lstm_layer_fused

    p0 = params["params"]["layer_0"]
    x_proj = x @ p0["w_ih"] + p0["bias"]
    y_exact = lstm_layer_fused(x_proj, p0["w_hh"], interpret=True,
                               w_dtype=jnp.float32)
    # oracle: single scan layer
    y_layer = LSTMStack(hidden_size=h, num_layers=1).apply(
        {"params": {"layer_0": p0}}, x)
    np.testing.assert_allclose(np.asarray(y_exact), np.asarray(y_layer),
                               atol=1e-5)


def test_pallas_layer_batch_padding():
    """Batch sizes that are not a multiple of the sublane tile still work."""
    from avvad_tpu.ops.lstm_pallas import lstm_layer_fused

    b, t, h = 5, 7, 8
    rng = np.random.default_rng(0)
    x_proj = jnp.asarray(rng.normal(size=(b, t, 4 * h)).astype(np.float32))
    w_hh = jnp.asarray(rng.normal(size=(h, 4 * h)).astype(np.float32) * 0.1)

    y = lstm_layer_fused(x_proj, w_hh, interpret=True, w_dtype=jnp.float32)
    assert y.shape == (b, t, h)

    # manual recurrence oracle
    hh = np.zeros((b, h), np.float32)
    cc = np.zeros((b, h), np.float32)
    w = np.asarray(w_hh)
    xp = np.asarray(x_proj)

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    for step in range(t):
        gates = xp[:, step] + hh @ w
        i, f, g, o = np.split(gates, 4, axis=-1)
        cc = sig(f) * cc + sig(i) * np.tanh(g)
        hh = sig(o) * np.tanh(cc)
        np.testing.assert_allclose(np.asarray(y[:, step]), hh, atol=1e-5)


def test_pallas_lstm_gradients_match_scan():
    """custom_vjp backward kernel vs lax.scan autodiff: grads wrt inputs,
    both LSTM kernels, and biases agree to float tolerance (fp32 weights,
    interpret mode)."""
    b, t, d, h = 3, 9, 12, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, d))
    dy_seed = jax.random.normal(jax.random.PRNGKey(2), (b, t, h))

    scan_model = LSTMStack(hidden_size=h, num_layers=2, use_pallas=False)
    variables = scan_model.init(jax.random.PRNGKey(1), x)

    from avvad_tpu.ops import lstm_pallas

    def loss_fn(model, params, xx):
        y = model.apply(params, xx)
        return jnp.sum(y * dy_seed)  # non-trivial cotangent

    # force the pallas path to fp32 weights for exact comparison
    orig = lstm_pallas.lstm_layer_fused

    def fp32_fused(x_proj, w_hh, **kw):
        kw.pop("w_dtype", None)
        return orig(x_proj, w_hh, w_dtype=jnp.float32, **kw)

    lstm_pallas.lstm_layer_fused = fp32_fused
    try:
        import avvad_tpu.models.lstm as mlstm

        pallas_model = LSTMStack(hidden_size=h, num_layers=2,
                                 use_pallas=True)
        g_pallas, gx_pallas = jax.grad(
            lambda p, xx: loss_fn(pallas_model, p, xx), argnums=(0, 1)
        )(variables, x)
    finally:
        lstm_pallas.lstm_layer_fused = orig

    g_scan, gx_scan = jax.grad(
        lambda p, xx: loss_fn(scan_model, p, xx), argnums=(0, 1)
    )(variables, x)

    np.testing.assert_allclose(np.asarray(gx_pallas), np.asarray(gx_scan),
                               atol=1e-5)
    flat_p = jax.tree_util.tree_leaves_with_path(g_pallas)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(g_scan))
    for path, leaf in flat_p:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_s[path]), atol=1e-5,
            err_msg=str(path))


def test_pallas_lstm_grad_nonzero_h0_c0():
    """Initial-state cotangents (dh0/dc0) from the backward kernel match
    scan autodiff."""
    from avvad_tpu.ops.lstm_pallas import lstm_layer_fused

    b, t, h = 2, 6, 8
    rng = np.random.default_rng(0)
    x_proj = jnp.asarray(rng.normal(size=(b, t, 4 * h)).astype(np.float32))
    w_hh = jnp.asarray(rng.normal(size=(h, 4 * h)).astype(np.float32) * 0.2)
    h0 = jnp.asarray(rng.normal(size=(b, h)).astype(np.float32))
    c0 = jnp.asarray(rng.normal(size=(b, h)).astype(np.float32))

    def scan_ref(xp, w, hh0, cc0):
        def step(carry, xp_t):
            h_prev, c_prev = carry
            gates = xp_t + h_prev @ w
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
            hy = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (hy, c), hy
        _, ys = jax.lax.scan(step, (hh0, cc0), jnp.swapaxes(xp, 0, 1))
        return jnp.swapaxes(ys, 0, 1)

    def loss_pallas(xp, w, hh0, cc0):
        return jnp.sum(jnp.sin(lstm_layer_fused(
            xp, w, hh0, cc0, interpret=True, w_dtype=jnp.float32)))

    def loss_scan(xp, w, hh0, cc0):
        return jnp.sum(jnp.sin(scan_ref(xp, w, hh0, cc0)))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(x_proj, w_hh, h0, c0)
    gs = jax.grad(loss_scan, argnums=(0, 1, 2, 3))(x_proj, w_hh, h0, c0)
    for a, b_, name in zip(gp, gs, ["dx_proj", "dw_hh", "dh0", "dc0"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5,
                                   err_msg=name)


def test_quantized_state_recurrence_close_to_fp32():
    """Inference-only quantized-state variants: bf16 hidden state tracks
    fp32 within bf16 noise; the W8A8 recurrence (fixed h scale 127 —
    valid because h = o*tanh(c) is (-1,1)-bounded) stays within int8
    noise over a long recurrence. Also pins that oversize batches pad to
    the int8 sublane tile."""
    import numpy as np

    from avvad_tpu.ops.lstm_pallas import lstm_layer_fused

    rng = np.random.default_rng(0)
    b, t, h = 3, 64, 32
    xp = jnp.asarray(rng.normal(size=(b, t, 4 * h)).astype(np.float32) * 0.5)
    w = jnp.asarray(rng.normal(size=(h, 4 * h)).astype(np.float32)
                    / np.sqrt(h))

    y = lstm_layer_fused(xp, w, interpret=True)
    assert np.isfinite(np.asarray(y)).all()
    y16 = lstm_layer_fused(xp, w, interpret=True, state_quant="bf16")
    y8 = lstm_layer_fused(xp, w, interpret=True, state_quant="int8")
    d16 = float(jnp.abs(y16 - y).max())
    d8 = float(jnp.abs(y8 - y).max())
    # |h| <= 1: absolute tolerances. bf16 ~0.4% rel; int8 h-resolution is
    # 1/127 per step — error stays bounded (no blow-up over 64 steps)
    assert d16 < 0.02, d16
    assert d8 < 0.08, d8
    # hard-decision stability on a trained-like head would be gated on
    # hardware; here pin the correlation so regressions are loud
    c8 = np.corrcoef(np.asarray(y8).ravel(), np.asarray(y).ravel())[0, 1]
    assert c8 > 0.999, c8

    with np.testing.assert_raises(ValueError):
        lstm_layer_fused(xp, w, interpret=True, state_quant="fp8")


def test_quantized_state_through_model_head():
    """lstm_state_quant plumbs through AudioVAD: logits close to the
    default Pallas path on CPU interpret."""
    import numpy as np

    from avvad_tpu.models import AudioVAD

    xb = jnp.asarray(np.random.default_rng(1)
                     .normal(size=(2, 32, 513)).astype(np.float32))
    base = AudioVAD(y_dim=1, lstm_hidden_size=16, lstm_layers=2,
                    use_pallas_lstm=True)
    variables = base.init(jax.random.PRNGKey(0), xb)
    y0 = base.apply(variables, xb)
    for q, tol in (("bf16", 0.05), ("int8", 0.2)):
        m = AudioVAD(y_dim=1, lstm_hidden_size=16, lstm_layers=2,
                     use_pallas_lstm=True, lstm_state_quant=q)
        yq = m.apply(variables, xb)
        d = float(jnp.abs(yq - y0).max())
        assert d < tol, (q, d)


def test_quantized_state_is_inference_only_with_clear_error():
    """Differentiating the quantized-state recurrence must fail with the
    explicit inference-only message, not an opaque Pallas autodiff error."""
    import numpy as np
    import pytest

    from avvad_tpu.ops.lstm_pallas import lstm_layer_fused

    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.normal(size=(2, 8, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32) * 0.1)

    def loss(xp):
        return lstm_layer_fused(xp, w, interpret=True,
                                state_quant="int8").sum()

    with pytest.raises(NotImplementedError, match="inference-only"):
        jax.grad(loss)(xp)
