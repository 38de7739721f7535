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
