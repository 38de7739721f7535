"""Losses and frame-level classification metrics.

Numerics match /root/reference/packages/models/utils.py: the eps sits
*inside* the logs, after the sigmoid (utils.py:113) — this is the parity
contract for loss-curve comparison. Sequence masking replaces the
reference's per-sequence python loop (train_AV_net.py:298-301) with one
vectorized masked reduction that computes the same quantity: a per-sequence
mean over valid frames, summed over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bce_elementwise(logits: jax.Array, targets: jax.Array,
                     eps: float) -> jax.Array:
    """t*log(sigmoid(r)+eps) + (1-t)*log(1-sigmoid(r)+eps), safely.

    `1 - sigmoid(r)` is computed as `sigmoid(-r)` (mathematically exact,
    always in [0, 1]). Writing the literal `1.0 - p + eps` lets XLA
    reassociate it to `(1.0 + eps) - p`, where `1.0 + 1e-8 == 1.0` in
    fp32 — the eps vanishes, saturated logits give log(0) = -inf, and
    `t * -inf` at t=0 yields NaN. (Observed: AV subset training diverged
    at epoch 68 once logits saturated; eager evaluation of the same
    expression was finite.) sigmoid(-r) has no cancellable subtraction and
    is also more accurate near saturation.
    """
    p = jax.nn.sigmoid(logits)
    one_minus_p = jax.nn.sigmoid(-logits)
    return (targets * jnp.log(p + eps)
            + (1.0 - targets) * jnp.log(one_minus_p + eps))


def binary_cross_entropy(logits: jax.Array, targets: jax.Array,
                         eps: float = 1e-8) -> jax.Array:
    """-mean( t*log(sigmoid(r)+eps) + (1-t)*log(1-sigmoid(r)+eps) )."""
    return -jnp.mean(_bce_elementwise(logits, targets, eps))


def binary_cross_entropy_2classes(p1: jax.Array, p2: jax.Array, targets: jax.Array,
                                  eps: float = 1e-8) -> jax.Array:
    """-mean( sum_t( t*log(p1+eps) + (1-t)*log(p2+eps) ) ) (utils.py:116)."""
    return -jnp.mean(
        jnp.sum(targets * jnp.log(p1 + eps) + (1 - targets) * jnp.log(p2 + eps), axis=-1)
    )


def masked_sequence_bce(logits: jax.Array, targets: jax.Array, mask: jax.Array,
                        eps: float = 1e-8) -> jax.Array:
    """Batch loss: sum over sequences of the per-sequence BCE mean over
    valid frames — identical to the reference's
    `for seq: loss += bce(pred[:length], target[:length])` accumulation.

    logits/targets (B, T, y), mask (B, T).
    """
    elt = _bce_elementwise(logits, targets, eps)
    elt = elt * mask[..., None]
    # per-sequence mean over (valid frames x y_dim), then sum over batch
    denom = jnp.maximum(mask.sum(axis=1) * logits.shape[-1], 1.0)
    per_seq = -elt.sum(axis=(1, 2)) / denom
    return jnp.sum(per_seq * (mask.sum(axis=1) > 0))


def f1_metrics(y_hat_hard: jax.Array, y_true: jax.Array,
               mask: jax.Array | None = None, eps: float = 1e-8):
    """(accuracy, precision, recall, F1) from hard predictions.

    Same confusion-matrix arithmetic as the reference's f1_loss
    (utils.py:164-203), extended with an optional validity mask.
    """
    y_pred = y_hat_hard.astype(jnp.float32)
    y = y_true.astype(jnp.float32)
    m = jnp.ones_like(y) if mask is None else jnp.broadcast_to(
        mask[..., None] if mask.ndim == y.ndim - 1 else mask, y.shape
    ).astype(jnp.float32)

    tp = jnp.sum(y * y_pred * m)
    tn = jnp.sum((1 - y) * (1 - y_pred) * m)
    fp = jnp.sum((1 - y) * y_pred * m)
    fn = jnp.sum(y * (1 - y_pred) * m)

    accuracy = (tp + tn) / (tp + tn + fp + fn + eps)
    precision = tp / (tp + fp + eps)
    recall = tp / (tp + fn + eps)
    f1 = 2 * (precision * recall) / (precision + recall + eps)
    return accuracy, precision, recall, f1


def batch_mean_f1_metrics(y_hat_hard: jax.Array, y_true: jax.Array,
                          mask: jax.Array, eps: float = 1e-8):
    """Per-sequence metrics averaged over the batch — the reference's
    training-loop reporting (train_AV_net.py:316-329). (B, T, y) inputs."""
    per_seq = jax.vmap(lambda p, t, m: jnp.stack(f1_metrics(p, t, m, eps)))(
        y_hat_hard, y_true, mask
    )
    valid = (mask.sum(axis=1) > 0).astype(jnp.float32)
    n = jnp.maximum(valid.sum(), 1.0)
    acc, prec, rec, f1 = (per_seq * valid[:, None]).sum(axis=0) / n
    return acc, prec, rec, f1


# --- auxiliary losses kept for capability parity (utils.py:119-162) ---


def itakura_saito_divergence(r: jax.Array, x: jax.Array, eps: float = 1e-8) -> jax.Array:
    return jnp.sum(x / r - jnp.log(x + eps) + jnp.log(r) - 1.0, axis=-1)


def elbo(x, r, mu, logvar, eps: float = 1e-8):
    recon = jnp.mean(jnp.sum(x / r - jnp.log(x + eps) + jnp.log(r) - 1.0, axis=-1))
    kl = -0.5 * jnp.mean(jnp.sum(logvar - mu**2 - jnp.exp(logvar), axis=-1))
    return recon + kl, recon, kl


def mean_square_error_signal(x, y, y_hat):
    return jnp.mean(jnp.sum(jnp.square((y - y_hat) * x), axis=-1))


def mean_square_error_mask(y, y_hat):
    return jnp.mean(jnp.sum(jnp.square(y - y_hat), axis=-1))


def magnitude_spectrum_approximation_loss(x, s, y_hat):
    d = s - y_hat * x
    return jnp.mean(jnp.sum(d * jnp.conj(d) if jnp.iscomplexobj(d) else d * d, axis=-1))


def log_sum_exp(tensor: jax.Array, axis: int = -1) -> jax.Array:
    """LSE with the reference's +1e-8 stabilizer (utils.py:96-105)."""
    m = jnp.max(tensor, axis=axis, keepdims=True)
    return jnp.log(jnp.sum(jnp.exp(tensor - m), axis=axis, keepdims=True) + 1e-8) + m


def onehot(k: int):
    """1-of-k encoder factory (utils.py:82-94); labels >= k encode to zeros."""

    def encode(label: int) -> jax.Array:
        y = jnp.zeros(k, dtype=jnp.float32)
        return y.at[label].set(1.0) if label < k else y

    return encode


def enumerate_discrete(x: jax.Array, y_dim: int) -> jax.Array:
    """All one-hot labels tiled over the batch (utils.py:57-80): returns
    (y_dim * batch, y_dim) with batch copies of label 0, then label 1, ..."""
    batch = x.shape[0]
    eye = jnp.eye(y_dim, dtype=jnp.float32)
    return jnp.repeat(eye, batch, axis=0)


def init_normal(rng: jax.Array, params, mean: float = 0.0, std: float = 0.005):
    """Re-initialize a params tree with the reference's weights_init_normal
    policy (utils.py:5-26): linear/conv kernels ~ N(mean, std), norm scales
    ~ N(1, 0.02), biases zeroed. (The reference's LSTM branch never
    matched its own class name, so LSTMs keep their default init — same
    effective behavior here.)"""

    def leaf(path, value):
        nonlocal rng
        names = [getattr(p, "key", str(p)) for p in path]
        leaf_name = names[-1]
        rng, sub = jax.random.split(rng)
        if leaf_name == "kernel" and not any("lstm" in n for n in names):
            return mean + std * jax.random.normal(sub, value.shape, value.dtype)
        if leaf_name == "scale":
            return 1.0 + 0.02 * jax.random.normal(sub, value.shape, value.dtype)
        if leaf_name == "bias" and not any("lstm" in n for n in names):
            return jnp.zeros_like(value)
        return value

    return jax.tree_util.tree_map_with_path(leaf, params)
