"""Jitted train/eval steps, parameterized by modality.

One compiled XLA program per (modality, bucketed shape): dataset-level
normalization -> forward -> masked per-sequence BCE -> grads -> Adam ->
frame metrics. The normalization order and eps placement match the
reference exactly (train_AV_net.py:286-301); the per-sequence loss
accumulation and per-batch metric averaging are the vectorized equivalents
of its python loops (:298-329).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from ..models.losses import batch_mean_f1_metrics, masked_sequence_bce


def normalize(x: jax.Array, mean: jax.Array, std: jax.Array,
              eps: float = 1e-8) -> jax.Array:
    """(x - mean) / (std + eps), broadcasting (dim, 1)-shaped stats against
    time-major (B, T, dim) features (train_AV_net.py:286-291)."""
    m = jnp.asarray(mean)[..., 0] if jnp.ndim(mean) == 2 else jnp.asarray(mean)
    s = jnp.asarray(std)[..., 0] if jnp.ndim(std) == 2 else jnp.asarray(std)
    return (x - m) / (s + eps)


def _forward_inputs(modality: str, batch, norm_stats, eps: float):
    """Model positional inputs for a batch, normalized if stats present."""
    audio, video = batch.audio, batch.video
    if norm_stats is not None:
        if audio is not None and norm_stats.get("audio_mean") is not None:
            audio = normalize(audio, norm_stats["audio_mean"],
                              norm_stats["audio_std"], eps)
        if video is not None and norm_stats.get("video_mean") is not None:
            video = normalize(video, norm_stats["video_mean"],
                              norm_stats["video_std"], eps)
    if modality == "audio":
        return (audio,)
    if modality == "video":
        return (video,)
    if modality == "av":
        return (audio, video)
    if modality == "waveform":
        return (batch.waveform,)
    raise ValueError(f"unknown modality: {modality}")


def _metrics(logits, batch, loss, eps):
    y_hat_soft = jax.nn.sigmoid(logits)
    y_hat_hard = (y_hat_soft > 0.5).astype(jnp.float32)
    acc, prec, rec, f1 = batch_mean_f1_metrics(y_hat_hard, batch.label,
                                               batch.mask, eps)
    return {"loss": loss, "accuracy": acc, "precision": prec,
            "recall": rec, "f1": f1}


def make_train_step(modality: str, eps: float = 1e-8, donate: bool = True,
                    dropout: bool = False, dropout_seed: int = 0):
    """-> step(state, batch, norm_stats) -> (state, metrics).

    `dropout=True` threads a per-step dropout rng (fold of the step count)
    for models built with dropout_rate > 0."""

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state, batch, norm_stats):
        inputs = _forward_inputs(modality, batch, norm_stats, eps)
        rngs = (
            {"dropout": jax.random.fold_in(jax.random.PRNGKey(dropout_seed),
                                           state.step)}
            if dropout else {}
        )

        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            if state.sketch is not None:
                variables["sketch"] = state.sketch
            if mutable:
                logits, new_model_state = state.apply_fn(
                    variables, *inputs, train=True, mutable=mutable,
                    rngs=rngs,
                )
            else:
                logits = state.apply_fn(variables, *inputs, train=True,
                                        rngs=rngs)
                new_model_state = {}
            loss = masked_sequence_bce(logits, batch.label, batch.mask, eps)
            return loss, (logits, new_model_state)

        (loss, (logits, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads)
        if new_model_state.get("batch_stats") is not None:
            new_state = new_state.replace(
                batch_stats=new_model_state["batch_stats"]
            )
        return new_state, _metrics(logits, batch, loss, eps)

    return train_step


def make_eval_step(modality: str, eps: float = 1e-8):
    """-> step(state, batch, norm_stats) -> (metrics, y_hat_soft).

    BatchNorm uses running averages; no state mutation."""

    @jax.jit
    def eval_step(state, batch, norm_stats):
        inputs = _forward_inputs(modality, batch, norm_stats, eps)
        logits = state.apply_fn(state.variables(), *inputs, train=False)
        loss = masked_sequence_bce(logits, batch.label, batch.mask, eps)
        return _metrics(logits, batch, loss, eps), jax.nn.sigmoid(logits)

    return eval_step


def make_predict_step(modality: str, eps: float = 1e-8):
    """-> step(state, batch, norm_stats) -> y_hat_soft (B, T, y).

    Pure inference (no labels needed) for the evaluation writers."""

    @jax.jit
    def predict_step(state, batch, norm_stats):
        inputs = _forward_inputs(modality, batch, norm_stats, eps)
        logits = state.apply_fn(state.variables(), *inputs, train=False)
        return jax.nn.sigmoid(logits)

    return predict_step
