"""Train state: params + batch_stats + sketch buffers + optimizer state."""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    sketch: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    quant: Any = None  # calibrated int8 activation scales (models/quantize)

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        if self.sketch is not None:
            v["sketch"] = self.sketch
        if self.quant is not None:
            v["quant"] = self.quant
        return v

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)


def make_optimizer(
    learning_rate: float = 1e-4,
    b1: float = 0.9,
    b2: float = 0.999,
    freeze_filter: Optional[Callable] = None,
    params=None,
) -> optax.GradientTransformation:
    """Adam, optionally with a frozen subtree.

    `freeze_filter(path_names) -> bool` returns True for TRAINABLE leaves.
    Mirrors the reference's Adam(lr=1e-4) + frozen ResNet trunk
    (train_AV_net.py:238-245).
    """
    adam = optax.adam(learning_rate, b1=b1, b2=b2)
    if freeze_filter is None:
        return adam

    def label(params):
        def per_leaf(path, _v):
            names = [getattr(p, "key", str(p)) for p in path]
            return "train" if freeze_filter(names) else "frozen"

        return jax.tree_util.tree_map_with_path(per_leaf, params)

    return optax.multi_transform(
        {"train": adam, "frozen": optax.set_to_zero()}, label
    )


def trainable_except_video_trunk(path_names: list[str]) -> bool:
    """False (frozen) for anything under the ResNet 'features' module."""
    return "features" not in path_names


def create_train_state(model, rng, example_inputs: tuple, tx=None,
                       train_kwargs: Optional[dict] = None) -> TrainState:
    """Initialize variables and wrap them in a TrainState."""
    import jax.numpy as jnp

    variables = model.init(rng, *example_inputs, **(train_kwargs or {}))
    params = variables["params"]
    if tx is None:
        tx = make_optimizer()
    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats"),
        sketch=variables.get("sketch"),
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
        quant=variables.get("quant"),
    )
