"""Small helpers."""

from __future__ import annotations

import jax
import numpy as np


def count_parameters(params) -> int:
    """Total parameter count of a pytree (the reference's count_parameters,
    /root/reference/packages/utils.py:5)."""
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
