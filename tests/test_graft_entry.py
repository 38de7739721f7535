"""Driver entry-point contract: entry() compiles and returns frame logits."""

import jax
import numpy as np
import pytest


@pytest.mark.slow
def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    b, t = args[0].shape[0], args[0].shape[1]
    assert out.shape == (b, t, 1)
    assert np.isfinite(np.asarray(out)).all()
