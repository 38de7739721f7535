"""Torch-free synthesis of reference-model state dicts for golden tests.

The committed golden fixtures (tests/fixtures/torch_golden_*.npz) hold
inputs + reference logits + a (key, shape, dtype) manifest — NOT the
float weights, which would be tens of MB for the ResNet trunk. Instead
the float tensors are re-synthesized deterministically from one numpy
PCG64 stream, drawing per key in manifest order with magnitude rules
that mimic torch's init (kaiming-ish fan-in scaling for >=2-d weights,
near-1 BN gammas, positive running variances). The SAME function builds
the weights at generation time (scripts/make_torch_golden.py loads them
into the actual torch module before computing logits) and at test time
(tests/test_torch_golden_fixture.py migrates them into our Flax models),
so the comparison is exact without torch installed. Small integer
buffers (MCB sketch h/s, num_batches_tracked) are stored verbatim.
"""

from __future__ import annotations

import numpy as np

MANIFEST_KEY = "__manifest__"  # json: [[key, shape, dtype], ...]
SEED_KEY = "__seed__"
STORED_PREFIX = "stored:"  # npz entries holding integer buffers verbatim


def synth_array(rng: np.random.Generator, key: str, shape: tuple[int, ...]):
    """One float tensor for state-dict entry `key`, drawn from `rng`.

    Draw order is defined by the caller iterating the manifest in order;
    the rules only shape magnitude so every model family stays in a
    numerically sane regime (no saturated tanh/sigmoid, positive BN var).
    """
    n = rng.standard_normal(shape)
    if key.endswith("running_var"):
        return (0.7 + 0.3 * np.abs(n)).astype(np.float32)
    if key.endswith("running_mean"):
        return (0.1 * n).astype(np.float32)
    if len(shape) >= 2:  # conv / linear / lstm weights: fan-in scaling
        fan_in = int(np.prod(shape[1:]))
        return (n * np.sqrt(2.0 / fan_in)).astype(np.float32)
    if key.endswith(".weight"):  # 1-d float weight == BN gamma
        return (1.0 + 0.1 * n).astype(np.float32)
    return (0.05 * n).astype(np.float32)  # biases et al.


def synth_state_dict(manifest: list, seed: int, stored: dict) -> dict:
    """Rebuild the full numpy state dict: floats synthesized in manifest
    order from one seeded stream, integer buffers taken from `stored`."""
    rng = np.random.default_rng(seed)
    state = {}
    for key, shape, dtype in manifest:
        if np.dtype(dtype).kind in "iu":
            state[key] = stored[key]
        else:
            state[key] = synth_array(rng, key, tuple(shape))
    return state


def load_fixture(path: str):
    """-> (state_dict, arrays) from a committed golden npz."""
    import json

    with np.load(path, allow_pickle=False) as z:
        manifest = json.loads(str(z[MANIFEST_KEY]))
        seed = int(z[SEED_KEY])
        stored = {k[len(STORED_PREFIX):]: z[k] for k in z.files
                  if k.startswith(STORED_PREFIX)}
        arrays = {k: z[k] for k in z.files
                  if not k.startswith(STORED_PREFIX)
                  and k not in (MANIFEST_KEY, SEED_KEY)}
    return synth_state_dict(manifest, seed, stored), arrays


def save_fixture(path: str, manifest: list, seed: int, stored: dict,
                 arrays: dict) -> None:
    import json

    payload = {MANIFEST_KEY: np.str_(json.dumps(manifest)),
               SEED_KEY: np.int64(seed)}
    payload.update({STORED_PREFIX + k: v for k, v in stored.items()})
    payload.update(arrays)
    np.savez_compressed(path, **payload)
