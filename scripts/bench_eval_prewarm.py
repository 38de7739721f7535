"""Cold-evaluation pre-warm A/B: lazy jit vs concurrent AOT pre-warm.

Measures ROADMAP open item "evaluation bucket-compile amortization": a cold
complete-corpus evaluation is compile-bound (one remote XLA compile per
ladder shape, paid serially as batches arrive). `evaluate_split(prewarm=
True)` lowers every planned shape up front and compiles them on a thread
pool — if the backend compiles concurrently, the cold run pays
~max(compile times) instead of their sum.

A synthetic duration-diverse corpus (log-uniform 0.8-40 s, the
REHEARSAL.md round-5 shape regime) stands in for the rehearsal data; each
arm runs in a fresh process so both start with a cold jit cache.

Usage:
  python scripts/bench_eval_prewarm.py              # run both arms, report
  python scripts/bench_eval_prewarm.py --arm lazy   # one arm (subprocess)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_UTTS = 48
BATCH = 8
BUCKET = 128
HIDDEN = 1024
LAYERS = 2


class SyntheticAudioSource:
    """Duration-diverse in-memory split with the evaluate_split source
    protocol (len / rel_path / probe_length / __getitem__)."""

    def __init__(self, n: int, seed: int = 0):
        rng = np.random.default_rng(seed)
        # log-uniform durations, 0.8-40 s at 62.5 fps
        durs = np.exp(rng.uniform(np.log(0.8), np.log(40.0), size=n))
        self.lengths = np.maximum((durs * 62.5).astype(int), 8)
        self.seed = seed

    def __len__(self):
        return len(self.lengths)

    def rel_path(self, i: int) -> str:
        return f"synthetic/utt_{i:04d}.wav"

    def probe_length(self, i: int) -> int:
        return int(self.lengths[i])

    def __getitem__(self, i: int) -> dict:
        t = int(self.lengths[i])
        rng = np.random.default_rng((self.seed, i))
        return {
            "audio": rng.normal(size=(t, 513)).astype(np.float32),
            "label": (rng.random((t, 1)) > 0.5).astype(np.float32),
            "length": t,
        }


def run_arm(prewarm: bool) -> dict:
    import jax
    import jax.numpy as jnp

    from avvad_tpu.evaluate import evaluate_split
    from avvad_tpu.models import AudioVAD
    from avvad_tpu.train import create_train_state

    src = SyntheticAudioSource(N_UTTS)
    model = AudioVAD(y_dim=1, lstm_hidden_size=HIDDEN, lstm_layers=LAYERS)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (jnp.zeros((1, 32, 513)),))
    with tempfile.TemporaryDirectory() as d:
        report = evaluate_split(state, src, "audio", d + os.sep,
                                batch_size=BATCH, bucket=BUCKET,
                                bucket_ladder=True, prewarm=prewarm,
                                verbose=False)
    return report


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arm", choices=["lazy", "prewarm"])
    args = p.parse_args()
    if args.arm:
        print(json.dumps(run_arm(prewarm=(args.arm == "prewarm"))))
        return
    results = {}
    for arm in ("lazy", "prewarm"):
        # fresh compilation-cache dir per arm: both arms start truly cold
        with tempfile.TemporaryDirectory() as cache_dir:
            env = dict(os.environ, JAX_COMPILATION_CACHE_DIR=cache_dir)
            out = subprocess.run(
                [sys.executable, __file__, "--arm", arm],
                capture_output=True, text=True, env=env,
                cwd=os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__))),
            )
        if out.returncode != 0:
            print(out.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"arm {arm} failed")
        results[arm] = json.loads(out.stdout.strip().splitlines()[-1])
    lazy_s = results["lazy"]["elapsed_s"]
    warm_s = results["prewarm"]["elapsed_s"]
    print(json.dumps({
        "bench": "cold_eval_prewarm_ab",
        "n_utts": N_UTTS,
        "shapes": results["prewarm"]["prewarmed_shapes"],
        "lazy_cold_s": round(lazy_s, 1),
        "prewarm_cold_s": round(warm_s, 1),
        "prewarm_compile_s": round(results["prewarm"]["prewarm_s"], 1),
        "speedup": round(lazy_s / warm_s, 2) if warm_s else None,
    }))


if __name__ == "__main__":
    main()
