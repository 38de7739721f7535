"""Epoch-loop trainer, parameterized by modality ('audio' | 'video' | 'av').

One trainer covers the reference's three scripts
(/root/reference/scripts/train_{audio,video,AV}_net.py): per-epoch train +
validation passes with per-batch logging to output_batch.log and per-epoch
summaries to output_epoch.log (same format family), Orbax checkpoints named
by epoch/vloss, optional pretrained-video-trunk load + freeze.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax

from ..data import DataLoader, Prefetcher
from .checkpoint import save_checkpoint
from .state import TrainState
from .steps import make_eval_step, make_train_step


def _to_float(metrics: dict) -> dict:
    return {k: float(v) for k, v in metrics.items()}


class MetricAccumulator:
    def __init__(self):
        self.totals: dict = {}
        self.n = 0

    def add(self, metrics: dict):
        for k, v in metrics.items():
            self.totals[k] = self.totals.get(k, 0.0) + float(v)
        self.n += 1

    def mean(self) -> dict:
        return {k: v / max(self.n, 1) for k, v in self.totals.items()}


class Trainer:
    def __init__(
        self,
        state: TrainState,
        modality: str,
        model_dir: str,
        norm_stats: Optional[dict] = None,
        eps: float = 1e-8,
        log_interval: int = 1,
        prefetch: bool = True,
        prewarm: bool = False,
        mesh=None,
    ):
        """With `mesh`, parameters are placed by the sharding rules and
        every batch is sharded over the mesh `data` axis — SPMD data
        parallelism replacing the reference's nn.DataParallel
        (train_AV_net.py:193). Batch sizes must divide the data axis."""
        self.state = state
        self.modality = modality
        self.model_dir = model_dir
        self.norm_stats = norm_stats
        self.log_interval = log_interval
        self.prefetch = prefetch
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import shard_opt_state, shard_params

            self.state = state.replace(
                params=shard_params(mesh, state.params),
                opt_state=shard_opt_state(mesh, state.opt_state))
        self.train_step = make_train_step(modality, eps)
        self.eval_step = make_eval_step(modality, eps)
        # first-epoch pre-warm: AOT-compile each epoch's planned batch
        # shapes concurrently instead of letting lazy jit compile them
        # serially as batches arrive (see data.prewarm). Shapes compiled
        # in earlier epochs are reused; unplanned shapes fall back to jit.
        # Single-device only: under a mesh lazy jit owns sharding.
        self.prewarm = prewarm and mesh is None
        self._compiled = {"train": {}, "eval": {}}
        os.makedirs(model_dir, exist_ok=True)
        self.batch_log = os.path.join(model_dir, "output_batch.log")
        self.epoch_log = os.path.join(model_dir, "output_epoch.log")

    def _log(self, path: str, line: str):
        with open(path, "a") as f:
            f.write(line + "\n")

    def _iter(self, loader: DataLoader):
        if self.mesh is not None:
            import jax

            from ..parallel import batch_sharding

            sh = batch_sharding(self.mesh)
            put = lambda a: jax.device_put(a, sh)  # noqa: E731
            if self.prefetch:
                return Prefetcher(loader, put_fn=put)
            from ..data.batching import Batch

            return (Batch(*[None if a is None else put(a) for a in b])
                    for b in loader)
        return Prefetcher(loader) if self.prefetch else iter(loader)

    def _maybe_prewarm(self, loader: DataLoader, kind: str):
        """Concurrently AOT-compile this epoch's missing batch shapes."""
        if not self.prewarm:
            return
        from ..data.prewarm import prewarm_step

        step = self.train_step if kind == "train" else self.eval_step
        cache = self._compiled[kind]
        cache.update(prewarm_step(step, self.state, loader, self.norm_stats,
                                  skip=set(cache)))

    def train_epoch(self, loader: DataLoader, epoch: int) -> dict:
        # Pin the loader's epoch to the trainer's: the loader's internal
        # counter restarts at 0 on every process start, so a resumed run
        # would otherwise replay the shuffle orders and augmentation noise
        # realizations of the epochs it already trained on.
        loader.epoch = epoch
        self._maybe_prewarm(loader, "train")
        compiled = self._compiled["train"]
        acc = MetricAccumulator()
        n_total = len(loader.source)
        seen = 0
        for batch_idx, batch in enumerate(self._iter(loader)):
            step = compiled.get((batch.batch_size, batch.max_frames),
                                self.train_step)
            self.state, metrics = step(self.state, batch, self.norm_stats)
            m = _to_float(metrics)
            acc.add(m)
            seen += batch.batch_size
            if batch_idx % self.log_interval == 0:
                self._log(
                    self.batch_log,
                    "Train Epoch: {:2d}   [{:4d}/{:4d} ({:2d}%)]    "
                    "Loss: {:.2f}    Accuracy: {:.2f}    Precision: {:.2f}    "
                    "Recall: {:.2f}    F1-score.: {:.2f}".format(
                        epoch, seen, n_total,
                        int(100.0 * (batch_idx + 1) / len(loader)),
                        m["loss"], m["accuracy"], m["precision"],
                        m["recall"], m["f1"],
                    ),
                )
        return acc.mean()

    def eval_epoch(self, loader: DataLoader) -> dict:
        self._maybe_prewarm(loader, "eval")
        compiled = self._compiled["eval"]
        acc = MetricAccumulator()
        for batch in self._iter(loader):
            step = compiled.get((batch.batch_size, batch.max_frames),
                                self.eval_step)
            metrics, _ = step(self.state, batch, self.norm_stats)
            acc.add(_to_float(metrics))
        return acc.mean()

    def fit(self, train_loader: DataLoader, valid_loader: DataLoader,
            start_epoch: int = 1, end_epoch: int = 100,
            save_every: int = 1, keep_checkpoints: int = 3) -> dict:
        """keep_checkpoints: retain the best-vloss checkpoint plus this many
        newest epochs, pruning the rest (0 = keep everything, the
        reference's behavior)."""
        last = {}
        for epoch in range(start_epoch, end_epoch):
            t0 = time.perf_counter()
            train_m = self.train_epoch(train_loader, epoch)
            valid_m = self.eval_epoch(valid_loader)
            dt = time.perf_counter() - t0

            self._log(self.epoch_log, f"Epoch: {epoch}")
            for tag, m in [("Train", train_m), ("Validation", valid_m)]:
                self._log(
                    self.epoch_log,
                    "[{}]  Loss: {:.2f}    Accuracy: {:.2f}    "
                    "Precision: {:.2f}    Recall: {:.2f}    F1_score: {:.2f}".format(
                        tag, m.get("loss", 0), m.get("accuracy", 0),
                        m.get("precision", 0), m.get("recall", 0), m.get("f1", 0),
                    ),
                )
            self._log(self.epoch_log, f"[Time]  {dt:.2f}s")

            if epoch % save_every == 0:
                save_checkpoint(self.model_dir, self.state, self.norm_stats,
                                epoch=epoch, valid_loss=valid_m.get("loss", 0.0))
                if keep_checkpoints:
                    from .checkpoint import prune_checkpoints

                    prune_checkpoints(self.model_dir,
                                      keep_latest=keep_checkpoints)
            last = {"train": train_m, "valid": valid_m, "epoch": epoch}
        return last
