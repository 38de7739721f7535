"""Profiling and tracing.

The reference's only instrumentation was coarse `time.perf_counter` around
pools and tqdm bars (/root/reference/scripts/evaluate_audio_net.py:254-260).
Here: the same wall-clock phase reports (for benchmark parity) plus real
`jax.profiler` device traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Iterator


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace into `log_dir`.

    View with: tensorboard --logdir <log_dir>  (or load the .perfetto
    trace in ui.perfetto.dev)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulating named-phase wall-clock timer.

    with timer.phase("forward"): ...
    print(timer.report())
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["{:<20} {:>10} {:>8} {:>12}".format(
            "PHASE", "TOTAL (s)", "CALLS", "MEAN (ms)")]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            tot, n = self.totals[name], self.counts[name]
            lines.append("{:<20} {:>10.3f} {:>8d} {:>12.2f}".format(
                name, tot, n, 1e3 * tot / n))
        return "\n".join(lines)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()
