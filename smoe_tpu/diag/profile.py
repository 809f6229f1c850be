"""Tracing / profiling (SURVEY.md §5).

The reference has no tracing at all — only a console progressbar with a
per-sweep timer (reference smoe.py:1634-1640).  Here:

  * `trace(log_dir)`: context manager around `jax.profiler` — produces a
    TensorBoard-loadable XLA trace of everything inside (compile, device
    compute, transfers).
  * `PhaseTimer`: lightweight named wall-clock phases for the fit loop
    (init / sweep / validate / quantize / callbacks), reported as a table
    or JSON-able dict.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed block into log_dir."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside an active trace (shows up on the host timeline)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


class PhaseTimer:
    """Accumulating named wall-clock phases.

    >>> t = PhaseTimer()
    >>> with t.phase("sweep"): ...
    >>> t.report()
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": round(self.totals[k], 4),
                    "count": self.counts[k],
                    "mean_s": round(self.totals[k] / max(self.counts[k], 1),
                                    6)}
                for k in sorted(self.totals)}

    def report(self) -> str:
        lines = [f"{'phase':<16}{'total s':>10}{'count':>8}{'mean s':>12}"]
        for k, v in self.as_dict().items():
            lines.append(f"{k:<16}{v['total_s']:>10.3f}{v['count']:>8}"
                         f"{v['mean_s']:>12.6f}")
        out = "\n".join(lines)
        print(out)
        return out
