"""Profiling / tracing hooks.

The reference has no profiling at all (SURVEY.md §5 — only wall-clock prints).
This module adds first-class TPU tracing:

- `trace(dir)`: context manager around `jax.profiler` traces (viewable in
  TensorBoard / Perfetto) for any region of the training loop.
- `Stopwatch`: named wall-clock spans with aggregate reporting, replacing the
  reference's scattered `time.time()` prints (run_gun.py:135,293-295,314-319).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Stopwatch:
    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name}: total {tot:.3f}s over {n} spans ({tot / n:.4f}s avg)")
        return "\n".join(lines)
