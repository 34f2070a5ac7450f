"""Tracing / profiling utilities.

The reference's only tracing facility is the pausable ``TimeStamper`` wall
clock (``TimeStamper.h``) with hot spots documented in comments
(``GuidedFilter.h:137-141,254``). Here:

- :class:`PhaseTimer` — per-phase accumulated device-time breakdown
  (init / proposals+unary / graph-cut / postprocess), the structured version
  of the reference's single scalar;
- :func:`trace` — context manager around ``jax.profiler`` emitting an XPlane
  trace viewable in TensorBoard/Perfetto, for kernel-level TPU profiling.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


class PhaseTimer:
    """Accumulates wall time per named phase; ``block=True`` inserts a
    ``block_until_ready`` so asynchronous dispatch doesn't smear phases."""

    def __init__(self, block: bool = True):
        self.block = block
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, *sync_arrays) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.block and sync_arrays:
                jax.block_until_ready(sync_arrays)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(f"{name:<24} {self.totals[name]:8.3f}s "
                         f"({self.counts[name]} calls)")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """``with trace('/tmp/trace'):`` captures a jax.profiler device trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
