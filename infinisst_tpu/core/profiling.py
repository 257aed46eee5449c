"""Tracing / profiling helpers.

The reference's only tracing is a cuda-synchronized wall timer around
generate (agents/infinisst.py:37-48).  Here:

- ``timed(name)``: host wall timer with device sync (RTF measurements);
- ``device_trace(logdir)``: jax.profiler trace context (XPlane/TensorBoard)
  for kernel-level inspection;
- ``StepTimer``: running per-phase accumulation printed on demand.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


@contextlib.contextmanager
def timed(name: str, sync_on=None, quiet: bool = False):
    import jax

    t0 = time.perf_counter()
    yield
    if sync_on is not None:
        jax.block_until_ready(sync_on)
    dt = time.perf_counter() - t0
    if not quiet:
        print(f"{name}: {dt:.4f} seconds")


@contextlib.contextmanager
def device_trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        import jax

        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name, tot in sorted(self.totals.items()):
            n = self.counts[name]
            lines.append(
                f"{name}: total {tot*1e3:.1f} ms, n={n}, "
                f"mean {tot/n*1e3:.2f} ms"
            )
        return "\n".join(lines)
