"""Observability: solve-time recording and device profiling.

The reference prints ``"solver time: ..."`` around every solver call
(control/control.py:24,60,...) and keeps ad-hoc per-branch time dicts.
Here timing is a structured recorder with percentile summaries — the
BASELINE metrics (p50/p99 solve latency) fall out directly — plus a thin
wrapper over ``jax.profiler`` for device traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np


class SolveTimer:
    """Named wall-clock recorder with percentile summaries."""

    def __init__(self):
        self.samples: dict[str, list[float]] = defaultdict(list)

    @contextlib.contextmanager
    def measure(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append((time.perf_counter() - t0) * 1e3)

    def record(self, name: str, millis: float):
        self.samples[name].append(millis)

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for name, xs in self.samples.items():
            a = np.asarray(xs)
            out[name] = {
                "count": int(a.size),
                "p50_ms": float(np.percentile(a, 50)),
                "p99_ms": float(np.percentile(a, 99)),
                "mean_ms": float(a.mean()),
                "max_ms": float(a.max()),
            }
        return out

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.summary().items()):
            lines.append(
                f"{name:32s} n={s['count']:5d} p50={s['p50_ms']:8.3f}ms "
                f"p99={s['p99_ms']:8.3f}ms max={s['max_ms']:8.3f}ms"
            )
        return "\n".join(lines)


GLOBAL_TIMER = SolveTimer()


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
