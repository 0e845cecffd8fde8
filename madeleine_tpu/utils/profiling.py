"""Profiling utilities — jax.profiler traces + per-step timing.

The reference only keeps an unreported wall-clock accumulator
(ref: trainer.py:99,138-139; SURVEY §5 'tracing: none'). Here:

- `trace(dir)`: context manager around `jax.profiler` (view in XProf/TensorBoard).
- `StepTimer`: rolling per-step wall-clock stats with device sync on demand.
- `annotate`: named TraceAnnotation for kernel-level attribution.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a device trace into log_dir (no-op when log_dir is None)."""
    import jax

    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for trace attribution."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling wall-clock step statistics (skips warmup/compile steps)."""

    def __init__(self, skip_first: int = 2):
        self.skip_first = skip_first
        self._times: List[float] = []
        self._t0: Optional[float] = None
        self._seen = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, sync=None) -> float:
        """Pass a jax array as `sync` to block on device completion first."""
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self._seen += 1
        if self._seen > self.skip_first:
            self._times.append(dt)
        return dt

    def stats(self) -> Dict[str, float]:
        if not self._times:
            return {"steps": 0}
        import numpy as np

        arr = np.asarray(self._times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "total_s": float(arr.sum()),
        }
