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


def module_device_ms(profile_dir: str, module_substr: str = "step_fn"):
    """Median DEVICE-side duration (ms) of a jitted module in a jax.profiler
    Chrome-trace export under `profile_dir` — the tunnel-independent truth for
    step time (the axon tunnel adds ~70 ms of round-trip to wall timings).
    Returns None when no trace or no matching module exists."""
    import glob
    import gzip
    import json as _json
    import os as _os
    import statistics

    paths = sorted(glob.glob(_os.path.join(
        profile_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        return None
    with gzip.open(paths[-1]) as f:
        tr = _json.load(f)
    ev = tr["traceEvents"]
    tids = {(e["pid"], e["tid"]): e["args"]["name"]
            for e in ev if e.get("ph") == "M" and e.get("name") == "thread_name"}
    durs = [e["dur"] for e in ev if e.get("ph") == "X"
            and tids.get((e["pid"], e["tid"])) == "XLA Modules"
            and module_substr in e["name"]]
    if not durs:
        return None
    return statistics.median(durs) / 1e3
