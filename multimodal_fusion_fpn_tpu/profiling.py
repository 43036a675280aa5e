"""Profiling and step-timing instrumentation.

The reference explicitly disables profiling (``/root/reference/train.py:
46-47``); here tracing is a first-class feature:

  * :class:`StepTimer` — streaming per-step wall-time stats with correct
    async-dispatch handling (a step is only "done" once its outputs are
    fetched; on remote-tunnel platforms ``block_until_ready`` may be a
    no-op, so the timer forces a scalar fetch).
  * :func:`trace` — context manager around ``jax.profiler`` emitting a
    TensorBoard-compatible trace directory when supported by the
    platform, and degrading to step timing when not.
"""

import contextlib
import time
from typing import Optional

import numpy as np


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._count = 0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None):
        """Stop timing one step.  Pass a device scalar (e.g. the loss) as
        ``sync_value`` to force synchronization before reading the clock."""
        if sync_value is not None:
            float(sync_value)
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)
        return dt

    def summary(self) -> dict:
        if not self.times:
            return {"steps": 0}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p95_ms": float(np.percentile(arr, 95) * 1e3),
            "min_ms": float(arr.min() * 1e3),
        }


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Profile the enclosed block with jax.profiler when available."""
    import jax
    started = False
    if log_dir is not None:
        try:
            jax.profiler.start_trace(log_dir)
            started = True
        except Exception as exc:  # remote platforms may not support it
            print(f"jax.profiler unavailable ({exc}); falling back to "
                  "step timing only")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
