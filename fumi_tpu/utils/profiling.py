"""Tracing / profiling — first-class, unlike the reference (SURVEY §5.1:
the reference has only tqdm progress bars, ref: am3.py:337-341).

- :func:`profile_trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace (enabled by ``--tpu_profile_dir``).
- :class:`Throughput` — episodes/sec counter (the BASELINE.json headline
  metric) with exponential smoothing, fed by the training loop.
- :func:`device_sync` — a *reliable* synchronization point: fetches a scalar
  rather than ``block_until_ready`` (which can return early through remote
  TPU tunnels — see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace if ``log_dir`` is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_sync(value) -> float:
    """Fetch-to-host sync on a device scalar (or array's first element)."""
    arr = np.asarray(value)
    return float(arr.reshape(-1)[0])


def hbm_stats() -> dict:
    """Device-memory observability: ``mem/*`` metrics from the default
    device's allocator, for the eval-boundary logs. Keys (bytes_in_use,
    peak_bytes_in_use, ...) depend on the PJRT runtime; platforms that
    report nothing (CPU, some tunneled runtimes) yield ``{}`` — callers
    just merge the result."""
    import jax
    try:
        stats = jax.devices()[0].memory_stats() or {}
    except Exception:
        return {}
    return {f"mem/{k}": float(v) for k, v in stats.items()
            if isinstance(v, (int, float)) and "bytes" in k}


class Throughput:
    """Episodes/sec counter with exponential smoothing."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self._last_t: Optional[float] = None
        self._last_count = 0
        self.rate = 0.0
        self.total_episodes = 0

    def update(self, episodes_done: int) -> float:
        """Record cumulative episode count; returns smoothed eps/sec."""
        now = time.perf_counter()
        if self._last_t is not None and episodes_done > self._last_count:
            inst = (episodes_done - self._last_count) / (now - self._last_t)
            self.rate = (inst if self.rate == 0.0
                         else self.alpha * inst +
                         (1 - self.alpha) * self.rate)
        self._last_t = now
        self._last_count = episodes_done
        self.total_episodes = episodes_done
        return self.rate
