"""Profiling & step-time instrumentation (absent in the reference;
SURVEY.md §5 mandates it for the TPU build).

  * ``trace(dir)``      — context manager around ``jax.profiler`` traces
                          (view in TensorBoard / xprof).
  * ``annotate(name)``  — TraceAnnotation for named regions.
  * ``StepTimer``       — rolling step-time / throughput stats with
                          optional device-memory sampling.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Dict, Optional

import jax


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Persistent XLA compilation cache: repeat runs skip multi-minute
    remote compiles (no-op when the backend doesn't support it).

    Set ``AIHAB_NO_COMPILE_CACHE=1`` to disable — required when a tool's
    "compile+run Xs" output is being used as a COLD-compile measurement
    (with the cache on, those figures are warm-cache numbers).  The cache
    state is logged to stderr so readings stay interpretable (ADVICE.md r1).
    """
    import os
    import sys

    if os.environ.get("AIHAB_NO_COMPILE_CACHE"):
        print("[compile-cache] disabled via AIHAB_NO_COMPILE_CACHE; "
              "compile timings are cold", file=sys.stderr)
        return
    try:
        path = os.path.expanduser(
            cache_dir or "~/.cache/aihab_clip_tpu/xla_cache")
        os.makedirs(path, exist_ok=True)
        n_entries = sum(1 for _ in os.scandir(path))
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        print(f"[compile-cache] enabled at {path} ({n_entries} entries); "
              "compile timings may be warm-cache "
              "(AIHAB_NO_COMPILE_CACHE=1 for cold)", file=sys.stderr)
    except Exception:
        pass


@contextlib.contextmanager
def trace(log_dir: str, with_memory: bool = True):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> Optional[Dict[str, int]]:
    try:
        stats = jax.local_devices()[0].memory_stats()
        if not stats:
            return None
        return {"bytes_in_use": stats.get("bytes_in_use", 0),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
                "bytes_limit": stats.get("bytes_limit", 0)}
    except Exception:
        return None


class StepTimer:
    """Rolling window step timer: call ``tick(items)`` once per step."""

    def __init__(self, window: int = 50):
        # SAME maxlen for both: each appended interval pairs with one item
        # count; mismatched windows paired N items with N+1 intervals and
        # under-reported items_per_second by ~1/window
        self._times = deque(maxlen=window)
        self._items = deque(maxlen=window)
        self._t_last: Optional[float] = None
        self.total_steps = 0

    def tick(self, items: int = 0) -> None:
        now = time.perf_counter()
        if self._t_last is not None:
            self._times.append(now - self._t_last)
            self._items.append(items)
        self._t_last = now
        self.total_steps += 1

    @property
    def mean_step_seconds(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    @property
    def items_per_second(self) -> float:
        t = sum(self._times)
        return sum(self._items) / t if t > 0 else 0.0

    def summary(self) -> Dict[str, float]:
        out = {
            "steps": self.total_steps,
            "mean_step_ms": self.mean_step_seconds * 1e3,
            "items_per_sec": self.items_per_second,
        }
        mem = device_memory_stats()
        if mem:
            out["device_peak_mb"] = mem["peak_bytes_in_use"] / 1e6
        return out
