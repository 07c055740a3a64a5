"""Tracing/profiling utilities (SURVEY.md §5: the reference has only
wall-clock prints; here profiling is a first-class utility).

- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory;
- :class:`StepTimer` — steady-state step timing with hard host
  synchronization (device-to-host readback of a scalar), robust to
  asynchronous dispatch and tunneled devices;
- :func:`log_compile_time` — wall-clock of the first (compiling) call.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/ecg_byte_tpu_trace"):
    """Capture a device trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def hard_sync(x) -> float:
    """Block until ``x`` is computed by reading one element back to host."""
    import jax

    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(leaf).ravel()[0])


class StepTimer:
    """Accumulates steady-state step timings.

    Usage::

        timer = StepTimer()
        for batch in loader:
            with timer.step():
                out = step_fn(state, batch)
                timer.sync(out)
        print(timer.summary())
    """

    def __init__(self):
        self.times = []
        self._t0: Optional[float] = None

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    def sync(self, out) -> None:
        hard_sync(out)

    def summary(self) -> dict:
        if not self.times:
            return {}
        arr = np.asarray(self.times[1:] or self.times)  # drop compile step
        return {
            "steps": len(self.times),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
        }


def log_compile_time(fn: Callable, *args, label: str = "fn") -> float:
    """Time the first (tracing+compiling) invocation of a jitted fn."""
    t0 = time.perf_counter()
    out = fn(*args)
    hard_sync(out)
    dt = time.perf_counter() - t0
    print(f"[profiling] {label} first call (compile): {dt:.1f}s")
    return dt


def log_live_bytes(tag: str) -> int:
    """Print and return the total bytes of live device arrays.

    The axon PJRT plugin returns no ``memory_stats()``, so peak HBM is not
    directly readable; live-array residency at phase boundaries is the
    observable proxy.  Gated behind ``ECG_BYTE_LOG_MEMORY=1`` in the CLIs
    (used by scripts/flagship_rehearsal.py to record the dress-rehearsal
    memory profile)."""
    import jax

    n = sum(int(np.prod(x.shape)) * x.dtype.itemsize for x in jax.live_arrays())
    print(f"[memory] {tag}: {n / 1e9:.2f} GB live on device", flush=True)
    return n
