"""Tracing / profiling subsystem.

The reference has none (SURVEY.md §5.1 — tqdm bars and interval prints only).
This module provides:

  * `trace(dir)` — context manager around jax.profiler for XLA/TPU traces
    viewable in TensorBoard/Perfetto;
  * `StepTimer` — wall-clock step timing with synchronization on a probe
    array (block_until_ready; note some remote platforms under-report —
    pair with `realize()` on an output scalar for trustworthy numbers);
  * `device_memory_stats()` — per-device HBM usage where the backend
    exposes it;
  * `annotate(name)` — named trace spans (jax.profiler.TraceAnnotation).
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace into `log_dir`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


def realize(x) -> float:
    """Force execution + device->host transfer of a scalar; returns it.
    Stronger than block_until_ready on relayed/deferred backends."""
    return float(np.asarray(x).reshape(-1)[0])


class StepTimer:
    """Accumulates step wall times; sync on demand.

    with timer.step():
        ... dispatch jitted work ...
    timer.sync(loss)   # every `sync_every` steps, forces realization
    """

    def __init__(self, sync_every: int = 10):
        self.sync_every = sync_every
        self.times: list[float] = []
        self._count = 0
        self._t0 = None

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    def sync(self, probe) -> float | None:
        """Realize `probe` every sync_every steps; returns its value then."""
        self._count += 1
        if self._count % self.sync_every == 0:
            return realize(probe)
        return None

    def summary(self) -> dict:
        arr = np.asarray(self.times[1:] or self.times)  # drop compile step
        if arr.size == 0:
            return {"steps": 0}
        return {
            "steps": int(arr.size),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
        }


def device_memory_stats() -> list[dict]:
    out = []
    for dev in jax.devices():
        stats = {}
        try:
            stats = dict(dev.memory_stats() or {})
        except (AttributeError, NotImplementedError, RuntimeError):
            pass
        out.append({"device": str(dev), **{k: int(v) for k, v in stats.items()
                                           if isinstance(v, (int, float))}})
    return out
