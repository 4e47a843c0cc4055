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


def summarize_hlo_stats(trace_dir: str, top: int = 15) -> dict | None:
    """Parse an xprof trace captured with `trace(dir)` into per-HLO-op stats:
    total device time, time by op category, and the top ops with bound-by
    classification and achieved GF/s / GiB/s. Returns None when the xprof
    converter is unavailable (it ships with tensorboard-plugin-profile).

    This is the workflow behind PERFORMANCE.md: capture 5 steps under
    trace(), then summarize_hlo_stats() to see where device time goes.
    """
    import glob
    import json
    from collections import defaultdict

    try:
        from xprof.convert import raw_to_tool_data as r2d
    except ImportError:
        try:
            from tensorboard_plugin_profile.convert import raw_to_tool_data as r2d
        except ImportError:
            return None

    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    if not paths:
        return None
    try:
        data, _ = r2d.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
        raw = json.loads(data if isinstance(data, str) else data.decode())
        cols = [c.get("label") or c.get("id") for c in raw["cols"]]
        idx = {name: cols.index(name) for name in (
            "HLO op category", "HLO op name", "#Occurrences",
            "Total self time (us)", "Bound by", "Model GFLOP/s",
            "HBM BW (GiB/s)")}
    except (ValueError, KeyError, json.JSONDecodeError):
        # Column names vary across xprof versions; degrade to None rather
        # than crash a profiling workflow.
        return None

    def val(row, name):
        return row["c"][idx[name]].get("v")

    ops = []
    for row in raw["rows"]:
        ops.append({
            "name": val(row, "HLO op name"),
            "category": val(row, "HLO op category"),
            "occurrences": int(val(row, "#Occurrences") or 0),
            "self_time_us": float(val(row, "Total self time (us)") or 0.0),
            "bound_by": val(row, "Bound by"),
            "gflops_per_s": float(val(row, "Model GFLOP/s") or 0.0),
            "hbm_gib_per_s": float(val(row, "HBM BW (GiB/s)") or 0.0),
        })
    ops.sort(key=lambda o: -o["self_time_us"])
    by_category = defaultdict(float)
    for o in ops:
        by_category[o["category"]] += o["self_time_us"]
    total = sum(by_category.values())
    return {
        "total_device_time_us": total,
        "by_category_us": dict(sorted(by_category.items(), key=lambda kv: -kv[1])),
        "top_ops": ops[:top],
    }
