"""Profiling and timing utilities.

The reference instruments with ad-hoc ``time.time()`` deltas stored on
objects (tcalc_fp/tcalc_pdf, FingerprintLib.py:169-177; twf/tpdf builder
timings — SURVEY.md section 5). The rebuild provides:

  * :func:`benchmark` — steady-state wall-clock of a jitted callable
    (compile excluded, `block_until_ready` bracketed);
  * :func:`top_device_ops` — capture a jax.profiler trace of one call and
    return the most expensive device ops (the tool that located this
    library's gather/scatter hotspots; see ops/fingerprint.py).
"""

from __future__ import annotations

import glob
import tempfile
import time
from typing import Callable

import jax


def benchmark(fn: Callable, *args, n_iter: int = 50, warmup: int = 2):
    """Mean wall-clock seconds per call, post-compilation."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter


def top_device_ops(fn: Callable, *args, top: int = 20, trace_dir=None):
    """Run ``fn(*args)`` once under the JAX profiler; return
    [(total_ms, op_name)] sorted by device time, descending."""
    out = fn(*args)  # ensure compiled
    jax.block_until_ready(out)
    td = trace_dir or tempfile.mkdtemp(prefix="wot_trace_")
    jax.profiler.start_trace(td)
    out = fn(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    from jax.profiler import ProfileData

    files = glob.glob(str(td) + "/**/*.xplane.pb", recursive=True)
    pd = ProfileData.from_file(files[-1])
    totals: dict[str, int] = {}
    for plane in pd.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                totals[ev.name] = totals.get(ev.name, 0) + ev.duration_ns
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    return [(ns / 1e6, name) for name, ns in ranked]


class StageTimer:
    """Named stage timings as an explicit returned record (replaces the
    reference's object-mutation timing pattern)."""

    def __init__(self):
        self.stages: dict[str, float] = {}
        self._t0 = None
        self._name = None

    def start(self, name: str):
        self._name = name
        self._t0 = time.perf_counter()
        return self

    def stop(self):
        if self._name is not None:
            self.stages[self._name] = (
                self.stages.get(self._name, 0.0)
                + time.perf_counter() - self._t0)
            self._name = None
        return self.stages
