"""Benchmark suite: the BASELINE.md workloads on one TPU chip.

Headline metric (top-level keys, driver schema): wall-clock for one full
objective evaluation (misfit + gradient w.r.t. source parameters) over
64 stations x 3 components at the loc/CMT configuration (61-sample traces,
79x61 fingerprint grids, lambda=0.04, W2 marginals), vs the measured
single-core reference timing (bench_baseline.json, captured from the actual
reference library: per-trace Python loops over waveformFP +
calcpdf(deriv=True) + MargWasserstein + PDFderiv chain — 3.059 s/call on
this host's CPU).

"extra" metrics in the same JSON line:
  * ricker objective 80x512 — the Ricker_Figs_3_8 misfit+grad
    (reference optfunc: 1.854 s/call measured single-core);
  * 1024x3 scaling point — the same batched objective at 3072 traces
    (baseline scaled from the per-trace reference cost);
  * f32 deviation — relative value/gradient deviation of the f32 pipeline
    vs a float64 CPU oracle run of the same flagship problem (SURVEY.md
    section 7 hard part #2).

Prints ONE json line:
  {"metric", "value", "unit", "vs_baseline", "extra": [...]}.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np

_F64_ORACLE_NR = 16  # stations for the f32-vs-f64 check (48 traces, CPU f64)

_F64_ORACLE_CODE = r"""
import json, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from __graft_entry__ import _build_problem
from waveform_ot_tpu.inversion import InvOptions, loc_cmt_value_and_grad
loc, cfg, prob = _build_problem(nr={nr}, impl="jnp", dtype=jnp.float64)
opts = InvOptions(loc=True, cmt=False, mistype="OT")
m = loc + jnp.asarray([4.0, -3.0, 2.0], jnp.float64)
v, g = loc_cmt_value_and_grad(m, prob, opts, cfg, impl="jnp")
print(json.dumps({{"v": float(v), "g": [float(x) for x in g]}}))
"""


def _time(fn, args, n_iter: int) -> float:
    import jax

    out = fn(*args)
    jax.block_until_ready(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter


def bench_loc_cmt(nr: int, impl: str, n_iter: int):
    import jax
    import jax.numpy as jnp

    from waveform_ot_tpu.inversion import InvOptions, loc_cmt_value_and_grad

    from __graft_entry__ import _build_problem

    loc, cfg, prob = _build_problem(nr=nr, impl=impl, dtype=jnp.float32)
    opts = InvOptions(loc=True, cmt=False, mistype="OT")
    m = loc + jnp.asarray([4.0, -3.0, 2.0], jnp.float32)
    fn = jax.jit(lambda mm, pp: loc_cmt_value_and_grad(mm, pp, opts, cfg,
                                                       impl=impl))
    per_call = _time(fn, (m, prob), n_iter)
    v, g = fn(m, prob)
    assert np.isfinite(float(v)) and np.all(np.isfinite(np.asarray(g)))
    return per_call, float(v), np.asarray(g)


def bench_ricker(impl: str, n_iter: int) -> float:
    """The Ricker_Figs_3_8 objective: 80x512 grid, 512-sample waveform,
    lambda=0.03, alpha=0.5 — reference ricker_util.optfunc."""
    import jax
    import jax.numpy as jnp

    from waveform_ot_tpu.inversion import (
        TraceConfig, build_target, make_ricker_problem,
        ricker_value_and_grad,
    )
    from waveform_ot_tpu.inversion.pipeline import grid6_to_window
    from waveform_ot_tpu.models import ricker_wavelet

    trange = (-2.0, 7.0)
    tobs, wobs = ricker_wavelet(0.0, 1.6, 1.0, trange=trange)
    tobs, wobs = tobs.astype(jnp.float32), wobs.astype(jnp.float32)
    rng = np.random.default_rng(42)
    wobs = wobs + 0.005 * float(jnp.max(jnp.abs(wobs))) * jnp.asarray(
        rng.standard_normal(wobs.shape), jnp.float32)
    grid6 = (-2.0, 7.0, -2.0, 2.6, 80, 512)
    win, _ = grid6_to_window(grid6)
    cfg = TraceConfig(nu=80, ntg=512, lambdav=0.03, q=None, p=2,
                      transform=True)
    targets = build_target(tobs, wobs, win, cfg, impl=impl)
    prob, _ = make_ricker_problem(targets, grid6, trange=trange, alpha=0.5,
                                  lambdav=0.03)
    m = jnp.array([0.7, 1.1, 1.3], jnp.float32)
    fn = jax.jit(lambda mm: ricker_value_and_grad(mm, prob, cfg, impl=impl))
    per_call = _time(fn, (m,), n_iter)
    v, g = fn(m)
    assert np.isfinite(float(v)) and np.all(np.isfinite(np.asarray(g)))
    return per_call


def f32_deviation(impl: str):
    """Relative value/grad deviation of the f32 pipeline vs a float64 CPU
    oracle of the identical problem (fresh subprocess: x64 must be enabled
    before backend init and must not contaminate the f32 run)."""
    _, v32, g32 = bench_loc_cmt(_F64_ORACLE_NR, impl, n_iter=1)
    code = _F64_ORACLE_CODE.format(repo=str(Path(__file__).parent),
                                   nr=_F64_ORACLE_NR)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1200)
    ref = json.loads(out.stdout.strip().splitlines()[-1])
    v64, g64 = ref["v"], np.asarray(ref["g"])
    dv = abs(v32 - v64) / abs(v64)
    dg = float(np.max(np.abs(g32 - g64)) / np.max(np.abs(g64)))
    return dv, dg


def main() -> None:
    import jax

    on_tpu = jax.default_backend() == "tpu"
    impl = "auto" if on_tpu else "jnp"
    baseline = json.loads(
        (Path(__file__).parent / "bench_baseline.json").read_text())
    ref_batch = baseline["ref_batch_64x3_s"]
    ref_ricker = baseline["ref_ricker_objective_s"]
    ref_per_trace = ref_batch / 192.0

    n64, nr_ricker, n1024 = (50, 20, 10) if on_tpu else (5, 2, 1)

    per_64, _, _ = bench_loc_cmt(64, impl, n64)
    per_ricker = bench_ricker(impl, nr_ricker)
    per_1024, _, _ = bench_loc_cmt(1024, impl, n1024)
    dv, dg = f32_deviation(impl)

    extra = [
        {"metric": "ricker objective 80x512 misfit+grad",
         "value": round(per_ricker * 1e3, 4), "unit": "ms",
         "vs_baseline": round(ref_ricker / per_ricker, 2)},
        {"metric": "batched W2 misfit+grad, 1024 stations x 3 comps",
         "value": round(per_1024 * 1e3, 4), "unit": "ms",
         "vs_baseline": round(ref_per_trace * 3072 / per_1024, 2)},
        {"metric": "throughput at 1024x3",
         "value": round(3072 / per_1024), "unit": "traces/s",
         "vs_baseline": round((3072 / per_1024) / (1.0 / ref_per_trace), 2)},
        {"metric": "f32 vs f64 relative deviation (value)",
         "value": float(f"{dv:.3e}"), "unit": "rel", "vs_baseline": None},
        {"metric": "f32 vs f64 relative deviation (grad, max)",
         "value": float(f"{dg:.3e}"), "unit": "rel", "vs_baseline": None},
    ]
    print(json.dumps({
        "metric": "batched W2 misfit+grad, 64 stations x 3 comps",
        "value": round(per_64 * 1e3, 4),
        "unit": "ms",
        "vs_baseline": round(ref_batch / per_64, 2),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
