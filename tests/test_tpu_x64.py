"""TPU x64 spot check (SURVEY.md section 7 hard part #2).

The parity suite runs on CPU x64 (conftest). This test additionally runs
the Ricker misfit+gradient pipeline in float64 ON THE TPU in a fresh
subprocess (the conftest's forced-CPU env must not leak in) and checks it
against the in-process CPU x64 result. Skipped when no TPU is reachable.

Measured once at authoring time: TPU x64 and CPU x64 agree to ~1e-12
relative on both value and gradient for this configuration; the assert
uses 1e-10. The f32 production-path deviation is measured separately by
bench.py (see BASELINE.md).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

_PIPELINE = r"""
import json, sys
sys.path.insert(0, {repo!r})
import jax
{platform_setup}
jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/wot_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
import numpy as np
import jax.numpy as jnp
from waveform_ot_tpu.inversion import (
    TraceConfig, build_target, make_ricker_problem, ricker_value_and_grad)
from waveform_ot_tpu.inversion.pipeline import grid6_to_window
from waveform_ot_tpu.models import ricker_wavelet

trange = (-2.0, 7.0)
tobs, wobs = ricker_wavelet(0.0, 1.6, 1.0, trange=trange)
rng = np.random.default_rng(42)
wobs = wobs + 0.005 * float(jnp.max(jnp.abs(wobs))) * jnp.asarray(
    rng.standard_normal(wobs.shape), wobs.dtype)
grid6 = (-2.0, 7.0, -2.0, 2.6, 24, 96)
win, _ = grid6_to_window(grid6)
cfg = TraceConfig(nu=24, ntg=96, lambdav=0.03, q=None, p=2, transform=True)
targets = build_target(tobs, wobs, win, cfg, impl="jnp")
prob, _ = make_ricker_problem(targets, grid6, trange=trange, alpha=0.5,
                              lambdav=0.03)
m = jnp.array([0.7, 1.1, 1.3], jnp.float64)
v, g = jax.jit(lambda mm: ricker_value_and_grad(mm, prob, cfg, impl="jnp"))(m)
print(json.dumps({{"backend": jax.default_backend(), "v": float(v),
                   "g": [float(x) for x in g]}}))
"""


def _run_template(template: str, platform_setup: str, env) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = template.format(repo=repo, platform_setup=platform_setup)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=900)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def _spot_check(template: str):
    """Run ``template`` on the default (TPU) platform and on CPU, both in
    fresh x64 subprocesses; skip when no TPU is reachable. Returns
    (tpu_result, cpu_result)."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    try:
        tpu = _run_template(template, "", env)
    except (RuntimeError, subprocess.TimeoutExpired) as e:
        pytest.skip(f"TPU backend unavailable for x64 spot check: {e}")
    if tpu["backend"] != "tpu":
        pytest.skip(f"no TPU in this environment (got {tpu['backend']})")
    cpu = _run_template(template,
                        'jax.config.update("jax_platforms", "cpu")',
                        dict(os.environ))
    assert cpu["backend"] == "cpu"
    return tpu, cpu


@pytest.mark.tpu_x64
def test_ricker_pipeline_x64_on_tpu_matches_cpu():
    tpu, cpu = _spot_check(_PIPELINE)
    assert abs(tpu["v"] - cpu["v"]) <= 1e-10 * max(1.0, abs(cpu["v"]))
    np.testing.assert_allclose(np.asarray(tpu["g"]), np.asarray(cpu["g"]),
                               rtol=0, atol=1e-10)


_LOC_PIPELINE = r"""
import json, sys
sys.path.insert(0, {repo!r})
import jax
{platform_setup}
jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/wot_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
import jax.numpy as jnp
from __graft_entry__ import _build_problem
from waveform_ot_tpu.inversion import InvOptions, loc_cmt_value_and_grad

loc, cfg, prob = _build_problem(nr=6, impl="jnp", dtype=jnp.float64)
opts = InvOptions(loc=True, cmt=False, mistype="OT")
m = loc + jnp.asarray([4.0, -3.0, 2.0], jnp.float64)
v, g = jax.jit(lambda mm: loc_cmt_value_and_grad(
    mm, prob, opts, cfg, impl="jnp"))(m)
print(json.dumps({{"backend": jax.default_backend(), "v": float(v),
                   "g": [float(x) for x in g]}}))
"""


@pytest.mark.tpu_x64
def test_loc_cmt_pipeline_x64_on_tpu_matches_cpu():
    # the flagship batched objective (6 stations x 3 comps)
    tpu, cpu = _spot_check(_LOC_PIPELINE)
    # measured: ~3e-8 relative on the value — the batched pipeline has
    # deeper reduction trees than the Ricker path and TPU/CPU x64 sum in
    # different orders; still 100x tighter than the f32 deviation
    assert abs(tpu["v"] - cpu["v"]) <= 1e-7 * abs(cpu["v"]) + 1e-12
    np.testing.assert_allclose(np.asarray(tpu["g"]), np.asarray(cpu["g"]),
                               rtol=1e-6, atol=1e-10)
