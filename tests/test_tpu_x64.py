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
import time

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


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_template(template: str, platform_setup: str, env,
                  timeout: float = 1800) -> dict:
    code = template.format(repo=_repo_root(), platform_setup=platform_setup)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=timeout)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def _tpu_env() -> dict:
    return {k: v for k, v in os.environ.items()
            if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}


_PROBE = r"""
import json, sys
sys.path.insert(0, {repo!r})
import jax
{platform_setup}
print(json.dumps({{"backend": jax.default_backend()}}))
"""

_tpu_probe_result: list = []  # memoized once per session


def _tpu_reachable() -> bool:
    """One cheap backend-init probe per session. If this says the TPU is
    reachable, later subprocess errors FAIL the spot checks instead of
    skipping them (a cold compile-cache timeout must not report green
    without the TPU ever having been checked)."""
    if not _tpu_probe_result:
        try:
            r = _run_template(_PROBE, "", _tpu_env(), timeout=300)
            _tpu_probe_result.append(r["backend"] == "tpu")
        except (RuntimeError, subprocess.TimeoutExpired):
            _tpu_probe_result.append(False)
    return _tpu_probe_result[0]


# ---------------------------------------------------------------------------
# Concurrent one-shot TPU runner.
#
# The spot-check programs each remote-compile on the axon tunnel, which on a
# slow day takes many minutes per program — a flat per-test timeout fails
# honest tests on cold-cache days (both r3 suite failures were exactly
# this). All TPU templates are therefore launched CONCURRENTLY on first
# access (the tunnel multiplexes processes; verified empirically) under ONE
# shared session budget, their compiles landing in the shared persistent
# cache (/tmp/wot_jax_cache). A template that fails concurrently gets one
# sequential retry against the now-warm cache, so a transient contention
# error cannot mask — and a genuine numerical mismatch still fails the
# asserting test.
# ---------------------------------------------------------------------------

_TPU_SESSION_BUDGET_S = float(os.environ.get("WOT_TPU_SPOT_BUDGET_S", 2700))
_tpu_results: dict = {}  # template name -> parsed dict | Exception


def _all_templates() -> dict:
    return {"pipeline": _PIPELINE, "loc": _LOC_PIPELINE,
            "pallas": _PALLAS_EQ, "layered": _LAYERED,
            "mesh": _TPU_MESH_SMOKE}


def _prime_tpu_results() -> None:
    t0 = time.monotonic()
    procs = {}
    for name, tpl in _all_templates().items():
        code = tpl.format(repo=_repo_root(), platform_setup="")
        procs[name] = subprocess.Popen(
            [sys.executable, "-c", code], env=_tpu_env(),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    deadline = t0 + _TPU_SESSION_BUDGET_S
    for name, p in procs.items():
        try:
            out, err = p.communicate(
                timeout=max(30.0, deadline - time.monotonic()))
            if p.returncode != 0:
                raise RuntimeError(err[-2000:])
            _tpu_results[name] = json.loads(out.strip().splitlines()[-1])
        except (RuntimeError, subprocess.TimeoutExpired,
                json.JSONDecodeError, IndexError) as e:
            if isinstance(e, subprocess.TimeoutExpired):
                p.kill()
                p.communicate()
            # one sequential retry against the (partially) warm cache
            try:
                _tpu_results[name] = _run_template(
                    _all_templates()[name], "", _tpu_env(),
                    timeout=max(60.0, deadline - time.monotonic()))
            except (RuntimeError, subprocess.TimeoutExpired,
                    json.JSONDecodeError) as e2:
                _tpu_results[name] = RuntimeError(
                    f"concurrent run failed ({type(e).__name__}: "
                    f"{str(e)[:800]}); warm-cache retry failed "
                    f"({type(e2).__name__}: {str(e2)[:800]})")
    print(f"\n[tpu spot checks] priming time "
          f"{time.monotonic() - t0:.1f}s for {len(procs)} concurrent "
          f"programs (budget {_TPU_SESSION_BUDGET_S:.0f}s)",
          file=sys.stderr, flush=True)


def _run_on_tpu(template: str) -> dict:
    """Result of ``template`` on the TPU backend. Skips only when the
    session-start probe found no TPU; any error after a successful probe is
    a test FAILURE. First access launches ALL spot-check programs
    concurrently (see module note) and memoizes their results."""
    if not _tpu_reachable():
        pytest.skip("no TPU reachable in this environment")
    if not _tpu_results:
        _prime_tpu_results()
    name = next(n for n, t in _all_templates().items() if t is template)
    res = _tpu_results[name]
    if isinstance(res, Exception):
        pytest.fail(f"TPU was reachable at session start but the spot-check "
                    f"subprocess failed: {res}")
    if res["backend"] != "tpu":
        pytest.fail(f"TPU probe saw a TPU but the spot-check subprocess ran "
                    f"on {res['backend']!r}")
    return res


def _spot_check(template: str):
    """Run ``template`` on the TPU platform and on CPU, both in fresh x64
    subprocesses. Returns (tpu_result, cpu_result)."""
    tpu = _run_on_tpu(template)
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


_PALLAS_EQ = r"""
import json, sys
sys.path.insert(0, {repo!r})
import jax
{platform_setup}
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/wot_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
import numpy as np
import jax.numpy as jnp
from waveform_ot_tpu.ops.fingerprint import (
    FingerprintSpec, distance_field, fingerprint_density, make_window,
    normalize_vertices, grid_axes)

# production-path dtype (f32) on the real chip: the claim under test is the
# compiled Pallas kernel vs the XLA-compiled jnp program, not interpret mode
t = jnp.asarray(np.linspace(0.0, 1.0, 256), jnp.float32)
rng = np.random.default_rng(7)
w = (2 * jnp.sin(t * 6 * np.pi) - 3 * jnp.cos((2 * t + 0.3) * 2 * np.pi)
     + jnp.asarray(0.05 * rng.standard_normal(t.shape), jnp.float32))
du = float(w.max() - w.min())
win = make_window(0.0, 1.0, float(w.min()) - 0.15 * du,
                  float(w.max()) + 0.15 * du, dtype=jnp.float32)
spec = FingerprintSpec(nu=80, ntg=256)
verts = normalize_vertices(t, w, win)
tg, ug = grid_axes(t, win, spec)

fj = jax.jit(lambda v: distance_field(v, tg, ug, impl="jnp"))(verts)
fpl = jax.jit(lambda v: distance_field(v, tg, ug, impl="pallas"))(verts)

dj, dp = np.asarray(fj.d), np.asarray(fpl.d)
ij, ip = np.asarray(fj.iclose), np.asarray(fpl.iclose)
lj, lp = np.asarray(fj.lam), np.asarray(fpl.lam)
dscale = max(1e-30, float(np.abs(dj).max()))
mism = ij != ip
# at winner mismatches, the two programs' distances must be an exact
# geometric tie at f32 resolution (the fuzzing-established invariant)
tie_gap = float(np.abs(dj[mism] - dp[mism]).max()) if mism.any() else 0.0

def gfun(impl):
    def f(ww):
        pdf, _ = fingerprint_density(t, ww, win, spec, lambdav=0.04,
                                     impl=impl)
        return jnp.sum(pdf * pdf)
    return np.asarray(jax.jit(jax.grad(f))(w))

gj, gp = gfun("jnp"), gfun("pallas")
gscale = max(1e-30, float(np.abs(gj).max()))
print(json.dumps({{
    "backend": jax.default_backend(),
    "max_dd_rel": float(np.abs(dj - dp).max()) / dscale,
    "n_iclose_mismatch": int(mism.sum()),
    "n_grid": int(dj.size),
    "tie_gap_rel": tie_gap / dscale,
    "max_dlam_same_winner": float(np.abs((lj - lp)[~mism]).max()),
    "max_dgrad_rel": float(np.abs(gj - gp).max()) / gscale,
    "bitwise_d_equal": bool((dj == dp).all()),
}}))
"""


@pytest.mark.tpu_x64
def test_pallas_distance_on_tpu_matches_jnp():
    """The compiled Pallas kernel vs the XLA jnp program ON THE REAL CHIP
    (all other pallas==jnp equality tests run in interpret mode on the
    forced-CPU backend). Asserts the production claim of
    ops/pallas_distance.py:30-34: distances agree to ulp, winners differ
    only at exact geometric ties, and the envelope-VJP gradient matches."""
    res = _run_on_tpu(_PALLAS_EQ)
    # distances: ulp-level agreement between the two compiled programs
    assert res["max_dd_rel"] <= 5e-7, res
    # winner mismatches are allowed only at exact f32 geometric ties
    if res["n_iclose_mismatch"]:
        assert res["tie_gap_rel"] <= 5e-7, res
        # ties must be rare for a noisy waveform
        assert res["n_iclose_mismatch"] <= res["n_grid"] // 1000, res
    # lambda and the chained envelope-VJP gradient
    assert res["max_dlam_same_winner"] <= 1e-5, res
    assert res["max_dgrad_rel"] <= 1e-5, res


_LAYERED = r"""
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
from waveform_ot_tpu.models.layered import (
    layered_model_from_table, layered_seismograms)
from waveform_ot_tpu.models.seismo import StationSet, mxyz_from_upper

# TPU runs the f32 production path (all-dd32 stack — no f64/complex128 in
# the compiled program); the CPU side runs FLOAT64 inputs as the oracle.
# (The CPU-jit f32 path is NOT a valid reference: XLA CPU strips the
# ddfloat seal barriers, see CLAUDE.md.)
dtype = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64
model = layered_model_from_table([(3.0, 5.0, 2.9, 2.5),
                                  (0.0, 7.0, 4.0, 3.0)])
stations = StationSet(x=jnp.asarray([12.0, -7.0], dtype),
                      y=jnp.asarray([5.0, 16.0], dtype))
wts = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 16)),
                  dtype)

def obj(params):
    _, s = layered_seismograms(params[0], params[1], params[2],
                               mxyz_from_upper(params[3:]), stations,
                               model=model, nt=16, dt=1.0, nk=48, kmax=1.0)
    return jnp.sum(s * wts), s

params = jnp.asarray(np.concatenate([[2.0, -3.0, 4.0],
                                     [0.3, -0.5, 0.2, 0.7, -0.1, 0.4]]),
                     dtype)
(v, s), g = jax.jit(jax.value_and_grad(obj, has_aux=True))(params)
print(json.dumps({{"backend": jax.default_backend(), "v": float(v),
                   "g": [float(x) for x in g],
                   "s": [float(x) for x in np.asarray(s).ravel()],
                   "snorm": float(jnp.linalg.norm(s))}}))
"""


@pytest.mark.tpu_x64
def test_layered_forward_on_tpu_matches_cpu():
    """The layered f-k forward + gradient ON THE REAL CHIP (f32 all-dd32
    production path, tuple-sealed on TPU) vs the FLOAT64 CPU oracle of
    the same problem. Guards both TPU-executability (no f64 in the
    compiled program) and end-to-end accuracy of the sealed dd stack on
    hardware.

    Tolerances sit a ~4x margin above the MEASURED clean floor of THIS
    config (round 5, tuple seal: seismograms 7.1e-5 of peak — this
    small-signal config peaks at ~1.6e-5, so the f32 absolute floor is
    relatively larger than the production config's 2.9e-6 — value
    1.7e-6 of snorm, gradient 2.0e-3 max-relative, cosine 0.999998)
    and ~10-1000x BELOW the corruption signal (the unsealed program
    measures 4.3e-2 on seismograms / 7e-2 on gradients): a regression
    losing even part of the dd compensation fails loudly. The
    weighted-sum objective value nearly cancels, so it is compared on
    the seismogram scale, not its own."""
    tpu, cpu = _spot_check(_LAYERED)
    assert np.isfinite(tpu["v"]) and np.all(np.isfinite(tpu["g"]))
    s_tpu = np.asarray(tpu["s"])
    s_cpu = np.asarray(cpu["s"])
    speak = max(np.abs(s_cpu).max(), 1e-12)
    assert np.abs(s_tpu - s_cpu).max() <= 3e-4 * speak, (tpu, cpu)
    assert abs(tpu["v"] - cpu["v"]) <= 1e-4 * max(cpu["snorm"], 1e-12), \
        (tpu, cpu)
    gref = np.asarray(cpu["g"])
    gdev_arr = np.asarray(tpu["g"]) - gref
    assert np.abs(gdev_arr).max() <= 8e-3 * max(np.abs(gref).max(), 1e-12), \
        (tpu, cpu)
    cos = (np.asarray(tpu["g"]) @ gref /
           max(np.linalg.norm(tpu["g"]) * np.linalg.norm(gref), 1e-300))
    assert cos > 0.9995, (cos, tpu, cpu)


_TPU_MESH_SMOKE = r"""
import json, sys
sys.path.insert(0, {repo!r})
import jax
{platform_setup}
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/wot_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
import numpy as np
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P
from waveform_ot_tpu.inversion import InvOptions, loc_cmt_value_and_grad
from waveform_ot_tpu.ops import make_density_1d
from waveform_ot_tpu.parallel import (
    dp_sp_marg_misfit, grid_sharded_marg_misfit, make_mesh, make_mesh_2d,
    replicate, shard_grid_axis, shard_leading_axis)
from __graft_entry__ import _build_problem

out = {{"backend": jax.default_backend()}}
mesh = make_mesh(1)

# 1) data-parallel training step on a TPU mesh with the production
# (pallas) fingerprint impl — shard_map/GSPMD + Pallas on the TPU backend
loc, cfg, prob = _build_problem(nr=2, impl="auto", dtype=jnp.float32)
opts = InvOptions(loc=True, cmt=False, mistype="OT")
prob = prob._replace(targets=shard_leading_axis(prob.targets, mesh))
optimizer = optax.adam(1e-2)
m0 = replicate(loc + 3.0, mesh)
opt_state = optimizer.init(m0)

@jax.jit
def train_step(m, opt_state, prob):
    value, grad = loc_cmt_value_and_grad(m, prob, opts, cfg, impl="auto")
    updates, opt_state = optimizer.update(grad, opt_state)
    return optax.apply_updates(m, updates), opt_state, value

m1, opt_state, value = train_step(m0, opt_state, prob)
jax.block_until_ready((m1, value))
out["dp_value"] = float(value)
out["dp_finite"] = bool(np.isfinite(float(value))
                        and np.all(np.isfinite(np.asarray(m1))))

# 2) sequence-parallel grid misfit + grad through the collectives, with
# the Pallas kernel inside shard_map
nt, ntg, nu = 24, 64, 16
tw = jnp.linspace(0.0, 1.0, nt, dtype=jnp.float32)
wv = 0.5 + 0.2 * jnp.sin(4 * jnp.pi * tw)
verts = jnp.stack([tw, wv], axis=1)
tgrid = jnp.linspace(0.0, 1.0, ntg, dtype=jnp.float32)
ugrid = jnp.linspace(0.0, 1.0, nu, dtype=jnp.float32)
rng = np.random.default_rng(1)
tt = make_density_1d(jnp.asarray(rng.random(ntg) + 0.1, jnp.float32), tgrid)
tu = make_density_1d(jnp.asarray(rng.random(nu) + 0.1, jnp.float32), ugrid)
sp_fn = grid_sharded_marg_misfit(mesh, lambdav=0.04, q=None, p=2,
                                 impl="auto", axis_name="batch")
tg_sh = shard_grid_axis(tgrid, mesh, axis_name="batch")

def sp_obj(v, ts):
    wt, wu = sp_fn(v, tg_sh, ugrid, tt, tu, ts)
    return 0.5 * wt + 0.5 * wu

spv, (spgv, spgt) = jax.jit(jax.value_and_grad(sp_obj, argnums=(0, 1)))(
    verts, jnp.float32(0.0))
jax.block_until_ready((spv, spgv))
out["sp_value"] = float(spv)
out["sp_finite"] = bool(np.isfinite(float(spv))
                        and np.all(np.isfinite(np.asarray(spgv))))

# 3) composed dp x sp program on a 1x1 mesh
mesh2 = make_mesh_2d(1, 1)
ntr = 2
vb = (jnp.broadcast_to(verts, (ntr,) + verts.shape)
      + 0.01 * jnp.arange(ntr, dtype=jnp.float32)[:, None, None])
tt2 = jax.vmap(lambda k: make_density_1d(
    jnp.linspace(0.5, 1.5, ntg, dtype=jnp.float32) + 0.1 * k, tgrid))(
    jnp.arange(ntr, dtype=jnp.float32))
tu2 = jax.vmap(lambda k: make_density_1d(
    jnp.linspace(1.5, 0.5, nu, dtype=jnp.float32) + 0.1 * k, ugrid))(
    jnp.arange(ntr, dtype=jnp.float32))
bput = lambda a: jax.device_put(a, NamedSharding(mesh2, P("batch")))
fn2 = dp_sp_marg_misfit(mesh2, lambdav=0.04, q=None, p=2, alpha=0.5,
                        impl="auto")
tg2_sh = jax.device_put(tgrid, NamedSharding(mesh2, P("seq")))
v2, g2 = jax.jit(jax.value_and_grad(fn2))(
    bput(vb), tg2_sh, ugrid,
    jax.tree_util.tree_map(bput, tt2), jax.tree_util.tree_map(bput, tu2),
    bput(jnp.zeros((ntr,), jnp.float32)))
jax.block_until_ready((v2, g2))
out["dpsp_value"] = float(v2)
out["dpsp_finite"] = bool(np.isfinite(float(v2))
                          and np.all(np.isfinite(np.asarray(g2))))

# 4) LAYERED station-sharded value+grad lowered for the REAL TPU backend:
# GSPMD + the sealed all-dd32 Fukuoka stack + the station-DYNAMIC forward
# + the production (pallas) fingerprint impl in one program — the
# composition the virtual-CPU tests cannot certify (they run impl='jnp'
# with CPU-mode seals).
from waveform_ot_tpu.inversion import TraceConfig, build_loc_cmt_problem
from waveform_ot_tpu.inversion.loc_cmt import loc_cmt_misfit
from waveform_ot_tpu.models import (
    StationSet, make_layered_forward, moment_tensor_from_sdr)
from waveform_ot_tpu.models.layered import fukuoka_model

nrl, ntl, nkl = 2, 16, 24
angl = np.linspace(0, 2 * np.pi, nrl, endpoint=False)
lstations = StationSet(x=jnp.asarray(30.0 * np.cos(angl), jnp.float32),
                       y=jnp.asarray(30.0 * np.sin(angl), jnp.float32))
lmxyz = moment_tensor_from_sdr(30.0, 60.0, 45.0, m0=5.0e6).astype(
    jnp.float32)
lfwd = make_layered_forward(model=fukuoka_model(jnp.float32), nt=ntl,
                            dt=1.0, nk=nkl, kmax=1.0)
lloc = jnp.asarray([2.0, -1.5, 9.0], jnp.float32)
ls = jax.jit(lfwd)(lloc[0], lloc[1], lloc[2], lmxyz, lstations)
lobs = ls + 0.002 * float(jnp.max(jnp.abs(ls))) * jnp.asarray(
    np.random.default_rng(0).standard_normal(ls.shape), jnp.float32)
lcfg = TraceConfig(nu=15, ntg=ntl, lambdav=0.04, q=None, p=2)
lprob = build_loc_cmt_problem(jnp.arange(ntl, dtype=jnp.float32), lobs,
                              lstations, lcfg, mxyz_fixed=lmxyz,
                              impl="auto")
lprob = shard_leading_axis(lprob, mesh)

def lobj(m, prob):
    fwd = lambda x, y, z, mx: lfwd(x, y, z, mx, prob.stations)
    return loc_cmt_misfit(m, prob, opts, lcfg, forward=fwd, impl="auto")

lv, lg = jax.jit(jax.value_and_grad(lobj))(
    replicate(lloc + jnp.asarray([1.0, -0.5, 0.5], jnp.float32), mesh),
    lprob)
jax.block_until_ready((lv, lg))
out["layered_value"] = float(lv)
out["layered_finite"] = bool(np.isfinite(float(lv))
                             and np.all(np.isfinite(np.asarray(lg))))
print(json.dumps(out))
"""


@pytest.mark.tpu_x64
def test_sharded_programs_compile_on_tpu_mesh():
    """shard_map + custom-VJP solver + Pallas kernel lowered for the REAL
    TPU backend on a one-device mesh (all other sharding validation runs on
    virtual CPU devices with impl='jnp'): the DP training step, the
    sequence-parallel grid program, the composed dp x sp program, and the
    LAYERED station-sharded objective (GSPMD + sealed dd stack +
    station-dynamic Fukuoka forward + Pallas fingerprints lowered
    together for the chip)."""
    res = _run_on_tpu(_TPU_MESH_SMOKE)
    assert res["dp_finite"], res
    assert res["sp_finite"], res
    assert res["dpsp_finite"], res
    assert res["layered_finite"], res


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
