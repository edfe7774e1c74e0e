"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveform_ot_tpu.inversion import (
    InvOptions, TraceConfig, build_loc_cmt_problem, loc_cmt_misfit,
    loc_cmt_value_and_grad,
)
from waveform_ot_tpu.inversion.pipeline import trace_misfit
from waveform_ot_tpu.inversion.windows import (
    build_windows, unit_amplitude_windows,
)
from waveform_ot_tpu.models import (
    StationSet, moment_tensor_from_sdr, synthetic_seismograms,
)
from waveform_ot_tpu.ops.transforms import arctan_transform
from waveform_ot_tpu.parallel import (
    make_mesh, replicate, shard_leading_axis, sharded_sum,
)


@pytest.fixture(scope="module")
def batch_problem():
    nr, nt = 16, 61
    ang = np.linspace(0, 2 * np.pi, nr, endpoint=False)
    stations = StationSet(x=jnp.array(60.0 * np.cos(ang)),
                          y=jnp.array(60.0 * np.sin(ang)))
    loc = jnp.array([2.0, -1.5, 12.0])
    mxyz = moment_tensor_from_sdr(30.0, 60.0, 45.0, m0=5.0e6)
    t, s = synthetic_seismograms(loc[0], loc[1], loc[2], mxyz, stations,
                                 nt=nt, dt=1.0)
    rng = np.random.default_rng(0)
    obs = s + 0.002 * float(jnp.max(jnp.abs(s))) * jnp.array(
        rng.standard_normal(s.shape))
    cfg = TraceConfig(nu=79, ntg=nt, lambdav=0.04, q=None, p=2)
    prob = build_loc_cmt_problem(t, obs, stations, cfg, impl="jnp")
    return stations, loc, mxyz, obs, cfg, prob


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_sum_matches_local(batch_problem):
    stations, loc, mxyz, obs, cfg, prob = batch_problem
    nr, nc, nt = obs.shape
    mesh = make_mesh()
    un = arctan_transform(obs, prob.windows.u0[..., None],
                          prob.windows.u1[..., None])
    flat_w = un.reshape(nr * nc, nt)
    win01 = unit_amplitude_windows(prob.windows)
    flat_win = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (nr, nc)).reshape(nr * nc), win01)
    cfg_fp = dataclasses.replace(cfg, transform=False)

    def per_trace(item, t):
        w_, wn, tg = item
        wt, wu = trace_misfit(t, w_, wn, tg, cfg_fp, impl="jnp")
        return 0.5 * (wt + wu)

    batch = (flat_w, flat_win, prob.targets)
    local = float(sum(per_trace((flat_w[i],
                                 jax.tree_util.tree_map(lambda a: a[i],
                                                        flat_win),
                                 jax.tree_util.tree_map(lambda a: a[i],
                                                        prob.targets)),
                                prob.t) for i in range(nr * nc)))
    f = sharded_sum(per_trace, mesh)
    sharded = float(jax.jit(f)(shard_leading_axis(batch, mesh),
                               *replicate((prob.t,), mesh)))
    assert abs(local - sharded) < 1e-10 * max(1.0, abs(local))


def test_sharded_objective_value_and_grad(batch_problem):
    # the full loc/CMT objective under a sharded trace batch: value and
    # parameter gradient must match the single-device computation
    stations, loc, mxyz, obs, cfg, prob = batch_problem
    opts = InvOptions(loc=True, cmt=False, mistype="OT")
    prob2 = prob._replace(mxyz_fixed=mxyz)
    m = loc + jnp.array([4.0, -3.0, 2.0])

    v0, g0 = loc_cmt_value_and_grad(m, prob2, opts, cfg, impl="jnp")

    mesh = make_mesh()
    prob_sharded = prob2._replace(
        targets=shard_leading_axis(prob2.targets, mesh))
    fn = jax.jit(lambda mm, pp: loc_cmt_value_and_grad(mm, pp, opts, cfg,
                                                       impl="jnp"))
    v1, g1 = fn(replicate(m, mesh), prob_sharded)
    assert abs(float(v0) - float(v1)) < 1e-10 * max(1.0, abs(float(v0)))
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-8)


def test_sharded_misfit_grid_matches_vmap():
    # the multi-chip grid scan (model nodes sharded over the mesh, zero
    # collectives) must reproduce the single-device vmapped scan exactly.
    # Deliberately tiny problem: this compiles two grid-scan programs.
    from waveform_ot_tpu.inversion.loc_cmt import (
        misfit_grid, misfit_grid_sharded,
    )

    nr, nt = 2, 31
    ang = np.linspace(0, 2 * np.pi, nr, endpoint=False)
    stations = StationSet(x=jnp.array(60.0 * np.cos(ang)),
                          y=jnp.array(60.0 * np.sin(ang)))
    loc = jnp.array([2.0, -1.5, 12.0])
    mxyz = moment_tensor_from_sdr(30.0, 60.0, 45.0, m0=5.0e6)
    t, s = synthetic_seismograms(loc[0], loc[1], loc[2], mxyz, stations,
                                 nt=nt, dt=2.0)
    rng = np.random.default_rng(0)
    obs = s + 0.002 * float(jnp.max(jnp.abs(s))) * jnp.array(
        rng.standard_normal(s.shape))
    cfg = TraceConfig(nu=16, ntg=nt, lambdav=0.04, q=None, p=2)
    prob = build_loc_cmt_problem(t, obs, stations, cfg, mxyz_fixed=mxyz,
                                 impl="jnp")
    opts = InvOptions(loc=True, cmt=False, mistype="OT")
    ms = jnp.asarray(loc + 5.0 * rng.standard_normal((8, 3)))

    ref = misfit_grid(ms, prob, opts, cfg, impl="jnp")

    mesh = make_mesh()
    ms_sh = shard_leading_axis(ms, mesh)
    prob_repl = replicate(prob, mesh)
    vals = jax.jit(lambda m_, p_: misfit_grid_sharded(
        m_, p_, opts, cfg, mesh, impl="jnp"))(ms_sh, prob_repl)
    # outputs stay sharded over the node axis across all 8 devices
    assert len(vals.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref),
                               rtol=1e-12)


class TestGridSharded:
    """Sequence-parallel fingerprint (parallel/grid_shard.py): the grid's
    time axis sharded over the 8-device CPU mesh must reproduce the
    single-device pipeline exactly — values and gradients."""

    def _problem(self, rng, ntg=128, nu=24, nt=40):
        from waveform_ot_tpu.ops import make_density_1d

        t = jnp.linspace(0.0, 1.0, nt)
        w = 0.4 + 0.2 * jnp.sin(4 * np.pi * t) + 0.02 * jnp.asarray(
            rng.standard_normal(nt))
        verts = jnp.stack([t, w], axis=1)
        tgrid = jnp.linspace(0.0, 1.0, ntg)
        ugrid = jnp.linspace(0.0, 1.0, nu)
        tt = rng.random(ntg) + 0.1
        uu = rng.random(nu) + 0.1
        target_t = make_density_1d(jnp.asarray(tt), tgrid)
        target_u = make_density_1d(jnp.asarray(uu), ugrid)
        return verts, tgrid, ugrid, target_t, target_u

    def test_value_matches_single_device(self, rng):
        from waveform_ot_tpu.ops.marginal import marg_wasserstein_value
        from waveform_ot_tpu.parallel import (
            grid_sharded_marg_misfit, make_mesh, shard_grid_axis,
        )
        from waveform_ot_tpu.ops.fingerprint import (
            density_from_distance, distance_field_diff,
        )

        verts, tgrid, ugrid, target_t, target_u = self._problem(rng)
        mesh = make_mesh(axis_name="seq")

        u2d = density_from_distance(
            distance_field_diff(verts, tgrid, ugrid, "jnp"), 0.04, q=None)
        wt_ref, wu_ref = marg_wasserstein_value(u2d, tgrid, ugrid,
                                                target_t, target_u, p=2)

        fn = grid_sharded_marg_misfit(mesh, lambdav=0.04, q=None, p=2,
                                      impl="jnp")
        tg_sh = shard_grid_axis(tgrid, mesh)
        wt, wu = jax.jit(fn)(verts, tg_sh, ugrid, target_t, target_u,
                             jnp.asarray(0.0))
        np.testing.assert_allclose(float(wt), float(wt_ref), rtol=1e-12)
        np.testing.assert_allclose(float(wu), float(wu_ref), rtol=1e-12)

    def test_gradients_match_single_device(self, rng):
        from waveform_ot_tpu.ops.marginal import marg_wasserstein_value
        from waveform_ot_tpu.parallel import (
            grid_sharded_marg_misfit, make_mesh, shard_grid_axis,
        )
        from waveform_ot_tpu.ops.fingerprint import (
            density_from_distance, distance_field_diff,
        )

        verts, tgrid, ugrid, target_t, target_u = self._problem(rng)
        mesh = make_mesh(axis_name="seq")

        def ref_obj(v, ts):
            u2d = density_from_distance(
                distance_field_diff(v, tgrid, ugrid, "jnp"), 0.04, q=None)
            wt, wu = marg_wasserstein_value(u2d, tgrid, ugrid, target_t,
                                            target_u, p=2, tshift=ts)
            return 0.5 * wt + 0.5 * wu

        fn = grid_sharded_marg_misfit(mesh, lambdav=0.04, q=None, p=2,
                                      impl="jnp")
        tg_sh = shard_grid_axis(tgrid, mesh)

        def sh_obj(v, ts):
            wt, wu = fn(v, tg_sh, ugrid, target_t, target_u, ts)
            return 0.5 * wt + 0.5 * wu

        ts0 = jnp.asarray(0.0)
        gv_ref, gt_ref = jax.grad(ref_obj, argnums=(0, 1))(verts, ts0)
        gv, gt = jax.jit(jax.grad(sh_obj, argnums=(0, 1)))(verts, ts0)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_ref),
                                   rtol=1e-11, atol=1e-14)
        np.testing.assert_allclose(float(gt), float(gt_ref), rtol=1e-11)

    def test_sharded_density_layout(self, rng):
        from waveform_ot_tpu.parallel import (
            grid_sharded_density, make_mesh, shard_grid_axis,
        )
        from waveform_ot_tpu.ops.fingerprint import (
            density_from_distance, distance_field_diff,
        )

        verts, tgrid, ugrid, _, _ = self._problem(rng)
        mesh = make_mesh(axis_name="seq")
        fn = grid_sharded_density(mesh, lambdav=0.04, q=None, impl="jnp")
        pdf = jax.jit(fn)(verts, shard_grid_axis(tgrid, mesh), ugrid)
        assert pdf.shape == (ugrid.shape[0], tgrid.shape[0])
        assert len(pdf.sharding.device_set) == 8  # stays distributed
        ref = density_from_distance(
            distance_field_diff(verts, tgrid, ugrid, "jnp"), 0.04, q=None)
        np.testing.assert_allclose(np.asarray(pdf), np.asarray(ref),
                                   rtol=1e-14)


class TestDpSp2DMesh:
    """Composed 2-D mesh: traces over 'batch' x grid columns over 'seq'
    in one program (parallel.dp_sp_marg_misfit) — exact parity with the
    single-device batched pipeline on a (2, 4) virtual mesh."""

    def test_value_and_grad_match_single_device(self, rng):
        from waveform_ot_tpu.ops import make_density_1d
        from waveform_ot_tpu.ops.fingerprint import (
            density_from_distance, distance_field_diff,
        )
        from waveform_ot_tpu.ops.marginal import marg_wasserstein_value
        from waveform_ot_tpu.parallel import (
            dp_sp_marg_misfit, make_mesh_2d, shard_grid_axis,
        )
        from jax.sharding import NamedSharding, PartitionSpec as P

        ntr, nt, ntg, nu = 6, 30, 64, 16
        t = jnp.linspace(0.0, 1.0, nt)
        w = 0.5 + 0.2 * jnp.sin(
            4 * np.pi * t)[None, :] * jnp.asarray(
            rng.uniform(0.5, 1.5, (ntr, 1)))
        w = w + 0.02 * jnp.asarray(rng.standard_normal((ntr, nt)))
        verts = jnp.stack([jnp.broadcast_to(t, (ntr, nt)), w], axis=-1)
        tgrid = jnp.linspace(0.0, 1.0, ntg)
        ugrid = jnp.linspace(0.0, 1.0, nu)
        tt = jnp.asarray(rng.random((ntr, ntg)) + 0.1)
        uu = jnp.asarray(rng.random((ntr, nu)) + 0.1)
        target_t = jax.vmap(lambda f: make_density_1d(f, tgrid))(tt)
        target_u = jax.vmap(lambda f: make_density_1d(f, ugrid))(uu)
        tshift = jnp.zeros((ntr,))

        def ref_total(verts_b, ts_b):
            def one(v, ft, fu, ts):
                u2d = density_from_distance(
                    distance_field_diff(v, tgrid, ugrid, "jnp"), 0.04,
                    q=None)
                wt, wu = marg_wasserstein_value(
                    u2d, tgrid, ugrid,
                    jax.tree_util.tree_map(lambda a: a, ft), fu, p=2,
                    tshift=ts)
                return 0.5 * wt + 0.5 * wu
            return jnp.sum(jax.vmap(one)(verts_b, target_t, target_u, ts_b))

        mesh = make_mesh_2d(2, 4)
        fn = dp_sp_marg_misfit(mesh, lambdav=0.04, q=None, p=2, alpha=0.5,
                               impl="jnp")
        tg_sh = shard_grid_axis(tgrid, mesh, axis_name="seq")
        vb = jax.device_put(verts, NamedSharding(mesh, P("batch")))
        tt_sh = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P("batch"))),
            target_t)
        tu_sh = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, NamedSharding(mesh, P("batch"))),
            target_u)

        v_ref = ref_total(verts, tshift)
        v_sh = jax.jit(fn)(vb, tg_sh, ugrid, tt_sh, tu_sh, tshift)
        np.testing.assert_allclose(float(v_sh), float(v_ref), rtol=1e-12)

        g_ref = jax.grad(ref_total)(verts, tshift)
        g_sh = jax.jit(jax.grad(
            lambda v, ts: fn(v, tg_sh, ugrid, tt_sh, tu_sh, ts)))(vb, tshift)
        np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                                   rtol=1e-11, atol=1e-14)


def test_sharded_multi_start_matches_single_device():
    """minimize_multi_start_sharded: starts sharded over the 8-device mesh
    reach the same endpoints as the single-device batched solver."""
    import jax
    import jax.numpy as jnp

    from waveform_ot_tpu.inversion import (
        minimize_lbfgs_batched, minimize_multi_start_sharded,
    )

    def rosen(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1 - x[:-1]) ** 2)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-2, 2, size=(16, 6)))
    mesh = make_mesh()
    rs = jax.jit(lambda xs: minimize_multi_start_sharded(
        rosen, xs, mesh, max_iter=400, tol=1e-8))(x0)
    rb = jax.jit(lambda xs: minimize_lbfgs_batched(
        rosen, xs, max_iter=400, tol=1e-8))(x0)
    assert rs.x.shape == (16, 6)
    # outputs stay sharded over the start axis
    assert len(rs.x.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(rs.x), np.asarray(rb.x),
                               atol=1e-6)
    assert float(jnp.max(rs.grad_norm)) < 1e-5


class TestLayeredSharded:
    """The flagship layered physics (models/layered.py) composed with the
    parallel paths: the station axis — and with it every per-trace leaf of
    the OT problem — sharded over the 8-device mesh. The station-DYNAMIC
    layered forward makes the receivers a traced, shardable argument while
    the station-independent stage A (interface scans) stays replicated by
    construction."""

    @staticmethod
    def _make_problem(dtype):
        """Station-sharded layered problem on the REAL six-layer Fukuoka
        stack (the production scan depth / interface recursion — not a
        toy), at reduced nt/nk so the CPU-mesh compile stays small."""
        from waveform_ot_tpu.models.layered import (
            fukuoka_model, make_layered_forward,
        )

        nr, nt, nk = 8, 16, 24
        model = fukuoka_model(dtype)
        ang = np.linspace(0, 2 * np.pi, nr, endpoint=False)
        stations = StationSet(
            x=jnp.asarray(30.0 * np.cos(ang), dtype),
            y=jnp.asarray(30.0 * np.sin(ang), dtype))
        mxyz = moment_tensor_from_sdr(30.0, 60.0, 45.0, m0=5.0e6).astype(
            dtype)
        fwd = make_layered_forward(model=model, nt=nt, dt=1.0, nk=nk,
                                   kmax=1.0)
        loc = jnp.asarray([2.0, -1.5, 9.0], dtype)  # inside layer 4
        s = jax.jit(fwd)(loc[0], loc[1], loc[2], mxyz, stations)
        rng = np.random.default_rng(0)
        obs = s + 0.002 * float(jnp.max(jnp.abs(s))) * jnp.asarray(
            rng.standard_normal(s.shape), dtype)
        t = jnp.arange(nt, dtype=dtype)
        cfg = TraceConfig(nu=15, ntg=nt, lambdav=0.04, q=None, p=2)
        prob = build_loc_cmt_problem(t, obs, stations, cfg,
                                     mxyz_fixed=mxyz, impl="jnp")
        opts = InvOptions(loc=True, cmt=False, mistype="OT")
        m = loc + jnp.asarray([1.0, -0.5, 0.5], dtype)
        return fwd, m, cfg, prob, opts

    @pytest.fixture(scope="class")
    def layered_problem(self):
        return self._make_problem(jnp.float32)

    @staticmethod
    def _objective(fwd, cfg, opts):
        def obj(m, prob):
            forward = lambda x, y, z, mx: fwd(x, y, z, mx, prob.stations)
            return loc_cmt_misfit(m, prob, opts, cfg, forward=forward,
                                  impl="jnp")
        return obj

    def test_station_sharded_value_and_grad(self, layered_problem):
        fwd, m, cfg, prob, opts = layered_problem
        obj = self._objective(fwd, cfg, opts)
        v0, g0 = jax.jit(jax.value_and_grad(obj))(m, prob)

        mesh = make_mesh(8)
        prob_sh = shard_leading_axis(prob, mesh)
        # the station/trace leaves really are distributed
        assert len(prob_sh.stations.x.sharding.device_set) == 8
        assert len(prob_sh.targets.t.pdf.sharding.device_set) == 8
        v1, g1 = jax.jit(jax.value_and_grad(obj))(replicate(m, mesh),
                                                  prob_sh)
        assert np.isfinite(float(v1))
        # f32 GSPMD repartitioning reassociates the trace/k reductions
        assert abs(float(v1) - float(v0)) <= 2e-5 * max(1.0, abs(float(v0)))
        # f32 SMOKE tolerance only: the two CPU-jit compilations
        # partition fusions differently, which perturbs the dd stack at
        # its CPU-compiled residue level (XLA CPU strips the ddfloat
        # seals' barriers — see CLAUDE.md; the z gradient rides the
        # stage-A dd JVP and measured 1.2% sharded-vs-single on the
        # six-layer Fukuoka stack; TPU compiles the seals bit-exactly).
        # The REAL sharded==single contract is pinned at 1e-9 by
        # test_station_sharded_f64_pins_contract below (full-f64 stack,
        # no dd in the program).
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=5e-2, atol=1e-7)

    def test_station_sharded_f64_pins_contract(self):
        """The sharded-layered gradient contract at FLOAT64 precision:
        f64 inputs select the full-f64 stack (no dd anywhere in the
        program — test_layered::test_f64_inputs_keep_full_f64_stack), so
        the CPU-jit dd residue that forces the f32 variant's 1e-2
        tolerance is absent and sharded == single-device can be pinned
        at 1e-9."""
        fwd, m, cfg, prob, opts = self._make_problem(jnp.float64)
        obj = self._objective(fwd, cfg, opts)
        v0, g0 = jax.jit(jax.value_and_grad(obj))(m, prob)

        mesh = make_mesh(8)
        prob_sh = shard_leading_axis(prob, mesh)
        assert len(prob_sh.stations.x.sharding.device_set) == 8
        v1, g1 = jax.jit(jax.value_and_grad(obj))(replicate(m, mesh),
                                                  prob_sh)
        assert abs(float(v1) - float(v0)) <= 1e-9 * max(1.0,
                                                        abs(float(v0)))
        gscale = max(float(np.abs(np.asarray(g0)).max()), 1e-300)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=0, atol=1e-9 * gscale)

    def test_station_gradient_flows_to_stations(self):
        # the dynamic-station form exposes receiver-position cotangents;
        # structured VJP must agree with plain AD through the same
        # program. A 2-layer toy, NOT the Fukuoka fixture: the contract
        # here is VJP-vs-AD equality (model-independent), and the plain-AD
        # reference reverse-differentiates the whole dd stack — on the
        # six-layer model that alone cost ~900 s of suite time.
        from waveform_ot_tpu.models.layered import (
            layered_model_from_table, make_layered_forward,
        )

        model = layered_model_from_table([(3.0, 5.0, 2.9, 2.5),
                                          (0.0, 7.0, 4.0, 3.0)])
        kwargs = dict(model=model, nt=12, dt=1.0, nk=16, kmax=1.0)
        fwd = make_layered_forward(**kwargs)
        fwd_ad = make_layered_forward(structured_vjp=False, **kwargs)
        m = jnp.asarray([2.0, -1.5, 4.0], jnp.float32)
        mxyz = moment_tensor_from_sdr(30.0, 60.0, 45.0, m0=5.0e6).astype(
            jnp.float32)
        ang = np.linspace(0, 2 * np.pi, 4, endpoint=False)
        stations = StationSet(
            x=jnp.asarray(30.0 * np.cos(ang), jnp.float32),
            y=jnp.asarray(30.0 * np.sin(ang), jnp.float32))

        def total(f):
            def g(st):
                return jnp.sum(f(m[0], m[1], m[2], mxyz, st) ** 2)
            return jax.grad(g)(stations)

        gs_vjp = total(fwd)
        gs_ad = total(fwd_ad)
        scale = max(float(np.abs(np.asarray(gs_ad.x)).max()), 1e-12)
        np.testing.assert_allclose(np.asarray(gs_vjp.x),
                                   np.asarray(gs_ad.x),
                                   rtol=0, atol=3e-5 * scale)
        np.testing.assert_allclose(np.asarray(gs_vjp.y),
                                   np.asarray(gs_ad.y),
                                   rtol=0, atol=3e-5 * scale)
