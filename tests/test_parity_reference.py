"""Live parity tests against the actual reference library (when mounted).

These go beyond the captured golden values: random problems generated per
run are fed to both implementations and compared at <=1e-8 (BASELINE.md).
Skipped automatically when /root/reference is unavailable.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from waveform_ot_tpu.ops import (
    make_density_1d, make_density_2d, marg_wasserstein, sliced_wasserstein,
    transport_plan_1d, wasserstein_1d,
)


@pytest.fixture()
def problems(rng):
    out = []
    for n in (7, 16, 33):
        f = rng.random(n) + 0.05
        g = rng.random(n) + 0.05
        x = np.sort(rng.random(n))
        y = np.sort(rng.random(n))
        out.append((f, x, g, y))
    return out


class TestWasserParity:
    def test_w_and_derivatives(self, reference_libs, problems):
        OT = reference_libs["OTlib"]
        for f, x, g, y in problems:
            src = OT.OTpdf((f, x))
            tgt = OT.OTpdf((g, y))
            W1r, dW1r, dW1tr, W2r, dW2r, dW2tr = OT.wasser(
                src, tgt, "W12", derivatives=True)
            for p, Wr, dWr, dWtr in ((1, W1r, dW1r, dW1tr),
                                     (2, W2r, dW2r, dW2tr)):
                W, (dW, dxf) = jax.value_and_grad(
                    wasserstein_1d, argnums=(0, 1))(
                        jnp.array(f), jnp.array(x), jnp.array(g),
                        jnp.array(y), p)
                assert abs(float(W) - Wr) <= 1e-10
                np.testing.assert_allclose(np.asarray(dW), dWr, atol=1e-10)
                assert abs(float(jnp.sum(dxf)) - dWtr) <= 1e-10

    def test_transport_plan(self, reference_libs, problems):
        OT = reference_libs["OTlib"]
        f, x, g, y = problems[0]
        src = OT.OTpdf((f, x))
        tgt = OT.OTpdf((g, y))
        out = OT.wasser(src, tgt, "W2", returnplan=True)
        Hr = out[-1]
        H = transport_plan_1d(jnp.array(f), jnp.array(x), jnp.array(g),
                              jnp.array(y))
        np.testing.assert_allclose(np.asarray(H), Hr, atol=1e-12)

    def test_transport_plan_jacobian(self, reference_libs, problems):
        # dH/df vs the reference's (n, n, n) DerivH assembly
        # (OTlib.py:730-740); the reference derivative path implicitly
        # assumes n_src == n_tgt, so equal-length problems only.
        from waveform_ot_tpu.ops import transport_plan_jacobian

        OT = reference_libs["OTlib"]
        for f, x, g, y in problems:
            out = OT.wasser(OT.OTpdf((f, x)), OT.OTpdf((g, y)), "W2",
                            derivatives=True, returnplan=True)
            dHr = out[-1]
            dH = transport_plan_jacobian(jnp.array(f), jnp.array(x),
                                         jnp.array(g), jnp.array(y))
            np.testing.assert_allclose(np.asarray(dH), dHr, atol=1e-10)


class TestMarginalParity:
    def test_marg_wasserstein(self, reference_libs, rng):
        OT = reference_libs["OTlib"]
        nx, ny = 9, 11
        fs = rng.random((nx, ny)) + 0.05
        gs = rng.random((nx, ny)) + 0.05
        xx, yy = np.meshgrid(np.linspace(0, 1, ny), np.linspace(0, 1, nx))
        pos = np.dstack([xx, yy])
        srcr = OT.OTpdf((fs, pos))
        tgtr = OT.OTpdf((gs, pos))
        wr, dwr, dgr = OT.MargWasserstein(srcr, tgtr, distfunc="W2",
                                          derivatives=True)
        src = make_density_2d(jnp.array(fs), jnp.array(pos))
        tgt = make_density_2d(jnp.array(gs), jnp.array(pos))
        w, dw, dg = marg_wasserstein(src, tgt, "W2", derivatives=True)
        assert abs(float(w) - wr) <= 1e-10
        np.testing.assert_allclose(np.asarray(dw), dwr, atol=1e-10)
        assert abs(float(dg) - dgr) <= 1e-10

    def test_marg_wasserstein_per_marginal(self, reference_libs, rng):
        OT = reference_libs["OTlib"]
        nx, ny = 8, 10
        fs = rng.random((nx, ny)) + 0.05
        gs = rng.random((nx, ny)) + 0.05
        xx, yy = np.meshgrid(np.linspace(0, 1, ny), np.linspace(0, 1, nx))
        pos = np.dstack([xx, yy])
        outr = OT.MargWasserstein(OT.OTpdf((fs, pos)), OT.OTpdf((gs, pos)),
                                  distfunc="W2", derivatives=True,
                                  returnmargW=True)
        src = make_density_2d(jnp.array(fs), jnp.array(pos))
        tgt = make_density_2d(jnp.array(gs), jnp.array(pos))
        out = marg_wasserstein(src, tgt, "W2", derivatives=True,
                               returnmargW=True)
        np.testing.assert_allclose(np.asarray(out[0]), outr[0], atol=1e-10)
        np.testing.assert_allclose(np.asarray(out[1][0]), outr[1][0],
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(out[1][1]), outr[1][1],
                                   atol=1e-10)
        assert abs(float(out[2][0]) - outr[2][0]) <= 1e-10


class TestSlicedParity:
    def test_sliced_value_and_grad(self, reference_libs, rng):
        OT = reference_libs["OTlib"]
        nx, ny = 6, 6
        fs = rng.random((nx, ny)) + 0.05
        gs = rng.random((nx, ny)) + 0.05
        xx, yy = np.meshgrid(np.linspace(0, 1, ny), np.linspace(0, 1, nx))
        pos = np.dstack([xx, yy])
        nproj = 5
        outr = OT.SlicedWasserstein(OT.OTpdf((fs, pos)), OT.OTpdf((gs, pos)),
                                    nproj, distfunc="W2", derivatives=True)
        src = make_density_2d(jnp.array(fs), jnp.array(pos))
        tgt = make_density_2d(jnp.array(gs), jnp.array(pos))
        w, dw = sliced_wasserstein(src, tgt, nproj, "W2", derivatives=True)
        assert abs(float(w) - outr[0]) <= 1e-10
        np.testing.assert_allclose(np.asarray(dw), outr[1], atol=1e-10)

    def test_sliced_plan_jacobian(self, reference_libs, rng):
        # dHgp vs the reference's per-slice scatter through psorted +
        # normalization projection (OTlib.py:1265-1266, 1314-1315).
        from waveform_ot_tpu.ops import make_density_2d
        from waveform_ot_tpu.ops.sliced import sliced_plan_jacobian

        OT = reference_libs["OTlib"]
        nx, ny = 4, 5
        fs = rng.random((nx, ny)) + 0.05
        gs = rng.random((nx, ny)) + 0.05
        xx, yy = np.meshgrid(np.linspace(0, 1, ny), np.linspace(0, 1, nx))
        pos = np.dstack([xx, yy])
        nproj = 5
        outr = OT.SlicedWasserstein(OT.OTpdf((fs, pos)), OT.OTpdf((gs, pos)),
                                    nproj, distfunc="W2", derivatives=True,
                                    returnplan=True)
        dHgp_r = outr[-1]
        dHgp = sliced_plan_jacobian(
            make_density_2d(jnp.array(fs), jnp.array(pos)),
            make_density_2d(jnp.array(gs), jnp.array(pos)), nproj)
        np.testing.assert_allclose(np.asarray(dHgp), dHgp_r, atol=1e-10)
        # and the average plan itself
        from waveform_ot_tpu.ops import sliced_wasserstein as sw

        src = make_density_2d(jnp.array(fs), jnp.array(pos))
        tgt = make_density_2d(jnp.array(gs), jnp.array(pos))
        out = sw(src, tgt, nproj, "W2", derivatives=True, returnplan=True)
        # Reference quirk: on the returnplan path it returns the SUM of the
        # per-slice plans (OTlib.py:1311-1312 divides only in the calcWplan
        # branch at :1292) while its dHgp IS divided by Nproj (:1316) — the
        # rebuild returns the average for both, consistent with dHgp and the
        # reference's own docstring, so compare x nproj here.
        np.testing.assert_allclose(np.asarray(out[-1]) * nproj, outr[-2],
                                   atol=1e-10)


class TestBarycenterParity:
    def test_pointmass_endpoints(self, reference_libs, rng):
        # include_endpoints=True mirrors barypath_pointmass exactly,
        # including the unconditional first/last substitution
        # (OTlib.py:779-786).
        from waveform_ot_tpu.ops import make_density_1d
        from waveform_ot_tpu.ops.barycenter import barycenter_pointmass

        OT = reference_libs["OTlib"]
        n = 8
        f = rng.random(n) + 0.05
        g = rng.random(n) + 0.05
        x = np.sort(rng.random(n))
        y = np.sort(rng.random(n))
        weights = [0.0, 0.25, 0.5, 0.75, 1.0]
        amp_r, x_r = OT.barypath_pointmass(OT.OTpdf((f, x)), OT.OTpdf((g, y)),
                                           weights)
        amps, xs = barycenter_pointmass(
            make_density_1d(jnp.array(f), jnp.array(x)),
            make_density_1d(jnp.array(g), jnp.array(y)),
            weights, include_endpoints=True)
        assert len(amps) == len(amp_r) and len(xs) == len(x_r)
        for a, ar, xv, xr in zip(amps, amp_r, xs, x_r):
            np.testing.assert_allclose(np.asarray(a), ar, atol=1e-12)
            np.testing.assert_allclose(np.asarray(xv), xr, atol=1e-12)


class TestSinkhornParity:
    def test_dense_matches_reference(self, reference_libs, rng):
        OT = reference_libs["OTlib"]
        from waveform_ot_tpu.ops import sinkhorn_dense

        n = 10
        f = rng.random(n) + 0.1
        g = rng.random(n) + 0.1
        x = np.linspace(0, 1, n)
        wr, pir = OT.Sinkhorn_MS(OT.OTpdf((f, x)), OT.OTpdf((g, x)),
                                 gamma=2e-3, maxiters=800)
        d, pi = sinkhorn_dense(make_density_1d(jnp.array(f), jnp.array(x)),
                               make_density_1d(jnp.array(g), jnp.array(x)),
                               gamma=2e-3, iters=800)
        assert abs(float(d) - wr) <= 1e-8
        np.testing.assert_allclose(np.asarray(pi), pir, atol=1e-10)


class TestFingerprintParity:
    def test_distance_density_derivs(self, reference_libs, rng):
        fp = reference_libs["FingerprintLib"]
        from waveform_ot_tpu.ops import (
            FingerprintSpec, density_from_distance, distance_field,
            grid_axes, make_window, normalize_vertices,
        )

        nt = 50
        t = np.linspace(-1.0, 3.0, nt)
        w = np.cos(2 * t) * np.exp(-0.2 * t * t) + 0.05 * rng.standard_normal(nt)
        grid = (t[0], t[-1], w.min() - 0.25, w.max() + 0.25, 32, nt)
        wf = fp.waveformFP(t, w, grid)
        wf.calcpdf(lambdav=0.05, deriv=True)

        win = make_window(*grid[:4])
        spec = FingerprintSpec(nu=32, ntg=nt)
        verts = normalize_vertices(jnp.array(t), jnp.array(w), win)
        tg, ug = grid_axes(jnp.array(t), win, spec)
        fld = distance_field(verts, tg, ug, impl="jnp")
        np.testing.assert_allclose(np.asarray(fld.d), wf.dfield, atol=1e-10)
        pdf = density_from_distance(fld.d, 0.05, q=None)
        np.testing.assert_allclose(np.asarray(pdf), wf.pdf, atol=1e-10)
        # envelope VJP vs reference dddy columns, composed into dsum/dw
        import jax as _jax
        from waveform_ot_tpu.ops import distance_field_diff

        def dsum(w_):
            v = normalize_vertices(jnp.array(t), w_, win)
            return jnp.sum(distance_field_diff(v, tg, ug, "jnp"))

        gw = _jax.grad(dsum)(jnp.array(w))
        # reference: scatter dddy into vertices by nearest segment
        s = np.zeros(nt)
        np.add.at(s, wf.irays, wf.dddy[:, 0])
        np.add.at(s, wf.irays + 1, wf.dddy[:, 1])
        np.testing.assert_allclose(np.asarray(gw), s, atol=1e-9)


class TestLocPipelineParity:
    """The batched loc/CMT per-trace pipeline vs the reference composed by
    hand from its own libraries (the loc_cmt_util.BuildOTobjfromWaveform +
    CalcWasserWaveform recipe, loc_cmt_util.py:448-574), including the
    arctan transform, per-trace 0.3-padded windows, q=None density and the
    no-tantheta dg scaling."""

    def test_batched_traces_match_reference_loop(self, reference_libs, rng):
        import dataclasses

        import jax
        import jax.numpy as jnp

        fp = reference_libs["FingerprintLib"]
        OT = reference_libs["OTlib"]
        from waveform_ot_tpu.inversion.pipeline import (
            TraceConfig, build_target, calc_wasser_waveform,
        )
        from waveform_ot_tpu.inversion.windows import (
            build_windows, unit_amplitude_windows,
        )
        from waveform_ot_tpu.ops.transforms import arctan_transform

        nr, nc, nt = 3, 2, 41
        t = np.arange(nt) * 1.0
        obs = rng.standard_normal((nr, nc, nt)).cumsum(axis=-1)
        pred = obs + 0.1 * rng.standard_normal((nr, nc, nt))
        nu = int(1.3 * nt)
        cfg = TraceConfig(nu=nu, ntg=nt, lambdav=0.04, q=None, p=2,
                          include_tant_in_dg=False)
        cfg_fp = dataclasses.replace(cfg, transform=False)

        windows = build_windows(t, jnp.array(obs), pad=0.3)
        win01 = unit_amplitude_windows(windows)
        un_obs = arctan_transform(jnp.array(obs), windows.u0[..., None],
                                  windows.u1[..., None])
        un_pred = arctan_transform(jnp.array(pred), windows.u0[..., None],
                                   windows.u1[..., None])

        for i in range(nr):
            for j in range(nc):
                wn = jax.tree_util.tree_map(
                    lambda a: jnp.broadcast_to(a, (nr, nc))[i, j], win01)
                tgt = build_target(jnp.array(t), un_obs[i, j], wn, cfg_fp,
                                   impl="jnp")
                w2M, dr, dgM = calc_wasser_waveform(
                    jnp.array(t), un_pred[i, j], wn, tgt, cfg_fp,
                    deriv=True, returnmarg=True, impl="jnp")

                # reference recipe for the same trace
                du = obs[i, j].max() - obs[i, j].min()
                u0 = obs[i, j].min() - 0.3 * du
                u1 = obs[i, j].max() + 0.3 * du
                grid01 = (t[0], t[-1], 0.0, 1.0, nu, nt)

                def ref_build(u):
                    wf = fp.waveformFP(t, u, grid01)
                    wf.calcpdf(lambdav=0.04, deriv=True, q=None)
                    return wf, OT.OTpdf((wf.pdf, wf.pos))

                def ref_arctan(u):
                    up = ((u - u0) + (u - u1)) / (u1 - u0)
                    return 0.5 + np.arctan(up) / np.pi

                wf_o, ot_o = ref_build(ref_arctan(obs[i, j]))
                wf_p, ot_p = ref_build(ref_arctan(pred[i, j]))
                out = OT.MargWasserstein(ot_p, ot_o, distfunc="W2",
                                         derivatives=True, returnmargW=True)
                wf_p.PDFderivMarg(out[1])
                drr = wf_p.pdfdMarg
                dgr = [out[2][0] / (t[-1] - t[0]),
                       out[2][1] / (t[-1] - t[0])]

                assert abs(float(w2M[0]) - out[0][0]) <= 1e-9
                assert abs(float(w2M[1]) - out[0][1]) <= 1e-9
                np.testing.assert_allclose(np.asarray(dr[0]), drr[0],
                                           atol=1e-9)
                np.testing.assert_allclose(np.asarray(dr[1]), drr[1],
                                           atol=1e-9)
                assert abs(float(dgM[0]) - dgr[0]) <= 1e-9


class TestDrvRpd2xyzParity:
    """Live parity of the pyprop8 Jacobian reorder/rotation chain
    (_drv_to_cartesian) vs the reference drv_rpd2xyz
    (loc_cmt_util.py:360-383) — the diagorder moment-tensor reorder, the
    depth sign flip and the spherical->cartesian receiver-angle chain —
    exercised on synthetic derivative arrays since pyprop8 itself cannot be
    installed here (COVERAGE.md)."""

    @staticmethod
    def _mock_inputs(rng, nr=5, nc=3, nt=13, spherical=True, mt=True):
        import types

        nd = (3 if spherical else 3) + (6 if mt else 0)
        deriv = rng.standard_normal((nr, nd, nc, nt))
        if spherical:
            drv = types.SimpleNamespace(i_r=0, i_phi=1, i_z=2, i_mt=3,
                                        moment_tensor=mt)
        else:
            drv = types.SimpleNamespace(i_x=0, i_y=1, i_z=2, i_mt=3,
                                        moment_tensor=mt)
        stations = types.SimpleNamespace(
            pp=rng.uniform(0, 2 * np.pi, nr),
            rr=rng.uniform(10.0, 80.0, nr))
        return drv, deriv, stations

    @pytest.mark.parametrize("geometry", ["spherical", "cartesian"])
    @pytest.mark.parametrize("mt", [True, False])
    def test_matches_reference(self, reference_loc_cmt, rng, geometry, mt):
        from waveform_ot_tpu.models.pyprop8_bridge import _drv_to_cartesian

        drv, deriv, stations = self._mock_inputs(
            rng, spherical=(geometry == "spherical"), mt=mt)
        ref = reference_loc_cmt.drv_rpd2xyz(drv, deriv, stations,
                                            geometry=geometry)
        got = _drv_to_cartesian(drv, deriv, stations, geometry=geometry)
        assert got.shape == ref.shape == ((9 if mt else 3),) + deriv[:, 0].shape
        np.testing.assert_allclose(got, ref, atol=1e-12)


class TestModuleUtilityParity:
    """Live parity of the module-level FingerprintLib/OTlib utilities
    added to compat (wavedistv/wavederiv/NNsearch/wPDFderiv/
    BuildLinProg/SinkhornAB/distfunction) against the reference itself."""

    def _pair(self, reference_libs, rng, nt=23, nug=16, ntg=18):
        from waveform_ot_tpu import compat

        fp = reference_libs["FingerprintLib"]
        t = np.linspace(0.0, 2.0, nt)
        w = 0.6 * np.sin(3 * t) + 0.05 * rng.standard_normal(nt)
        grid = (0.0, 2.0, -1.0, 1.0, nug, ntg)
        wf_r = fp.waveformFP(t, w, grid)
        wf_o = compat.waveformFP(t, w, grid)
        Xn, Yn = np.meshgrid(np.linspace(*wf_r.tlimnfp, ntg),
                             np.linspace(*wf_r.ulimnfp, nug))
        pts = np.vstack((Xn.flatten(), Yn.flatten())).T
        return fp, wf_r, wf_o, pts

    def test_wavedistv(self, reference_libs, rng):
        from waveform_ot_tpu import compat

        fp, wf_r, wf_o, pts = self._pair(reference_libs, rng)
        d_r, i_r, x_r, l_r = fp.wavedistv(pts, wf_r)
        d_o, i_o, x_o, l_o = compat.wavedistv(pts, wf_o)
        np.testing.assert_allclose(d_o, d_r, atol=1e-12)
        np.testing.assert_array_equal(i_o, i_r)
        np.testing.assert_allclose(x_o, x_r, atol=1e-12)
        np.testing.assert_allclose(l_o, l_r, atol=1e-12)

    def test_wavedist_single(self, reference_libs, rng):
        from waveform_ot_tpu import compat

        fp, wf_r, wf_o, pts = self._pair(reference_libs, rng)
        for p in pts[::37]:
            d_r, i_r, x_r = fp.wavedist(p, wf_r)
            d_o, i_o, x_o = compat.wavedist(p, wf_o)
            assert abs(d_o - d_r) < 1e-12 and i_o == i_r
            np.testing.assert_allclose(x_o, x_r, atol=1e-12)

    def test_wavederiv(self, reference_libs, rng):
        from waveform_ot_tpu import compat

        fp, wf_r, wf_o, pts = self._pair(reference_libs, rng)
        d_r, i_r, x_r, l_r = fp.wavedistv(pts, wf_r)
        dd_r = fp.wavederiv(d_r, i_r, x_r, l_r, pts, wf_r)
        d_o, i_o, x_o, l_o = compat.wavedistv(pts, wf_o)
        dd_o = compat.wavederiv(d_o, i_o, x_o, l_o, pts, wf_o)
        # the reference composes dlam terms that are analytically zero in
        # dddy (envelope form); agreement is to round-off of that sum
        np.testing.assert_allclose(dd_o, dd_r, atol=1e-9)

    def test_nnsearch(self, reference_libs, rng):
        from waveform_ot_tpu import compat

        fp, wf_r, wf_o, pts = self._pair(reference_libs, rng)
        d_r, i_r, l_r, x_r = fp.NNsearch(wf_r)
        d_o, i_o, l_o, x_o = compat.NNsearch(wf_o)
        np.testing.assert_allclose(d_o, d_r, atol=1e-12)
        np.testing.assert_array_equal(i_o, i_r)
        np.testing.assert_allclose(np.asarray(l_o).ravel(),
                                   np.asarray(l_r).ravel(), atol=1e-12)
        np.testing.assert_allclose(x_o, x_r, atol=1e-12)

    def test_wpdfderiv(self, reference_libs, rng):
        from waveform_ot_tpu import compat

        fp, wf_r, wf_o, pts = self._pair(reference_libs, rng)
        lam = 0.05
        d_r, i_r, x_r, l_r = fp.wavedistv(pts, wf_r)
        dd_r = fp.wavederiv(d_r, i_r, x_r, l_r, pts, wf_r)
        pdf = np.exp(-np.abs(d_r) / lam)
        chain = np.ones_like(pdf)
        s_r = fp.wPDFderiv(pdf, dd_r, lam, i_r, wf_r, chain)
        s_o = compat.wPDFderiv(pdf, dd_r, lam, i_r, wf_o, chain)
        np.testing.assert_allclose(s_o, s_r, atol=1e-12)

    def test_check_fdderiv(self, reference_libs, rng):
        from waveform_ot_tpu import compat

        fp, wf_r, wf_o, pts = self._pair(reference_libs, rng)
        wf_r.calcpdf(lambdav=0.05)
        wf_o.calcpdf(lambdav=0.05)
        k = 77
        i_r, f0_r, f1_r = fp.check_FDderiv(wf_r, k, du=1e-5)
        i_o, f0_o, f1_o = compat.check_FDderiv(wf_o, k, du=1e-5)
        assert i_o == i_r
        assert abs(f0_o - f0_r) < 1e-7 and abs(f1_o - f1_r) < 1e-7

    def test_buildlinprog_optimum(self, reference_libs, rng):
        from scipy.optimize import linprog

        from waveform_ot_tpu import compat

        ot = reference_libs["OTlib"]
        f = rng.random(5) + 0.1
        g = rng.random(5) + 0.1
        x = np.linspace(0, 1, 5)
        src_r = ot.OTpdf((f, x))
        tgt_r = ot.OTpdf((g, x))
        d_r, A_r, b_r = ot.BuildLinProg(src_r, tgt_r, distfunc="W2")
        src_o = compat.OTpdf((f, x))
        tgt_o = compat.OTpdf((g, x))
        d_o, A_o, b_o = compat.BuildLinProg(src_o, tgt_o, "W2")
        assert np.shape(d_o) == np.shape(d_r)  # both (n, n) matrices
        res_r = linprog(np.ravel(d_r), A_eq=A_r, b_eq=b_r, bounds=(0, None),
                        method="highs")
        res_o = linprog(np.ravel(d_o), A_eq=A_o, b_eq=b_o, bounds=(0, None),
                        method="highs")
        assert res_r.success and res_o.success
        assert abs(res_r.fun - res_o.fun) < 1e-10

    def test_distfunction(self, reference_libs, rng):
        from waveform_ot_tpu import compat

        ot = reference_libs["OTlib"]
        A = rng.random((6, 7))
        ii = np.array([0, 2, 5])
        jj = np.array([1, 6, 3])
        np.testing.assert_array_equal(
            compat.distfunction(ii, jj, A), ot.distfunction(ii, jj, A))

    def test_sinkhorn_ab(self, reference_libs, rng):
        from waveform_ot_tpu import compat

        ot = reference_libs["OTlib"]
        mu0 = rng.random((8, 8)) + 0.1
        mu0 /= mu0.sum()
        mu1 = rng.random((8, 8)) + 0.1
        mu1 /= mu1.sum()
        d_r, v_r, w_r = ot.SinkhornAB((mu0, mu1), 1.0)
        d_o, v_o, w_o = compat.SinkhornAB((mu0, mu1), 1.0)
        assert abs(d_o - d_r) < 1e-8 * max(1.0, abs(d_r))
        np.testing.assert_allclose(v_o, v_r, rtol=1e-6, atol=1e-10)

    def test_nnsearch_refined(self, reference_libs, rng):
        from waveform_ot_tpu import compat

        fp, wf_r, wf_o, pts = self._pair(reference_libs, rng)
        d_r, i_r, l_r, x_r = fp.NNsearch(wf_r, ni=2)
        d_o, i_o, l_o, x_o = compat.NNsearch(wf_o, ni=2)
        np.testing.assert_allclose(d_o, d_r, atol=1e-12)
        np.testing.assert_array_equal(i_o, i_r)
        np.testing.assert_allclose(np.asarray(l_o).ravel(),
                                   np.asarray(l_r).ravel(), atol=1e-12)
        np.testing.assert_allclose(x_o, x_r, atol=1e-12)
