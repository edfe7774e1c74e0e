"""Live parity for the L3 drop-in modules (compat_ricker / compat_loc_cmt)
against the actual reference libs mounted at /root/reference.

The reference notebooks drive ricker_util/loc_cmt_util by module name;
these tests run the same calls through both implementations and compare
numbers, so notebook code ports by changing only the import line.
"""

import numpy as np
import pytest

from waveform_ot_tpu import compat_ricker as cru


class TestRickerUtilParity:
    @pytest.fixture(scope="class")
    def ru(self, reference_libs):
        return reference_libs["ricker_util"]

    def test_rickerwavelet(self, ru):
        t_r, w_r, dw_r = ru.rickerwavelet(0.1, 1.6, 1.1, trange=[-2.0, 7.0],
                                          deriv=True)
        t_c, w_c, dw_c = cru.rickerwavelet(0.1, 1.6, 1.1,
                                           trange=(-2.0, 7.0), deriv=True)
        np.testing.assert_allclose(t_c, t_r, atol=1e-12)
        np.testing.assert_allclose(w_c, w_r, atol=1e-12)
        np.testing.assert_allclose(dw_c, dw_r, atol=1e-12)

    def test_datawindowunion_lsmisfit(self, ru):
        t1 = np.linspace(-2.0, 7.0, 128)
        t2 = np.linspace(-1.0, 8.0, 128)
        w1 = np.sin(t1)
        w2 = np.cos(t2) * 0.5
        a_r = ru.datawindowunion(t1, w1, t2, w2)
        a_c = cru.datawindowunion(t1, w1, t2, w2)
        np.testing.assert_allclose(a_c[0], a_r[0], atol=1e-12)
        np.testing.assert_allclose(a_c[1], a_r[1], atol=1e-12)
        assert abs(cru.LSmisfit(t1, w1, t2, w2)
                   - ru.LSmisfit(t1, w1, t2, w2)) < 1e-10

    def test_arctan_trans(self, ru):
        u = np.linspace(-2.0, 2.5, 64)
        un_r, und_r = ru.arctan_trans(u, -2.1, 2.6, deriv=True)
        un_c, und_c = cru.arctan_trans(u, -2.1, 2.6, deriv=True)
        np.testing.assert_allclose(un_c, un_r, atol=1e-12)
        np.testing.assert_allclose(und_c, und_r, atol=1e-12)

    def test_build_and_calcwasser(self, ru, reference_libs):
        """BuildOTobjfromWaveform + CalcWasserWaveform end to end: same
        Wasserstein, amplitude chain, and origin-time derivative."""
        grid = (-2.0, 7.0, -2.0, 2.6, 40, 128)
        t_o, w_o = ru.rickerwavelet(0.0, 1.6, 1.0, trange=[-2.0, 7.0])
        t_p, w_p = ru.rickerwavelet(0.3, 1.4, 1.05, trange=[-2.0, 7.0])

        _, obj_obs_r = ru.BuildOTobjfromWaveform(t_o, w_o, grid,
                                                 lambdav=0.03,
                                                 transform=True)
        wf_r, obj_pred_r = ru.BuildOTobjfromWaveform(t_p, w_p, grid,
                                                     lambdav=0.03,
                                                     deriv=True,
                                                     transform=True)
        w_r, dr_r, dg_r = ru.CalcWasserWaveform(obj_pred_r, obj_obs_r, wf_r,
                                                deriv=True, returnmarg=True)

        _, obj_obs_c = cru.BuildOTobjfromWaveform(t_o, w_o, grid,
                                                  lambdav=0.03,
                                                  transform=True)
        wf_c, obj_pred_c = cru.BuildOTobjfromWaveform(t_p, w_p, grid,
                                                      lambdav=0.03,
                                                      deriv=True,
                                                      transform=True)
        w_c, dr_c, dg_c = cru.CalcWasserWaveform(obj_pred_c, obj_obs_c,
                                                 wf_c, deriv=True,
                                                 returnmarg=True)
        np.testing.assert_allclose(w_c, w_r, atol=1e-10)
        np.testing.assert_allclose(dr_c[0], dr_r[0], atol=1e-10)
        np.testing.assert_allclose(dr_c[1], dr_r[1], atol=1e-10)
        np.testing.assert_allclose(dg_c, dg_r, atol=1e-10)

    def test_optfunc(self, ru, reference_libs):
        """The full scipy objective: identical misfit and gradient."""
        import libs.ricker_util_opt as ruo

        grid = (-2.0, 7.0, -2.0, 2.6, 40, 128)
        t_o, w_o = ru.rickerwavelet(0.0, 1.6, 1.0, trange=[-2.0, 7.0])
        _, obj_obs_r = ru.BuildOTobjfromWaveform(t_o, w_o, grid,
                                                 lambdav=0.03,
                                                 transform=True)
        _, obj_obs_c = cru.BuildOTobjfromWaveform(t_o, w_o, grid,
                                                  lambdav=0.03,
                                                  transform=True)
        x = np.array([0.25, 1.45, 1.08])
        ruo.init()
        cru.init()
        data_r = [obj_obs_r, "W2", [-2.0, 7.0], grid, 0.03, True, 0.5, 45.0]
        data_c = [obj_obs_c, "W2", (-2.0, 7.0), grid, 0.03, True, 0.5, 45.0]
        w_r, d_r = ru.optfunc(x, data_r)
        w_c, d_c = cru.optfunc(x, data_c)
        assert abs(w_c - w_r) < 1e-10
        np.testing.assert_allclose(d_c, d_r, atol=1e-10)
        assert len(cru.Wdata) == 1          # history blackboard recorded

    def test_calcwasser_old_parity(self, ru):
        grid = (-2.0, 7.0, -2.0, 2.6, 40, 128)
        t_o, w_o = ru.rickerwavelet(0.0, 1.6, 1.0, trange=[-2.0, 7.0])
        t_p, w_p = ru.rickerwavelet(0.3, 1.4, 1.05, trange=[-2.0, 7.0])
        _, obs_r = ru.BuildOTobjfromWaveform(t_o, w_o, grid, lambdav=0.03,
                                             transform=True)
        wf_r, pred_r = ru.BuildOTobjfromWaveform(t_p, w_p, grid,
                                                 lambdav=0.03, deriv=True,
                                                 transform=True)
        _, obs_c = cru.BuildOTobjfromWaveform(t_o, w_o, grid, lambdav=0.03,
                                              transform=True)
        wf_c, pred_c = cru.BuildOTobjfromWaveform(t_p, w_p, grid,
                                                  lambdav=0.03, deriv=True,
                                                  transform=True)
        w_r, dr_r, dg_r = ru.CalcWasserWaveform_old(pred_r, obs_r, wf_r,
                                                    deriv=True)
        w_c, dr_c, dg_c = cru.CalcWasserWaveform_old(pred_c, obs_c, wf_c,
                                                     deriv=True)
        assert abs(w_c - w_r) < 1e-10
        np.testing.assert_allclose(dr_c, dr_r, atol=1e-10)
        np.testing.assert_allclose(dg_c, dg_r, atol=1e-10)
        assert abs(cru.CalcWasserWaveform_old(pred_c, obs_c, wf_c)
                   - ru.CalcWasserWaveform_old(pred_r, obs_r, wf_r)) < 1e-10

    def test_check_dwdufd_parity(self, ru):
        """The end-to-end amplitude FD checker (ricker_util.py:554-573)."""
        grid = (-2.0, 7.0, -2.0, 2.6, 24, 96)
        t_o, w_o = ru.rickerwavelet(0.0, 1.6, 1.0, trange=[-2.0, 7.0])
        t_p, w_p = ru.rickerwavelet(0.3, 1.4, 1.05, trange=[-2.0, 7.0])
        _, obs_r = ru.BuildOTobjfromWaveform(t_o, w_o, grid, lambdav=0.03,
                                             transform=True)
        _, obs_c = cru.BuildOTobjfromWaveform(t_o, w_o, grid, lambdav=0.03,
                                              transform=True)
        i = int(np.argmax(np.abs(w_p)))
        r = ru.check_dwduFD(i, t_p, w_p, 0.1, grid, 0.03, obs_r,
                            transform=True)
        c = cru.check_dwduFD(i, t_p, w_p, 0.1, grid, 0.03, obs_c,
                             transform=True)
        np.testing.assert_allclose(c, r, rtol=1e-6, atol=1e-9)

    def test_check_dwdmfd_parity(self, ru):
        """The model-parameter FD checker (ricker_util.py:576-606), both
        returnmarg branches."""
        grid = (-2.0, 7.0, -2.0, 2.6, 24, 96)
        t_o, w_o = ru.rickerwavelet(0.0, 1.6, 1.0, trange=[-2.0, 7.0])
        _, obs_r = ru.BuildOTobjfromWaveform(t_o, w_o, grid, lambdav=0.03,
                                             transform=True)
        _, obs_c = cru.BuildOTobjfromWaveform(t_o, w_o, grid, lambdav=0.03,
                                              transform=True)
        mref = np.array([0.3, 1.4, 1.05])
        tp, wp = ru.rickerwavelet(*mref, trange=[-2.0, 7.0])
        for k in range(3):
            r = ru.check_dwdmFD(k, tp, wp, 0.01, mref, grid, 0.03, obs_r,
                                [-2.0, 7.0], transform=True)
            c = cru.check_dwdmFD(k, tp, wp, 0.01, mref, grid, 0.03, obs_c,
                                 (-2.0, 7.0), transform=True)
            np.testing.assert_allclose(c, r, rtol=1e-6, atol=1e-9)
        r1 = ru.check_dwdmFD(0, tp, wp, 0.01, mref, grid, 0.03, obs_r,
                             [-2.0, 7.0], transform=True, returnmarg=False)
        c1 = cru.check_dwdmFD(0, tp, wp, 0.01, mref, grid, 0.03, obs_c,
                              (-2.0, 7.0), transform=True, returnmarg=False)
        np.testing.assert_allclose(c1, r1, rtol=1e-6, atol=1e-9)

    def test_plotrickers_special_smoke(self, tmp_path):
        import matplotlib
        matplotlib.use("Agg", force=True)
        import matplotlib.pyplot as plt
        t = np.linspace(-2.0, 7.0, 64)
        plt.figure()
        cru.plotrickers_special(t, np.sin(t), t, np.cos(t),
                                tlim=(-2.0, 7.0), ulim=(-2.0, 2.0),
                                ref=[t, 0.5 * np.sin(t)], xlab=True,
                                offset="0.1", clean=True)
        plt.savefig(tmp_path / "rs.png")
        plt.close("all")
        assert (tmp_path / "rs.png").stat().st_size > 0


# ---------------------------------------------------------------------------
# loc_cmt_util drop-in (compat_loc_cmt)
# ---------------------------------------------------------------------------

from waveform_ot_tpu import compat_loc_cmt as clc  # noqa: E402


def _tiny_prop8data(nr=2, nt=16, seed=0):
    """Small layered-physics problem: 2 receivers, 2-layer crust, coarse
    wavenumber quadrature (accuracy irrelevant — consistency is tested)."""
    from waveform_ot_tpu.models.layered import layered_model_from_table

    rng = np.random.default_rng(seed)
    model = layered_model_from_table([(3.0, 5.0, 2.9, 2.5),
                                      (0.0, 7.0, 4.0, 3.0)])
    prop8data = {
        "sdrm": (30.0, 60.0, 45.0, 1.0e13),
        "recx": rng.uniform(5.0, 25.0, nr),
        "recy": rng.uniform(5.0, 25.0, nr),
        "model": model,
        "nk": 48,
        "kmax": 1.0,
    }
    t, s = clc.prop8seis(2.0, -3.0, 4.0, prop8data, nt=nt)
    prop8data["obs_seis"] = s
    return prop8data, t


class TestLocCmtUtilParity:
    """Live parity for the pure-numpy loc_cmt_util functions (the physics
    functions cannot run in the reference — pyprop8 is uninstallable)."""

    def test_buildmxyz(self, reference_loc_cmt, rng):
        vals = rng.normal(size=6)
        np.testing.assert_allclose(clc.buildMxyzfromupper(vals),
                                   reference_loc_cmt.buildMxyzfromupper(vals),
                                   atol=1e-14)
        np.testing.assert_allclose(clc.BuildMxyz(vals),
                                   reference_loc_cmt.BuildMxyz(vals),
                                   atol=1e-14)

    def test_misfitfunc(self, reference_loc_cmt, rng):
        so = rng.normal(size=(2, 3, 16))
        sp = rng.normal(size=(2, 3, 16))
        assert abs(clc.misfitfunc(so, sp)
                   - reference_loc_cmt.misfitfunc(so, sp)) < 1e-10

    def test_build_fingerprint_windows(self, reference_loc_cmt, rng):
        t = np.linspace(0.0, 15.0, 16)
        wave = rng.normal(size=(2, 3, 16))
        g_r = reference_loc_cmt.buildFingerprintwindows(t, wave)
        g_c = clc.buildFingerprintwindows(t, wave)
        np.testing.assert_allclose(np.asarray(g_c, float),
                                   np.asarray(g_r, float), atol=1e-12)
        g_r2 = reference_loc_cmt.buildFingerprintwindows(t, wave, Nu=20,
                                                         Nt=12, u0=-3.0,
                                                         u1=3.0)
        g_c2 = clc.buildFingerprintwindows(t, wave, Nu=20, Nt=12, u0=-3.0,
                                           u1=3.0)
        np.testing.assert_allclose(np.asarray(g_c2, float),
                                   np.asarray(g_r2, float), atol=1e-12)

    def test_arctan_trans(self, reference_loc_cmt, rng):
        t = np.linspace(0.0, 15.0, 16)
        wave = rng.normal(size=(2, 3, 16))
        grids = reference_loc_cmt.buildFingerprintwindows(t, wave)
        un_r, und_r = reference_loc_cmt.arctan_trans(wave, grids, deriv=True)
        un_c, und_c = clc.arctan_trans(wave, grids, deriv=True)
        np.testing.assert_allclose(un_c, un_r, atol=1e-12)
        np.testing.assert_allclose(und_c, und_r, atol=1e-12)

    def test_setmref(self, reference_loc_cmt, rng):
        class _Src:
            Mxyz = rng.normal(size=(1, 3, 3))

        mtrue = [1.0, 2.0, 3.0]
        for invopt in ({"loc": True, "cmt": False},
                       {"loc": True, "cmt": True},
                       {"loc": False, "cmt": True}):
            r = reference_loc_cmt.setmref(invopt, _Src, mtrue)
            c = clc.setmref(invopt, _Src, mtrue)
            np.testing.assert_allclose(np.hstack(c).astype(float),
                                       np.hstack(r).astype(float),
                                       atol=1e-14)

    def test_checkconverge(self, reference_loc_cmt, rng):
        mtrue = np.array([1.0, -2.0, 5.0])
        sols = []
        for i in range(12):
            mstart = rng.uniform(-70.0, 70.0, 3)
            if i % 5 == 0:
                mstart[0] = 80.0          # the excluded outer square
            mfinal = mtrue + (0.1 if i % 2 else 5.0) * rng.normal(size=3)
            sols.append([mstart, 100.0, mfinal, 1.0, mtrue, -10.0])
        con_r, d_r, gcon_r = reference_loc_cmt.checkconverge(sols)
        con_c, d_c, gcon_c = clc.checkconverge(sols)
        np.testing.assert_allclose(d_c, d_r, atol=1e-12)
        assert list(gcon_c) == list(gcon_r)
        assert [bool(v) for v in con_c] == [bool(v) for v in con_r]


class TestLocCmtPhysics:
    """Self-consistency of the on-device prop8seis replacement (no
    reference execution possible: pyprop8 is uninstallable)."""

    def test_forward_shapes_and_mxyz_default(self):
        prop8data, t = _tiny_prop8data()
        assert prop8data["obs_seis"].shape == (2, 3, 16)
        assert t.shape == (16,)
        # explicit Mxyz equal to the sdrm-derived default -> same output
        from waveform_ot_tpu.models.seismo import moment_tensor_from_sdr

        mx = np.asarray(moment_tensor_from_sdr(30.0, 60.0, 45.0,
                                               1.0e13 * 1.0e-13))
        _, s2 = clc.prop8seis(2.0, -3.0, 4.0, prop8data, Mxyz=mx, nt=16)
        np.testing.assert_allclose(s2, prop8data["obs_seis"], atol=1e-12)

    def test_cartesian_derivatives_fd(self):
        prop8data, _ = _tiny_prop8data()
        drv = clc.DerivativeSwitches(x=True, y=True, z=True,
                                     moment_tensor=True)
        x0 = np.array([2.5, -2.0, 4.5])
        t, s0, deriv, src, stations = clc.prop8seis(
            *x0, prop8data, drv=drv, nt=16, returndata=True)
        assert deriv.shape == (2, 9, 3, 16)
        rows = clc.drv_rpd2xyz(drv, deriv, stations, geometry="cartesian")
        eps = 1e-5
        for k in range(3):
            xp = x0.copy(); xp[k] += eps
            xm = x0.copy(); xm[k] -= eps
            _, sp = clc.prop8seis(*xp, prop8data, nt=16)
            _, sm = clc.prop8seis(*xm, prop8data, nt=16)
            fd = (sp - sm) / (2 * eps)
            np.testing.assert_allclose(
                rows[k], fd, atol=2e-6 * np.abs(fd).max() + 1e-12)

    def test_mt_rows_are_exact_linear_coefficients(self):
        """Seismograms are linear in M: the six upper-tri derivative rows
        contracted with m6 must rebuild the forward exactly."""
        prop8data, _ = _tiny_prop8data()
        drv = clc.DerivativeSwitches(moment_tensor=True)
        m6 = np.array([0.3, -0.5, 0.2, 0.7, -0.1, 0.4])
        mx = clc.buildMxyzfromupper(m6)
        _, s, deriv = clc.prop8seis(1.0, 2.0, 5.0, prop8data, Mxyz=mx,
                                    drv=drv, nt=16)
        assert deriv.shape == (2, 6, 3, 16)
        rows = np.array([deriv[:, drv.i_mt + clc._DIAGORDER[k]]
                         for k in range(6)])
        rebuilt = np.tensordot(m6, rows, axes=1)
        np.testing.assert_allclose(rebuilt, s, atol=1e-10 * np.abs(s).max())

    def test_spherical_channels_roundtrip(self):
        """drv_rpd2xyz applied to the spherical channel layout must return
        the same cartesian rows as the cartesian layout."""
        prop8data, _ = _tiny_prop8data()
        drv_c = clc.DerivativeSwitches(x=True, y=True, z=True)
        drv_s = clc.DerivativeSwitches(r=True, phi=True, z=True)
        args = (1.5, -2.5, 4.0)
        _, _, dc, _, st = clc.prop8seis(*args, prop8data, drv=drv_c, nt=16,
                                        returndata=True)
        _, _, ds = clc.prop8seis(*args, prop8data, drv=drv_s, nt=16)
        rows_c = clc.drv_rpd2xyz(drv_c, dc, st, geometry="cartesian")
        rows_s = clc.drv_rpd2xyz(drv_s, ds, st, geometry="spherical")
        np.testing.assert_allclose(rows_s, rows_c,
                                   atol=1e-12 * np.abs(rows_c).max())

    def test_moment_ls_recovers_truth(self):
        prop8data, _ = _tiny_prop8data()
        m6_true = np.array([0.4, -0.2, 0.6, 0.3, -0.5, 0.1])
        mx = clc.buildMxyzfromupper(m6_true)
        xyz = (3.0, 1.0, 6.0)
        _, s = clc.prop8seis(*xyz, prop8data, Mxyz=mx, nt=16)
        p8 = dict(prop8data)
        p8["obs_seis"] = s
        m6 = clc.Moment_LS(list(xyz), p8)
        np.testing.assert_allclose(m6, m6_true, atol=1e-5)


class TestLocCmtObjectives:
    """optfunc_L2 / optfunc_OT drop-ins: values consistent with their
    definitions, gradients FD-checked, blackboard recorded."""

    @pytest.fixture(scope="class")
    def problem(self):
        prop8data, t = _tiny_prop8data()
        seis_obs = np.asarray(prop8data["obs_seis"])
        obs_grids = clc.buildFingerprintwindows(t, seis_obs, Nu=20)
        obs_grids01 = [[g[:2] + [0.0, 1.0] + g[4:] for g in row]
                       for row in obs_grids]
        un_obs = clc.arctan_trans(seis_obs, obs_grids)
        OTdata = {"Wopt": "Wavg", "distfunc": "W2", "plambda": 0.04,
                  "theta": 45.0, "obs_grids": obs_grids,
                  "obs_grids01": obs_grids01}
        wfobs, wfobs_target = clc.BuildOTobjfromWaveform(
            t, seis_obs, obs_grids, OTdata, lambdav=0.04)
        OTdata["wfobs"] = wfobs
        OTdata["wfobs_target"] = wfobs_target
        invopt = {"loc": True, "cmt": False, "mistype": "OT",
                  "precon": False, "mscal": np.ones(3),
                  "mref": np.zeros(3)}
        return {"invopt": invopt, "prop8data": prop8data, "OTdata": OTdata}

    def test_optfunc_l2_value_and_grad(self, problem):
        data = dict(problem)
        data["invopt"] = dict(problem["invopt"], mistype="L2")
        clc.init()
        clc.optdata = data
        m = np.array([2.6, -2.4, 4.2])
        mis, dmis = clc.optfunc(m, data)
        _, sp = clc.prop8seis(*m, data["prop8data"], nt=16)
        assert abs(mis - clc.misfitfunc(data["prop8data"]["obs_seis"],
                                        sp)) < 1e-10
        eps = 1e-5
        for k in range(3):
            mp = m.copy(); mp[k] += eps
            mm = m.copy(); mm[k] -= eps
            fd = (clc.optfunc_L2(mp, data, noderiv=True)
                  - clc.optfunc_L2(mm, data, noderiv=True)) / (2 * eps)
            assert abs(dmis[k] - fd) < 2e-5 * max(abs(fd), 1e-8)
        assert len(clc.opt_history_data) >= 1
        clc.recordresult(m)
        assert len(clc.opt_history) == 1

    def test_optfunc_ot_value_and_grad(self, problem):
        clc.init()
        m = np.array([2.8, -2.2, 4.4])
        mis, dmis = clc.optfunc(m, problem)
        # value == sum over traces of the Wavg CalcWasserWaveform
        t = 1.0 * np.arange(16)
        _, sp = clc.prop8seis(*m, problem["prop8data"], nt=16)
        OTdata = problem["OTdata"]
        wfp, wfsrc = clc.BuildOTobjfromWaveform(
            t, sp, OTdata["obs_grids"], OTdata, lambdav=OTdata["plambda"])
        ref = sum(clc.CalcWasserWaveform(wfsrc[i][j],
                                         OTdata["wfobs_target"][i][j],
                                         wfp[i][j])
                  for i in range(2) for j in range(3))
        assert abs(mis - ref) < 1e-10
        eps = 1e-5
        for k in range(3):
            mp = m.copy(); mp[k] += eps
            mm = m.copy(); mm[k] -= eps
            fd = (clc.optfunc_OT(mp, problem, noderiv=True)
                  - clc.optfunc_OT(mm, problem, noderiv=True)) / (2 * eps)
            assert abs(dmis[k] - fd) < 2e-4 * max(abs(fd), 1e-10)

    def test_optfunc_ot_wopt_variants(self, problem):
        m = np.array([2.8, -2.2, 4.4])
        clc.init()
        mis2, dmis2 = clc.optfunc_OT(m, problem, return2W=True)
        data_t = dict(problem,
                      OTdata=dict(problem["OTdata"], Wopt="Wt"))
        data_u = dict(problem,
                      OTdata=dict(problem["OTdata"], Wopt="Wu"))
        mist, dmist = clc.optfunc_OT(m, data_t)
        misu, dmisu = clc.optfunc_OT(m, data_u)
        assert abs(mis2[0] - mist) < 1e-12
        assert abs(mis2[1] - misu) < 1e-12
        np.testing.assert_allclose(dmis2[0], dmist, atol=1e-12)
        np.testing.assert_allclose(dmis2[1], dmisu, atol=1e-12)

    def test_optfunc_joint_cmt_layout(self, problem):
        """9-parameter joint loc+CMT gradient: FD spot check on one
        location and one moment-tensor slot."""
        data = dict(problem)
        data["invopt"] = dict(problem["invopt"], cmt=True)
        m = np.concatenate([[2.8, -2.2, 4.4],
                            [0.3, -0.5, 0.2, 0.7, -0.1, 0.4]])
        mis, dmis = clc.optfunc_OT(m, data)
        assert dmis.shape == (9,)
        eps = 1e-5
        for k in (0, 4):
            mp = m.copy(); mp[k] += eps
            mm = m.copy(); mm[k] -= eps
            fd = (clc.optfunc_OT(mp, data, noderiv=True)
                  - clc.optfunc_OT(mm, data, noderiv=True)) / (2 * eps)
            assert abs(dmis[k] - fd) < 2e-4 * max(abs(fd), 1e-10)

    def test_return_derivative_arrays_are_4d(self, problem):
        """returnseisd/returnderiv hand back the UNflattened (nm, nr, nc,
        nt) derivxyz, exactly like the reference (loc_cmt_util.py:180,
        304) — not the objectives' internal (nm, nr*nc*nt) matrix."""
        m = np.array([2.6, -2.4, 4.2])
        data = dict(problem)
        data["invopt"] = dict(problem["invopt"], mistype="L2")
        mis, dmis, t, sp, derivxyz = clc.optfunc_L2(m, data,
                                                    returnseisd=True)
        assert derivxyz.shape == (3, 2, 3, 16)
        mis2, dmis2, derivxyz2, drW = clc.optfunc_OT(m, problem,
                                                     returnderiv=True)
        assert derivxyz2.shape == (3, 2, 3, 16)
        assert drW.shape == (2, 3, 16)
        # flattening the rows reproduces the returned gradient exactly
        np.testing.assert_allclose(derivxyz2.reshape(3, -1) @ drW.ravel(),
                                   dmis2, rtol=0, atol=1e-13)

    def test_cmt_only_restricted_jacobian(self, problem):
        """loc=False runs the 'mt'-restricted jacfwd (6 forward columns,
        not 9); the six rows must still be the exact linear coefficients
        of the moment-tensor dependence."""
        data = dict(problem)
        data["invopt"] = dict(problem["invopt"], loc=False, cmt=True,
                              mistype="L2",
                              mref=np.array([2.0, -3.0, 4.0]),
                              mscal=np.ones(6))
        m6 = np.array([0.3, -0.5, 0.2, 0.7, -0.1, 0.4])
        mis, dmis = clc.optfunc_L2(m6, data)
        assert dmis.shape == (6,)
        eps = 1e-5
        for k in (1, 5):
            mp = m6.copy(); mp[k] += eps
            mm = m6.copy(); mm[k] -= eps
            fd = (clc.optfunc_L2(mp, data, noderiv=True)
                  - clc.optfunc_L2(mm, data, noderiv=True)) / (2 * eps)
            assert abs(dmis[k] - fd) < 2e-5 * max(abs(fd), 1e-8)

    def test_precon_scaling(self, problem):
        data = dict(problem)
        data["invopt"] = dict(problem["invopt"], precon=True,
                              mscal=np.array([2.0, 0.5, 1.5]))
        m_phys = np.array([2.8, -2.2, 4.4])
        m_pre = m_phys / data["invopt"]["mscal"]
        mis0, dmis0 = clc.optfunc_OT(m_phys, problem)
        mis1, dmis1 = clc.optfunc_OT(m_pre, data)
        assert abs(mis0 - mis1) < 1e-12
        np.testing.assert_allclose(dmis1,
                                   dmis0 * data["invopt"]["mscal"],
                                   atol=1e-12)


class TestRickerPlotWrappers:
    """The remaining reference-signature ricker_util plot functions
    (plotrickers/plotsurface/plotmisfit/plotwfit/plotwfit_3panels/
    plotMarginals, ricker_util.py:106-552) — smoke to real files."""

    def test_ricker_plot_wrappers_smoke(self, tmp_path):
        import matplotlib
        matplotlib.use("Agg", force=True)
        t = np.linspace(-2.0, 7.0, 64)
        w1, w2 = np.exp(-t * t), np.exp(-(t - 0.3) ** 2)
        cru.plotrickers(t, w1, t, w2, ref=(t, 0.5 * w2), clean=True,
                        filename=str(tmp_path / "pr.png"))
        cru.plotsurface(np.random.default_rng(0).random((8, 8)),
                        np.arange(8), np.arange(8), 3, 3, l=0.5, alt=55,
                        filename=str(tmp_path / "ps.png"))
        cru.plotmisfit([3.0, 2.0, 1.0], second=[4.0, 2.5, 1.2], log=True,
                       filename=str(tmp_path / "pm.png"))
        from waveform_ot_tpu import compat
        wf = compat.waveformFP(t, w1, (-2.0, 7.0, -1.5, 1.5, 16, 64))
        wf.calcpdf(lambdav=0.03)
        cru.plotwfit(t, w2, 0, [wf], [3.0, 2.0, 1.0], 1, 2.0,
                     filename=str(tmp_path / "wf.png"))
        cru.plotwfit_3panels(t, w2, 0, [wf], [3.0, 2.0, 1.0],
                             [5.0, 3.0, 2.0], 1, 2.0, 3.0,
                             filename=str(tmp_path / "wf3.png"))
        ot = compat.OTpdf((np.asarray(wf.pdf), wf.pos))
        cru.plotMarginals(wf, ot, tag="_x", fxsize=9, outdir=str(tmp_path))
        for f in ("pr.png", "ps.png", "pm.png", "wf.png", "wf3.png"):
            assert (tmp_path / f).stat().st_size > 0


class TestGPReferenceNames:
    def test_createcurve_reference_signature(self):
        from waveform_ot_tpu.models.gp_noise import (
            Createcurve, sqExp, sq_exp)

        assert sqExp is sq_exp
        x, y = Createcurve(False, nx=40, x0=[-3, 3], corr=0.2)
        assert x.shape == (40,) and np.all(np.isfinite(np.asarray(y)))
        assert float(x[0]) == -3.0 and float(x[-1]) == 3.0
        # the curve must have the requested correlation scale: nearby
        # samples similar, distant ones decorrelated
        yn = np.asarray(y)
        assert np.std(yn) > 0.0
