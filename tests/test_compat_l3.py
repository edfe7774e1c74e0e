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
