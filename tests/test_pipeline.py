"""End-to-end pipeline parity tests against golden reference values.

The golden numbers were captured from a verified run of the reference at the
Ricker_Figs_3_8 configuration (80x512 grid, lambda=0.03, arctan transform;
see tests_golden_ref.json). Parity bar: <=1e-8 (BASELINE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveform_ot_tpu.inversion import (
    TraceConfig, build_target, calc_wasser_waveform, grid6_to_window,
    make_ricker_problem, ricker_misfit, ricker_objective,
    ricker_value_and_grad,
)
from waveform_ot_tpu.inversion.pipeline import apply_transform
from waveform_ot_tpu.models.ricker import (
    ricker_wavelet, ricker_wavelet_with_jacobian,
)


@pytest.fixture(scope="module")
def ricker_setup(golden):
    gd = golden["ricker_full"]
    grid6 = gd["grid"]
    win, spec = grid6_to_window(grid6)
    cfg = TraceConfig(nu=spec.nu, ntg=spec.ntg, lambdav=gd["lambdav"],
                      q=None, p=2, transform=True)
    tobs = jnp.array(gd["tobs"])
    wobs = jnp.array(gd["wobs"])
    targets = build_target(tobs, wobs, win, cfg, impl="jnp")
    return gd, win, cfg, targets


class TestRickerForward:
    def test_wavelet_values(self, golden):
        gd = golden["ricker_full"]
        t, w = ricker_wavelet(0.5, 1.2, 1.1, trange=(-2.0, 7.0))
        np.testing.assert_allclose(np.asarray(t), gd["tpred"], atol=1e-12)
        np.testing.assert_allclose(np.asarray(w), gd["wpred"], atol=1e-12)

    def test_wavelet_jacobian(self, golden):
        gd = golden["ricker_full"]
        _, _, dudm = ricker_wavelet_with_jacobian(0.5, 1.2, 1.1,
                                                  trange=(-2.0, 7.0))
        np.testing.assert_allclose(np.asarray(dudm), gd["dwm"], atol=1e-10)


class TestCalcWasserParity:
    def test_marginal_w_and_derivatives(self, golden, ricker_setup):
        gd, win, cfg, targets = ricker_setup
        ref = golden["ricker"]
        tpred = jnp.array(gd["tpred"])
        wpred = jnp.array(gd["wpred"])
        un, win01 = apply_transform(wpred, win, cfg)
        import dataclasses

        cfg_fp = dataclasses.replace(cfg, transform=False)
        w2M, dr, dgM = calc_wasser_waveform(
            tpred, un, win01, targets, cfg_fp, deriv=True, returnmarg=True,
            impl="jnp")
        assert abs(float(w2M[0]) - ref["Wt"]) <= 1e-8
        assert abs(float(w2M[1]) - ref["Wu"]) <= 1e-8
        assert abs(float(dgM[0]) - ref["dgt"]) <= 1e-8
        assert float(dgM[1]) == 0.0
        np.testing.assert_allclose(np.asarray(dr[0]), ref["drt"], atol=1e-8)
        np.testing.assert_allclose(np.asarray(dr[1]), ref["dru"], atol=1e-8)

    def test_objective_parity(self, golden, ricker_setup):
        gd, win, cfg, targets = ricker_setup
        ref = golden["ricker_obj"]
        prob, _ = make_ricker_problem(targets, gd["grid"], trange=(-2.0, 7.0),
                                      alpha=0.5, lambdav=gd["lambdav"])
        m = jnp.array([0.5, 1.2, 1.1])
        w2, deriv = ricker_objective(m, prob, cfg, impl="jnp")
        assert abs(float(w2) - ref["w2"]) <= 1e-8
        np.testing.assert_allclose(np.asarray(deriv), ref["deriv"], atol=1e-8)

    def test_native_autodiff_matches_reference_chain(self, golden,
                                                     ricker_setup):
        # jax.value_and_grad of the scalar objective reproduces the
        # reference's hand-assembled gradient (incl. the dg overwrite).
        gd, win, cfg, targets = ricker_setup
        ref = golden["ricker_obj"]
        prob, _ = make_ricker_problem(targets, gd["grid"], trange=(-2.0, 7.0),
                                      alpha=0.5, lambdav=gd["lambdav"])
        m = jnp.array([0.5, 1.2, 1.1])
        w2, dm = ricker_value_and_grad(m, prob, cfg, impl="jnp")
        assert abs(float(w2) - ref["w2"]) <= 1e-8
        np.testing.assert_allclose(np.asarray(dm), ref["deriv"], atol=5e-7)


class TestNoisyWavelet:
    def test_noise_modes(self):
        import jax.random as jr

        from waveform_ot_tpu.models import ricker_wavelet, ricker_wavelet_noisy

        key = jr.PRNGKey(0)
        t0, w0 = ricker_wavelet(0.0, 1.6, 1.0)
        t1, w1 = ricker_wavelet_noisy(key, 0.0, 1.6, 1.0, sigma_amp=0.0)
        np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))
        _, w2 = ricker_wavelet_noisy(key, 0.0, 1.6, 1.0, sigma_amp=0.01)
        r = np.asarray(w2 - w0)
        assert 0.0 < np.abs(r).max() < 0.1
        _, w3 = ricker_wavelet_noisy(key, 0.0, 1.6, 1.0, sigma_amp=0.01,
                                     sigma_cor=0.3)
        r3 = np.asarray(w3 - w0)
        assert abs(np.std(r3) - 0.01) < 2e-3  # GP noise scaled to std
        # correlated noise: neighboring samples strongly correlated
        c = np.corrcoef(r3[:-1], r3[1:])[0, 1]
        assert c > 0.9

    def test_periodic_kernel_registered(self):
        # the reference exposes all five myGP kernels (myGP.py:7-16);
        # 'periodic' must be in the registry and usable end-to-end
        import jax.random as jr

        from waveform_ot_tpu.models.gp_noise import (
            KERNELS, covariance, create_curve, periodic,
        )

        assert KERNELS["periodic"] is periodic
        xx = jnp.linspace(-1.0, 1.0, 64)
        K = covariance(xx, kernel=periodic, s1=0.3, rho=0.5)
        # periodicity: k(x, x') depends on sin(pi|x-x'|/period)^2, so
        # offsets one full period apart give identical covariance
        np.testing.assert_allclose(
            np.asarray(periodic(0.0, 0.25, 0.3, 0.5)),
            np.asarray(periodic(0.0, 1.25, 0.3, 0.5)), rtol=1e-12)
        assert np.allclose(np.asarray(jnp.diag(K)), 0.09)
        x, y = create_curve(jr.PRNGKey(1), nx=64, kernel=periodic,
                            jitter=1e-8)
        assert np.all(np.isfinite(np.asarray(y)))
