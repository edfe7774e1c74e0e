"""Native C++ solver validation (waveform_ot_tpu/native).

The native library replaces the reference's two optional native-code
dependencies — POT's exact EMD (libs/OTlib.py:906-928) and scikit-fmm's
fast marching (libs/FingerprintLib.py:139-152) — with self-contained C++
implementations. Oracles here:

  * scipy.optimize.linprog (exact LP) and the framework's closed-form 1-D
    solver for the EMD;
  * analytic distances (circle level set, exact polyline field) for FMM.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from waveform_ot_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _marginal_constraints(n, m):
    """(n+m, n*m) equality-constraint matrix for the transportation LP
    (row-major plan variables), shared by the linprog cross-checks."""
    A_eq = np.zeros((n + m, n * m))
    for i in range(n):
        A_eq[i, i * m:(i + 1) * m] = 1.0
    for j in range(m):
        A_eq[n + j, j::m] = 1.0
    return A_eq


class TestEMD:
    def test_matches_linprog_random_rectangular(self, rng):
        from scipy.optimize import linprog

        for _ in range(6):
            n, m = int(rng.integers(3, 14)), int(rng.integers(3, 14))
            a = rng.random(n) + 1e-3
            a /= a.sum()
            b = rng.random(m) + 1e-3
            b /= b.sum()
            C = rng.random((n, m))
            v, F = native.emd(a, b, C)
            res = linprog(C.ravel(), A_eq=_marginal_constraints(n, m),
                          b_eq=np.concatenate([a, b]), bounds=(0, None),
                          method="highs")
            assert res.success
            assert abs(v - res.fun) < 1e-10
            np.testing.assert_allclose(F.sum(1), a, atol=1e-12)
            np.testing.assert_allclose(F.sum(0), b, atol=1e-12)

    @pytest.mark.parametrize("p", [1, 2])
    def test_matches_closed_form_1d(self, rng, p):
        from waveform_ot_tpu.ops.wasser import wasserstein_1d

        n, m = 120, 90
        x = np.sort(rng.random(n))
        y = np.sort(rng.random(m))
        f = rng.random(n) + 1e-3
        f /= f.sum()
        g = rng.random(m) + 1e-3
        g /= g.sum()
        C = np.abs(x[:, None] - y[None, :]) ** p
        v, _ = native.emd(f, g, C)
        w = float(wasserstein_1d(jnp.array(f), jnp.array(x), jnp.array(g),
                                 jnp.array(y), p))
        assert abs(v - w) < 1e-12

    def test_plan_matches_1d_scatter_plan(self, rng):
        # the 1-D W2 plan is unique for generic data; the LP optimum must
        # coincide with the merged-CDF scatter plan (ops.transport_plan_1d)
        from waveform_ot_tpu.ops.wasser import transport_plan_1d

        n = 25
        x = np.sort(rng.random(n))
        y = np.sort(rng.random(n)) + 0.1
        f = rng.random(n) + 1e-2
        f /= f.sum()
        g = rng.random(n) + 1e-2
        g /= g.sum()
        C = (x[:, None] - y[None, :]) ** 2
        _, F = native.emd(f, g, C)
        H = np.asarray(transport_plan_1d(jnp.array(f), jnp.array(x),
                                         jnp.array(g), jnp.array(y)))
        np.testing.assert_allclose(F, H, atol=1e-12)

    def test_point_mass_and_degenerate(self):
        v, F = native.emd([1.0], [1.0], [[2.5]])
        assert v == 2.5 and F[0, 0] == 1.0
        # zero-mass rows/columns are tolerated
        v, F = native.emd([0.5, 0.0, 0.5], [1.0], [[1.0], [9.0], [3.0]])
        assert abs(v - 2.0) < 1e-14
        assert F[1, 0] == 0.0

    def test_input_validation(self):
        with pytest.raises(ValueError):
            native.emd([0.6, 0.4], [1.0], np.zeros((3, 1)))  # bad shape
        with pytest.raises(ValueError):
            native.emd([0.7, 0.7], [1.0], np.zeros((2, 1)))  # unbalanced
        with pytest.raises(ValueError):
            native.emd([0.0, 0.0], [0.0], np.zeros((2, 1)))  # empty mass


class TestFMM:
    def _circle(self, nu=90, ntg=110, r=0.7):
        ug = np.linspace(-1.2, 1.2, nu)
        tg = np.linspace(-1.3, 1.3, ntg)
        U, T = np.meshgrid(ug, tg, indexing="ij")
        R = np.sqrt(U * U + T * T)
        return ug, tg, R - r

    def test_smooth_level_set_accuracy(self):
        ug, tg, phi = self._circle()
        d = native.fmm_distance(phi, (ug[1] - ug[0], tg[1] - tg[0]), order=1)
        mask = np.abs(phi) < 0.4  # away from domain-boundary shadowing
        err = np.abs(d - phi)[mask]
        assert err.max() < 0.5 * (ug[1] - ug[0])  # sub-half-cell

    def test_grid_refinement_converges(self):
        errs = []
        for nu, ntg in [(60, 72), (120, 144), (240, 288)]:
            ug = np.linspace(-1.2, 1.2, nu)
            tg = np.linspace(-1.3, 1.3, ntg)
            U, T = np.meshgrid(ug, tg, indexing="ij")
            phi = np.sqrt(U * U + T * T) - 0.7
            d = native.fmm_distance(phi, (ug[1] - ug[0], tg[1] - tg[0]),
                                    order=1)
            errs.append(np.abs(d - phi)[np.abs(phi) < 0.4].max())
        assert errs[2] < errs[1] < errs[0]
        assert errs[2] < 0.45 * errs[0]  # ~first order in dx

    def test_first_order_default_beats_second_on_indicator(self):
        # the pipeline feeds a +/-1 indicator whose half-cell band init
        # makes 2nd-order extrapolation counterproductive — the documented
        # reason distance_field_fmm defaults the native backend to order 1
        ug, tg, phi = self._circle()
        ind = np.where(phi > 0, 1.0, -1.0)
        dx = (ug[1] - ug[0], tg[1] - tg[0])
        mask = np.abs(phi) < 0.4
        e1 = np.median(np.abs(np.abs(native.fmm_distance(ind, dx, order=1))
                              - np.abs(phi))[mask])
        e2 = np.median(np.abs(np.abs(native.fmm_distance(ind, dx, order=2))
                              - np.abs(phi))[mask])
        assert e1 < e2

    def test_sign_convention_and_zero_contour(self):
        ug, tg, phi = self._circle()
        d = native.fmm_distance(phi, (ug[1] - ug[0], tg[1] - tg[0]))
        assert np.all(np.sign(d[phi > 0]) > 0)
        assert np.all(np.sign(d[phi < 0]) < 0)

    def test_no_contour_raises(self):
        with pytest.raises(ValueError):
            native.fmm_distance(np.ones((6, 6)), (0.1, 0.1))

    def test_indicator_vs_exact_polyline(self, rng):
        # the reference feeds a +/-1 indicator (FingerprintLib.py:142-146);
        # accuracy is then limited by half-cell interface localization
        from waveform_ot_tpu.ops.fingerprint import distance_field

        nt, nu, ntg = 40, 120, 150
        t = np.linspace(0.0, 1.0, nt)
        w = 0.45 + 0.25 * np.sin(2 * np.pi * t)
        tg = np.linspace(0.0, 1.0, ntg)
        ug = np.linspace(0.0, 1.0, nu)
        phi = np.where(ug[:, None] > np.interp(tg, t, w)[None, :], 1.0, -1.0)
        d = np.abs(native.fmm_distance(
            phi, ((ug[-1] - ug[0]) / nu, (tg[-1] - tg[0]) / ntg)))
        verts = jnp.stack([jnp.asarray(t), jnp.asarray(w)], 1)
        exact = np.asarray(distance_field(verts, jnp.asarray(tg),
                                          jnp.asarray(ug), impl="jnp").d)
        interior = exact > 2.0 / nu  # outside the interface band
        err = np.abs(d - exact)[interior]
        assert np.median(err) < 1.5 / nu
        assert err.max() < 6.0 / nu


class TestBridges:
    """The reference-facing wrappers running on the native backend."""

    def test_wasser_pot_native_vs_linprog_2d(self, rng):
        from waveform_ot_tpu.ops import make_density_2d
        from waveform_ot_tpu.ops.pot_bridge import wasser_pot
        from scipy.optimize import linprog

        n = 9  # 3x3 grid point cloud
        gx, gy = np.meshgrid(np.linspace(0, 1, 3), np.linspace(0, 1, 3))
        pos = np.stack([gx, gy], axis=-1)
        f = rng.random((3, 3)) + 0.1
        g = rng.random((3, 3)) + 0.1
        src = make_density_2d(jnp.asarray(f), jnp.asarray(pos))
        tgt = make_density_2d(jnp.asarray(g), jnp.asarray(pos))
        w, plan, A = wasser_pot(src, tgt, "W2", returnplan=True,
                                returndist=True, backend="native")
        a = np.asarray(src.pdf).ravel()
        b = np.asarray(tgt.pdf).ravel()
        res = linprog(A.ravel(), A_eq=_marginal_constraints(n, n),
                      b_eq=np.concatenate([a, b]),
                      bounds=(0, None), method="highs")
        assert res.success
        assert abs(w - res.fun) < 1e-10

    def test_sinkhorn_pot_native_converges_to_emd(self, rng):
        from waveform_ot_tpu.ops import make_density_1d
        from waveform_ot_tpu.ops.pot_bridge import sinkhorn_pot, wasser_pot

        n = 8
        x = jnp.linspace(0, 1, n)
        f = rng.random(n) + 0.1
        g = rng.random(n) + 0.1
        src = make_density_1d(jnp.array(f), x)
        tgt = make_density_1d(jnp.array(g), x)
        w_exact = wasser_pot(src, tgt, "W2", backend="native")[0]
        w_eps = [sinkhorn_pot(src, tgt, "W2", gamma=gm, backend="native")[0]
                 for gm in (3e-2, 1e-2, 3e-3)]
        errs = [abs(w - w_exact) for w in w_eps]
        assert errs[2] < errs[0]          # tightening with gamma -> 0
        assert errs[2] < 5e-3

    def test_fmm_ray_endpoints(self):
        # reference calcFMM_dist_deriv (FingerprintLib.py:853-865): rays
        # from an FMM field around a horizontal line u=0.5 must land on
        # the line (Yw ~ 0.5) and keep their time coordinate (Xw ~ Xn)
        from waveform_ot_tpu.ops.fmm import fmm_ray_endpoints

        nu, ntg = 60, 50
        ug = np.linspace(0.0, 1.0, nu)
        tg = np.linspace(0.0, 1.0, ntg)
        d = np.abs(ug[:, None] - 0.5) * np.ones((1, ntg))
        Xw, Yw = fmm_ray_endpoints(d, (ug[1] - ug[0], tg[1] - tg[0]))
        inner = (slice(5, -5), slice(5, -5))
        assert np.abs(Yw[inner] - 0.5).max() < 0.02
        Xn = np.meshgrid(np.linspace(0, 1, ntg), np.linspace(0, 1, nu))[0]
        assert np.abs((Xw - Xn)[inner]).max() < 1e-12

    def test_fingerprint_fmm_method_end_to_end(self):
        # compat.waveformFP(method='FMM') — the reference's gated branch —
        # now runs without scikit-fmm (FingerprintLib.py:139-152 pipeline)
        from waveform_ot_tpu.compat import waveformFP

        t = np.linspace(0.0, 1.0, 60)
        w = 0.3 * np.sin(4 * np.pi * t)
        wf = waveformFP(t, w, (0.0, 1.0, -0.6, 0.6, 48, 64))
        wf.calcpdf(lambdav=0.04, method="FMM")
        assert wf.pdf.shape == (48, 64)
        assert np.all(np.isfinite(wf.pdf)) and wf.pdf.max() <= 1.0 + 1e-12
        # FMM density agrees with the exact-enumerate density away from
        # the interface-localization error
        wf2 = waveformFP(t, w, (0.0, 1.0, -0.6, 0.6, 48, 64))
        wf2.calcpdf(lambdav=0.04, method="Enumerate")
        assert np.median(np.abs(wf.pdf - wf2.pdf)) < 0.05


class TestEMDEdgeCases:
    def test_sub_eps_masses_from_fingerprint_tails(self, rng):
        # regression: normalized fingerprint densities carry exp tails
        # below 1e-14; the solver previously stranded them (status 2)
        # because its seed gate used a per-node epsilon while termination
        # tracked the global remaining mass
        from waveform_ot_tpu.ops import make_density_2d
        from waveform_ot_tpu.ops.pot_bridge import wasser_pot

        n = 12
        gx, gy = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n))
        pos = np.stack([gx, gy], axis=-1)
        d1 = (gx - 0.3) ** 2 + (gy - 0.4) ** 2
        d2 = (gx - 0.6) ** 2 + (gy - 0.5) ** 2
        src = make_density_2d(jnp.asarray(np.exp(-d1 / 0.02)),
                              jnp.asarray(pos))
        tgt = make_density_2d(jnp.asarray(np.exp(-d2 / 0.02)),
                              jnp.asarray(pos))
        assert float(np.min(np.asarray(src.pdf))) < 1e-14  # tails present
        w, plan = wasser_pot(src, tgt, "W2", returnplan=True,
                             backend="native")
        assert np.isfinite(w) and w > 0
        np.testing.assert_allclose(plan.sum(1),
                                   np.asarray(src.pdf).ravel(), atol=1e-11)
        np.testing.assert_allclose(plan.sum(0),
                                   np.asarray(tgt.pdf).ravel(), atol=1e-11)

    def test_max_iter_honored(self, rng):
        n = 30
        a = rng.random(n) + 0.01
        a /= a.sum()
        b = rng.random(n) + 0.01
        b /= b.sum()
        C = rng.random((n, n))
        with pytest.raises(RuntimeError):
            native.emd(a, b, C, max_iter=2)  # far too few augmentations
        v, _ = native.emd(a, b, C)  # default cap succeeds
        assert np.isfinite(v)

    def test_unknown_distfunc_string_raises(self, rng):
        from waveform_ot_tpu.ops import errors, make_density_1d
        from waveform_ot_tpu.ops.pot_bridge import wasser_pot

        src = make_density_1d(jnp.array(rng.random(4) + 0.1),
                              jnp.linspace(0, 1, 4))
        with pytest.raises(errors.UnknownOTDistanceTypeError):
            wasser_pot(src, src, "W12", backend="native")
