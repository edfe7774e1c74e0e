"""Tests for sliced Wasserstein, Sinkhorn variants, and barycenter paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveform_ot_tpu.ops import make_density_1d, make_density_2d, wasserstein_1d
from waveform_ot_tpu.ops.barycenter import (
    barycenter_continuous, barycenter_pointmass,
)
from waveform_ot_tpu.ops.sinkhorn import (
    gaussian_filter, sinkhorn_dense, sinkhorn_gaussian, sinkhorn_log,
)
from waveform_ot_tpu.ops.sliced import (
    project_sliced, sliced_wasserstein, sliced_wasserstein_value,
)


def make_2d(rng, nx=6, ny=7):
    f = rng.random((nx, ny)) + 0.05
    xx, yy = np.meshgrid(np.linspace(0, 1, ny), np.linspace(0, 1, nx))
    x = np.dstack([xx, yy])
    return make_density_2d(jnp.array(f), jnp.array(x))


class TestSliced:
    def test_projection_shapes_and_order(self, rng):
        d = make_2d(rng)
        pr = project_sliced(d, 5, (0.5, 0.5))
        assert pr.f_sorted.shape == (5, d.n)
        assert np.all(np.diff(np.asarray(pr.x_sorted), axis=1) >= 0)
        # mass preserved per projection
        np.testing.assert_allclose(np.asarray(pr.f_sorted.sum(1)),
                                   np.ones(5), atol=1e-12)

    def test_identity_is_zero(self, rng):
        d = make_2d(rng)
        [w] = sliced_wasserstein(d, d, 6)
        assert abs(float(w)) < 1e-12

    def test_matches_per_slice_wasser(self, rng):
        s = make_2d(rng)
        t = make_2d(rng)
        nproj = 4
        [w] = sliced_wasserstein(s, t, nproj)
        ps = project_sliced(s, nproj, (0.5, 0.5))
        pt = project_sliced(t, nproj, (0.5, 0.5))
        ws = [float(wasserstein_1d(ps.f_sorted[i], ps.x_sorted[i],
                                   pt.f_sorted[i], pt.x_sorted[i], 2))
              for i in range(nproj)]
        assert abs(float(w) - np.mean(ws)) < 1e-12

    def test_gradient_fd(self, rng):
        s = make_2d(rng, 4, 5)
        t = make_2d(rng, 4, 5)
        from waveform_ot_tpu.ops.sliced import project_sliced

        tgt = project_sliced(t, 3, (0.5, 0.5))
        u = s.pdf * s.amp

        fn = jax.jit(lambda uu: sliced_wasserstein_value(uu, s.x, tgt, 3))
        g = jax.grad(fn)(u)
        eps = 1e-6
        for idx in [(0, 0), (1, 3), (3, 4)]:
            up = u.at[idx].add(eps)
            um = u.at[idx].add(-eps)
            fd = (fn(up) - fn(um)) / (2 * eps)
            assert abs(float(g[idx]) - float(fd)) < 1e-8

    def test_plan_is_doubly_stochastic(self, rng):
        s = make_2d(rng, 4, 4)
        t = make_2d(rng, 4, 4)
        w, H = sliced_wasserstein(s, t, 3, returnplan=True)
        np.testing.assert_allclose(np.asarray(H.sum()), 1.0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(H.sum(1)),
                                   np.asarray(s.pdf.reshape(-1)), atol=1e-10)


class TestSinkhorn:
    def test_dense_converges_to_exact_w2(self, rng):
        n = 16
        f = rng.random(n) + 0.1
        g = rng.random(n) + 0.1
        x = np.linspace(0.0, 1.0, n)
        src = make_density_1d(jnp.array(f), jnp.array(x))
        tgt = make_density_1d(jnp.array(g), jnp.array(x))
        exact = float(wasserstein_1d(jnp.array(f), jnp.array(x),
                                     jnp.array(g), jnp.array(x), 2))
        dist, pi = sinkhorn_dense(src, tgt, gamma=5e-4, iters=2000)
        assert abs(float(dist) - exact) < 5e-3 * max(exact, 1e-3) + 1e-4
        # plan orientation follows the reference (rows=target, cols=source;
        # OTlib.py:1008 uses pi.T against the (src, tgt) cost)
        np.testing.assert_allclose(np.asarray(pi.sum(0)),
                                   np.asarray(src.pdf), atol=1e-6)
        np.testing.assert_allclose(np.asarray(pi.sum(1)),
                                   np.asarray(tgt.pdf), atol=1e-6)

    def test_log_matches_dense(self, rng):
        n = 12
        f = rng.random(n) + 0.1
        g = rng.random(n) + 0.1
        x = np.linspace(0.0, 1.0, n)
        src = make_density_1d(jnp.array(f), jnp.array(x))
        tgt = make_density_1d(jnp.array(g), jnp.array(x))
        d1, _ = sinkhorn_dense(src, tgt, gamma=2e-3, iters=1500)
        d2, _ = sinkhorn_log(src, tgt, gamma=2e-3, iters=1500)
        assert abs(float(d1) - float(d2)) < 1e-6

    def test_gaussian_filter_matches_scipy(self, rng):
        from scipy.ndimage import gaussian_filter as sgf

        img = rng.random((20, 24))
        ours = np.asarray(gaussian_filter(jnp.array(img), 1.5))
        ref = sgf(img, 1.5, mode="constant", truncate=32)
        np.testing.assert_allclose(ours, ref, atol=1e-10)

    def test_gaussian_sinkhorn_fixed_point(self, rng):
        # at convergence the scalings satisfy v * filter(w) == mu0 and
        # w * filter(v) == mu1 (the Sinkhorn marginal constraints,
        # OTlib.py:948-949); the identical-marginals value matches the
        # reference implementation exactly (checked live: -4.61131758
        # for this seed/config in both)
        mu = jnp.array(rng.random((12, 12)) + 0.1)
        mu = mu / mu.sum()
        dist, v, w = sinkhorn_gaussian(mu, mu, gamma=1.0, iters=200)
        np.testing.assert_allclose(np.asarray(v * gaussian_filter(w, 1.0)),
                                   np.asarray(mu), atol=1e-10)
        np.testing.assert_allclose(np.asarray(w * gaussian_filter(v, 1.0)),
                                   np.asarray(mu), atol=1e-8)


class TestBarycenter:
    def test_endpoints(self, rng):
        n = 10
        f = rng.random(n) + 0.1
        g = rng.random(n) + 0.1
        x = np.linspace(0.0, 1.0, n)
        src = make_density_1d(jnp.array(f), jnp.array(x))
        tgt = make_density_1d(jnp.array(g), jnp.array(x))
        pos, mass = barycenter_pointmass(src, tgt, [0.0, 0.5, 1.0])
        # endpoint supports live on the original supports
        # and masses sum to 1
        np.testing.assert_allclose(float(mass.sum()), 1.0, atol=1e-12)
        # midpoint transport cost halves the distance in position space
        w2 = float(wasserstein_1d(jnp.array(f), jnp.array(x),
                                  jnp.array(g), jnp.array(x), 2))
        mid_cost = float(jnp.sum(mass * (pos[0] - pos[2]) ** 2))
        assert abs(mid_cost - w2) < 1e-12

    def test_continuous_path_mass(self, rng):
        n = 30
        f = rng.random(n) + 0.1
        g = rng.random(n) + 0.1
        x = np.linspace(0.0, 1.0, n)
        src = make_density_1d(jnp.array(f), jnp.array(x))
        tgt = make_density_1d(jnp.array(g), jnp.array(x))
        path = barycenter_continuous(src, tgt, [0.25, 0.75], npoints=5000)
        assert path.shape == (2, 2, 5000)
        # integrated density along the path stays ~1
        for k in range(2):
            xk, pk = np.asarray(path[k, 0]), np.asarray(path[k, 1])
            mass = np.trapezoid(pk, xk)
            assert abs(mass - 1.0) < 0.05


class TestSlicedPlanJacobian:
    def test_fd(self, rng):
        from waveform_ot_tpu.ops.sliced import (
            sliced_plan_jacobian, sliced_wasserstein,
        )
        from waveform_ot_tpu.ops import make_density_2d

        nx = 3
        fs = rng.random((nx, nx)) + 0.1
        gs = rng.random((nx, nx)) + 0.1
        xx, yy = np.meshgrid(np.linspace(0, 1, nx), np.linspace(0, 1, nx))
        pos = np.dstack([xx, yy])
        s = make_density_2d(jnp.array(fs), jnp.array(pos))
        t = make_density_2d(jnp.array(gs), jnp.array(pos))
        nproj = 3
        dH = sliced_plan_jacobian(s, t, nproj)
        eps = 1e-7

        def plan_of(fmat):
            sd = make_density_2d(jnp.array(fmat), jnp.array(pos))
            return np.asarray(
                sliced_wasserstein(sd, t, nproj, returnplan=True)[-1])

        for k in [0, 4, 8]:
            fp = fs.copy().reshape(-1)
            fm = fs.copy().reshape(-1)
            fp[k] += eps
            fm[k] -= eps
            fd = (plan_of(fp.reshape(nx, nx))
                  - plan_of(fm.reshape(nx, nx))) / (2 * eps)
            np.testing.assert_allclose(np.asarray(dH[k]), fd, atol=5e-6)


class TestDistfuncDispatch:
    """The reference's non-string distfunc forms (OTlib.py:165-185,574-594):
    precomputed cost array, callable, tuple; plus the TPU one-hot gather."""

    @staticmethod
    def _pair(rng, n=9):
        f = rng.random(n) + 0.05
        g = rng.random(n) + 0.05
        x = np.sort(rng.random(n))
        y = np.sort(rng.random(n))
        return f, x, g, y

    def test_cost_array_matches_closed_form(self, rng):
        from waveform_ot_tpu.ops import make_density_1d
        from waveform_ot_tpu.ops.wasser import wasser

        f, x, g, y = self._pair(rng)
        src = make_density_1d(jnp.array(f), jnp.array(x))
        tgt = make_density_1d(jnp.array(g), jnp.array(y))
        cost = (x[:, None] - y[None, :]) ** 2
        w2, dw2, dt2 = wasser(src, tgt, "W2", derivatives=True)
        wf, dwf, dtf = wasser(src, tgt, cost, derivatives=True)
        assert abs(float(wf) - float(w2)) <= 1e-12
        np.testing.assert_allclose(np.asarray(dwf), np.asarray(dw2),
                                   atol=1e-12)
        assert dtf == 0.0  # reference returns 0 position deriv (OTlib.py:716)

    def test_callable_and_tuple_forms(self, rng):
        from waveform_ot_tpu.ops import make_density_1d
        from waveform_ot_tpu.ops.wasser import wasser

        f, x, g, y = self._pair(rng)
        src = make_density_1d(jnp.array(f), jnp.array(x))
        tgt = make_density_1d(jnp.array(g), jnp.array(y))
        cost = np.abs(x[:, None] - y[None, :])
        (w_arr,) = wasser(src, tgt, cost)
        (w_fn,) = wasser(src, tgt, lambda i, j: abs(x[i] - y[j]))
        (w_tup,) = wasser(src, tgt, (src, tgt, cost))
        assert abs(float(w_fn) - float(w_arr)) <= 1e-12
        assert abs(float(w_tup) - float(w_arr)) <= 1e-12

    def test_bad_shape_raises(self, rng):
        from waveform_ot_tpu.ops import errors, make_density_1d
        from waveform_ot_tpu.ops.wasser import wasser

        f, x, g, y = self._pair(rng)
        src = make_density_1d(jnp.array(f), jnp.array(x))
        tgt = make_density_1d(jnp.array(g), jnp.array(y))
        with pytest.raises(errors.DistfuncShapeError):
            wasser(src, tgt, np.zeros((3, 4)))

    def test_onehot_gather_bit_identical(self, rng):
        from waveform_ot_tpu.ops.wasser import wasserstein_1d_cost

        f, x, g, y = self._pair(rng, n=12)
        cost = jnp.asarray((x[:, None] - y[None, :]) ** 2)
        w_take = wasserstein_1d_cost(jnp.array(f), jnp.array(g), cost,
                                     gather="take")
        w_hot = wasserstein_1d_cost(jnp.array(f), jnp.array(g), cost,
                                    gather="onehot")
        assert float(w_take) == float(w_hot)  # bit-exact (HIGHEST precision)


def _default_ot_backend_available() -> bool:
    from waveform_ot_tpu import native
    from waveform_ot_tpu.ops.pot_bridge import HAVE_POT

    return HAVE_POT or native.available()


def _default_fmm_backend_available() -> bool:
    from waveform_ot_tpu import native
    from waveform_ot_tpu.ops.fmm import HAVE_SKFMM

    return HAVE_SKFMM or native.available()


class TestOptionalBridges:
    """The bridges run on the native C++ solvers by default ('auto'
    backend); the reference's raise-when-absent behaviour is preserved
    for backend='pot'/'skfmm' (OTlib.py:24-28, FingerprintLib.py:139-141).
    Numerical validation of the native solvers lives in test_native.py."""

    @pytest.mark.skipif(not _default_ot_backend_available(),
                        reason="no POT and no native toolchain")
    def test_wasser_pot_runs_on_default_backend(self, rng):
        from waveform_ot_tpu.ops import make_density_1d
        from waveform_ot_tpu.ops.pot_bridge import wasser_pot

        src = make_density_1d(jnp.array(rng.random(5) + 0.1),
                              jnp.linspace(0, 1, 5))
        w, plan = wasser_pot(src, src, "W2", returnplan=True)
        assert abs(w) < 1e-10
        np.testing.assert_allclose(plan.sum(1), np.asarray(src.pdf),
                                   atol=1e-12)

    @pytest.mark.skipif(not _default_ot_backend_available(),
                        reason="no POT and no native toolchain")
    def test_sinkhorn_pot_runs_on_default_backend(self, rng):
        from waveform_ot_tpu.ops import make_density_1d
        from waveform_ot_tpu.ops.pot_bridge import sinkhorn_pot

        f = rng.random(6) + 0.1
        g = rng.random(6) + 0.1
        x = jnp.linspace(0, 1, 6)
        src = make_density_1d(jnp.array(f), x)
        tgt = make_density_1d(jnp.array(g), x)
        w, plan = sinkhorn_pot(src, tgt, "W2", returnplan=True, gamma=1e-2)
        assert np.isfinite(w) and w >= 0
        np.testing.assert_allclose(plan.sum(1), np.asarray(src.pdf),
                                   atol=1e-6)

    def test_pot_backend_raises_without_library(self, rng):
        from waveform_ot_tpu.ops import errors, make_density_1d
        from waveform_ot_tpu.ops.pot_bridge import HAVE_POT, wasser_pot

        src = make_density_1d(jnp.array(rng.random(5) + 0.1),
                              jnp.linspace(0, 1, 5))
        if HAVE_POT:
            w = wasser_pot(src, src, "W2", backend="pot")[0]
            assert abs(w) < 1e-10
        else:
            with pytest.raises(errors.POTLibraryError):
                wasser_pot(src, src, "W2", backend="pot")

    @pytest.mark.skipif(not _default_fmm_backend_available(),
                        reason="no skfmm and no native toolchain")
    def test_fmm_runs_on_default_backend(self):
        from waveform_ot_tpu.ops.fmm import distance_field_fmm

        t = np.linspace(0, 1, 10)
        w = np.sin(t)
        d = distance_field_fmm(t, w, t, np.linspace(-1, 2, 8))
        assert d.shape == (8, 10)
        assert np.all(d >= 0) and np.all(np.isfinite(d))

    def test_skfmm_backend_raises_without_library(self):
        from waveform_ot_tpu.ops import errors
        from waveform_ot_tpu.ops.fmm import HAVE_SKFMM, distance_field_fmm

        t = np.linspace(0, 1, 10)
        w = np.sin(t)
        if HAVE_SKFMM:
            d = distance_field_fmm(t, w, t, np.linspace(-1, 2, 8),
                                   backend="skfmm")
            assert d.shape == (8, 10)
        else:
            with pytest.raises(errors.FMMLibraryError):
                distance_field_fmm(t, w, t, np.linspace(-1, 2, 8),
                                   backend="skfmm")
