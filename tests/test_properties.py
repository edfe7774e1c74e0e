"""Property-based fuzzing of the core solver invariants (hypothesis).

The fixed-seed suites pin golden/parity values; these fuzz the algebraic
invariants of the 1-D Wasserstein solver and the distance field across
randomized problem shapes, sizes and supports:

  * W_p^p(f, f) = 0; values non-negative; symmetric in (source, target)
  * translation invariance; position-scale equivariance (s^p)
  * amplitude-normalization invariance (solver normalizes internally)
  * the amplitude gradient is orthogonal to the pdf (the reference's
    normalization projection, OTlib.py:1141-1147, holds identically)
  * jnp / chunked-xla distance-field impls agree exactly on random inputs
  * the native exact-EMD cost equals the closed-form 1-D solver

Derandomized (fixed database-less seeds) so CI runs are stable.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from waveform_ot_tpu.ops.wasser import wasserstein_1d

SET = dict(deadline=None, max_examples=25, derandomize=True,
           print_blob=False)


def _masses(draw, n):
    f = draw(st.lists(st.floats(1e-3, 1.0), min_size=n, max_size=n))
    return np.asarray(f)


@st.composite
def problem_1d(draw, nmax=40):
    n = draw(st.integers(3, nmax))
    m = draw(st.integers(3, nmax))
    f = _masses(draw, n)
    g = _masses(draw, m)
    # distinct sorted supports (solver semantics assume strictly
    # increasing support like the reference's OTpdf construction)
    x = np.sort(draw(st.lists(st.floats(-2.0, 2.0), min_size=n, max_size=n,
                              unique=True)))
    y = np.sort(draw(st.lists(st.floats(-2.0, 2.0), min_size=m, max_size=m,
                              unique=True)))
    return f, x, g, y


def _w(f, x, g, y, p):
    return float(wasserstein_1d(jnp.asarray(f), jnp.asarray(x),
                                jnp.asarray(g), jnp.asarray(y), p))


class TestWasserInvariants:
    @settings(**SET)
    @given(problem_1d(), st.sampled_from([1, 2]))
    def test_nonnegative_and_self_zero(self, prob, p):
        f, x, g, y = prob
        assert _w(f, x, g, y, p) >= -1e-12
        assert abs(_w(f, x, f, x, p)) < 1e-10

    @settings(**SET)
    @given(problem_1d(), st.sampled_from([1, 2]))
    def test_symmetric(self, prob, p):
        f, x, g, y = prob
        a = _w(f, x, g, y, p)
        b = _w(g, y, f, x, p)
        assert abs(a - b) <= 1e-9 * max(1.0, abs(a))

    @settings(**SET)
    @given(problem_1d(), st.sampled_from([1, 2]),
           st.floats(-3.0, 3.0))
    def test_translation_invariant(self, prob, p, c):
        f, x, g, y = prob
        a = _w(f, x, g, y, p)
        b = _w(f, x + c, g, y + c, p)
        assert abs(a - b) <= 1e-8 * max(1.0, abs(a))

    @settings(**SET)
    @given(problem_1d(), st.sampled_from([1, 2]),
           st.floats(0.1, 4.0))
    def test_position_scale_equivariant(self, prob, p, s):
        f, x, g, y = prob
        a = _w(f, s * x, g, s * y, p)
        b = (s**p) * _w(f, x, g, y, p)
        assert abs(a - b) <= 1e-8 * max(1.0, abs(b))

    @settings(**SET)
    @given(problem_1d(), st.sampled_from([1, 2]),
           st.floats(0.1, 50.0))
    def test_amplitude_normalization_invariant(self, prob, p, s):
        f, x, g, y = prob
        a = _w(f, x, g, y, p)
        b = _w(s * f, x, g, y, p)
        assert abs(a - b) <= 1e-9 * max(1.0, abs(a))

    @settings(**SET)
    @given(problem_1d())
    def test_amplitude_gradient_orthogonal_to_pdf(self, prob):
        # the reference's normalization projection (dwp -= dwp.pdf;
        # OTlib.py:1141-1147) is built into the closed-form adjoint:
        # grad_f W . f == 0 for unnormalized amplitudes f
        import jax

        f, x, g, y = prob
        grad = jax.grad(wasserstein_1d, argnums=0)(
            jnp.asarray(f), jnp.asarray(x), jnp.asarray(g),
            jnp.asarray(y), 2)
        dot = float(jnp.dot(grad, jnp.asarray(f)))
        scale = float(jnp.max(jnp.abs(grad)) * np.max(f)) + 1e-30
        assert abs(dot) <= 1e-8 * max(1.0, scale)


class TestDistanceFieldInvariants:
    @st.composite
    @staticmethod
    def field_problem(draw):
        nt = draw(st.integers(3, 20))
        ntg = draw(st.integers(4, 24))
        nu = draw(st.integers(4, 24))
        w = draw(st.lists(st.floats(0.05, 0.95), min_size=nt, max_size=nt))
        return np.asarray(w), ntg, nu

    @settings(**{**SET, "max_examples": 10})  # 2 jit compiles per shape
    @given(field_problem())
    def test_impls_agree_and_basic_bounds(self, prob):
        from waveform_ot_tpu.ops.fingerprint import distance_field

        w, ntg, nu = prob
        nt = w.shape[0]
        t = jnp.linspace(0.0, 1.0, nt)
        verts = jnp.stack([t, jnp.asarray(w)], axis=1)
        tg = jnp.linspace(0.0, 1.0, ntg)
        ug = jnp.linspace(0.0, 1.0, nu)
        a = distance_field(verts, tg, ug, impl="jnp")
        b = distance_field(verts, tg, ug, impl="xla", chunk=4)
        # The two program structures may contract (FMA) differently, so at
        # EXACT geometric ties a 1-ulp dsq difference can flip the argmin
        # (hypothesis found such inputs: symmetric waveforms + grid points
        # equidistant to two segments). The invariant is: distances always
        # agree to ulp, and the winner differs only where it is a tie.
        ad, bd = np.asarray(a.d), np.asarray(b.d)
        ai, bi = np.asarray(a.iclose), np.asarray(b.iclose)
        np.testing.assert_allclose(ad, bd, rtol=0, atol=1e-14)
        agree = ai == bi
        assert np.all(np.abs(ad - bd)[~agree] <= 1e-14)  # ties only
        np.testing.assert_allclose(np.asarray(a.lam)[agree],
                                   np.asarray(b.lam)[agree],
                                   rtol=0, atol=1e-13)
        assert np.all(np.asarray(a.d) >= 0)
        assert np.asarray(a.iclose).min() >= 0
        assert np.asarray(a.iclose).max() <= nt - 2
        # every distance is bounded by the distance to the nearest vertex
        tt, uu = np.meshgrid(np.asarray(tg), np.asarray(ug))
        p = np.stack([tt, uu], -1)[:, :, None, :]
        vd = np.sqrt(((p - np.asarray(verts)[None, None]) ** 2).sum(-1))
        assert np.all(np.asarray(a.d) <= vd.min(-1) + 1e-12)


@pytest.mark.skipif(
    not pytest.importorskip("waveform_ot_tpu.native").available(),
    reason="native toolchain unavailable")
class TestNativeEMDFuzz:
    @settings(**SET)
    @given(problem_1d(nmax=24), st.sampled_from([1, 2]))
    def test_emd_matches_closed_form(self, prob, p):
        from waveform_ot_tpu import native

        f, x, g, y = prob
        C = np.abs(x[:, None] - y[None, :]) ** p
        v, plan = native.emd(f / f.sum(), g / g.sum(), C)
        w = _w(f, x, g, y, p)
        assert abs(v - w) <= 1e-9 * max(1.0, abs(w))
        np.testing.assert_allclose(plan.sum(1), f / f.sum(), atol=1e-12)
        np.testing.assert_allclose(plan.sum(0), g / g.sum(), atol=1e-12)


class TestMarginalSlicedInvariants:
    """2-D layer invariants: marginal and sliced Wasserstein."""

    @st.composite
    @staticmethod
    def density_2d(draw):
        nx = draw(st.integers(3, 8))
        ny = draw(st.integers(3, 8))
        f = draw(st.lists(st.floats(1e-2, 1.0), min_size=nx * ny,
                          max_size=nx * ny))
        return np.asarray(f).reshape(nx, ny)

    @settings(**{**SET, "max_examples": 15})
    @given(density_2d())
    def test_marginal_self_distance_zero(self, f):
        from waveform_ot_tpu.ops import make_density_1d
        from waveform_ot_tpu.ops.marginal import marg_wasserstein_value

        nx, ny = f.shape
        tg = jnp.linspace(0.0, 1.0, ny)
        ug = jnp.linspace(0.0, 1.0, nx)
        u2d = jnp.asarray(f)
        tt = make_density_1d(jnp.sum(u2d, axis=0), tg)
        tu = make_density_1d(jnp.sum(u2d, axis=1), ug)
        wt, wu = marg_wasserstein_value(u2d, tg, ug, tt, tu, p=2)
        assert abs(float(wt)) < 1e-12 and abs(float(wu)) < 1e-12

    @st.composite
    @staticmethod
    def density_2d_pair(draw):
        nx = draw(st.integers(3, 8))
        ny = draw(st.integers(3, 8))
        f = draw(st.lists(st.floats(1e-2, 1.0), min_size=nx * ny,
                          max_size=nx * ny))
        g = draw(st.lists(st.floats(1e-2, 1.0), min_size=nx * ny,
                          max_size=nx * ny))
        return (np.asarray(f).reshape(nx, ny),
                np.asarray(g).reshape(nx, ny))

    @settings(**{**SET, "max_examples": 15})
    @given(density_2d_pair())
    def test_sliced_nonneg_symmetric_and_zero_on_self(self, pair):
        from waveform_ot_tpu.ops import make_density_2d
        from waveform_ot_tpu.ops.sliced import sliced_wasserstein

        f, g = pair
        nx, ny = f.shape
        xx, yy = np.meshgrid(np.linspace(0, 1, ny), np.linspace(0, 1, nx))
        pos = jnp.asarray(np.dstack([xx, yy]))
        s = make_density_2d(jnp.asarray(f), pos)
        t = make_density_2d(jnp.asarray(g), pos)
        [w_st] = sliced_wasserstein(s, t, 4)
        [w_ts] = sliced_wasserstein(t, s, 4)
        [w_ss] = sliced_wasserstein(s, s, 4)
        assert float(w_st) >= -1e-12
        assert abs(float(w_st) - float(w_ts)) <= 1e-9 * max(1.0, float(w_st))
        assert abs(float(w_ss)) < 1e-12
