"""Unit tests for the fingerprint module (ops/fingerprint.py).

The distance field and its VJP are checked against: a freshly written NumPy
brute-force oracle, central differences, golden values captured from the
reference waveformFP (FingerprintLib.py:48-385), and the vertex-NN variant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveform_ot_tpu.ops import (
    FingerprintSpec, Window, density_from_distance, distance_field,
    distance_field_diff, distance_field_nn, fingerprint_density, grid_axes,
    make_window, normalize_vertices, point_distance, window_from_waveform,
)


def brute_force_oracle(verts, tgrid, ugrid):
    """Independent NumPy nearest-distance-to-polyline (per grid point loop-free
    but written separately from the library code)."""
    verts = np.asarray(verts)
    P = np.stack(np.meshgrid(np.asarray(tgrid), np.asarray(ugrid)), axis=-1)
    shp = P.shape[:2]
    P = P.reshape(-1, 2)
    a = verts[:-1][None]          # (1, nseg, 2)
    bseg = verts[1:][None]
    ab = bseg - a
    t = np.einsum("psk,psk->ps", P[:, None, :] - a, ab) / (ab * ab).sum(-1)
    t = np.clip(t, 0.0, 1.0)
    proj = a + t[..., None] * ab
    dist = np.linalg.norm(P[:, None, :] - proj, axis=-1)
    imin = dist.argmin(1)
    n = len(P)
    return (dist[np.arange(n), imin].reshape(shp), imin.reshape(shp),
            t[np.arange(n), imin].reshape(shp))


def small_problem(rng, nt=25, nu=16, ntg=30):
    t = np.linspace(-1.0, 2.0, nt)
    w = np.sin(4 * t) + 0.1 * rng.standard_normal(nt)
    win = make_window(t[0], t[-1], w.min() - 0.4, w.max() + 0.4)
    spec = FingerprintSpec(nu=nu, ntg=ntg)
    verts = normalize_vertices(jnp.array(t), jnp.array(w), win)
    tg, ug = grid_axes(jnp.array(t), win, spec)
    return t, w, win, spec, verts, tg, ug


class TestDistanceField:
    def test_vs_numpy_oracle(self, rng):
        _, _, _, _, verts, tg, ug = small_problem(rng)
        fld = distance_field(verts, tg, ug, impl="jnp")
        d0, i0, l0 = brute_force_oracle(verts, tg, ug)
        np.testing.assert_allclose(fld.d, d0, atol=1e-13)
        # iclose/lam can differ only at exact ties (a grid point equidistant
        # from two segments, e.g. nearest to a shared vertex), where the two
        # implementations' rounding orders differ; require agreement away
        # from ties and distance-consistency at them.
        verts_np = np.asarray(verts)
        same = np.asarray(fld.iclose) == i0
        if not same.all():
            P = np.stack(np.meshgrid(np.asarray(tg), np.asarray(ug)), -1)
            for (r, c) in zip(*np.nonzero(~same)):
                ia, ib = int(fld.iclose[r, c]), int(i0[r, c])
                for seg, lam in ((ia, float(fld.lam[r, c])),
                                 (ib, float(l0[r, c]))):
                    pr = verts_np[seg] + lam * (verts_np[seg + 1]
                                                - verts_np[seg])
                    dd = np.linalg.norm(P[r, c] - pr)
                    assert abs(dd - d0[r, c]) < 1e-10
        np.testing.assert_allclose(np.where(same, fld.lam, l0), l0,
                                   atol=1e-12)

    def test_nn_variant_matches(self, rng):
        # on smooth waveforms the vertex-NN shortcut finds the same field
        t = np.linspace(0.0, 1.0, 30)
        w = np.sin(6 * t)
        win = make_window(0.0, 1.0, -1.5, 1.5)
        spec = FingerprintSpec(nu=20, ntg=40)
        verts = normalize_vertices(jnp.array(t), jnp.array(w), win)
        tg, ug = grid_axes(jnp.array(t), win, spec)
        exact = distance_field(verts, tg, ug, impl="jnp")
        nn = distance_field_nn(verts, tg, ug)
        # NN can differ where the nearest segment is non-adjacent to the
        # nearest vertex; distances should still agree almost everywhere
        frac = np.mean(np.abs(np.asarray(exact.d - nn.d)) < 1e-12)
        assert frac > 0.97

    def test_golden_reference_field(self, golden):
        gd = golden["fp_small"]
        t = jnp.array(gd["t"])
        w = jnp.array(gd["w"])
        t0, t1, u0, u1, nu, ntg = gd["grid"]
        win = make_window(t0, t1, u0, u1)
        spec = FingerprintSpec(nu=int(nu), ntg=int(ntg))
        verts = normalize_vertices(t, w, win)
        tg, ug = grid_axes(t, win, spec)
        fld = distance_field(verts, tg, ug, impl="jnp")
        assert abs(float(fld.d.sum()) - gd["dfield_sum"]) < 1e-9
        np.testing.assert_allclose(np.asarray(fld.d[0]), gd["dfield_r0"],
                                   atol=1e-12)
        np.testing.assert_array_equal(
            np.asarray(fld.iclose.ravel()[:20]), gd["irays_head"])
        pdf = density_from_distance(fld.d, 0.04, q=None)
        assert abs(float(pdf.sum()) - gd["pdf_sum"]) < 1e-8

    def test_point_distance(self, rng):
        _, _, _, _, verts, tg, ug = small_problem(rng)
        fld = distance_field(verts, tg, ug, impl="jnp")
        tt, uu = jnp.meshgrid(tg, ug)
        pts = jnp.stack([tt.ravel(), uu.ravel()], 1)[:17]
        np.testing.assert_allclose(point_distance(verts, pts),
                                   fld.d.ravel()[:17], atol=1e-13)


class TestDerivatives:
    def test_golden_reference_vjp(self, golden):
        # cotangent of ones through the distance field ~ sum of dddy columns
        gd = golden["fp_small"]
        t = jnp.array(gd["t"])
        w = jnp.array(gd["w"])
        t0, t1, u0, u1, nu, ntg = gd["grid"]
        win = make_window(t0, t1, u0, u1)
        spec = FingerprintSpec(nu=int(nu), ntg=int(ntg))

        def total_distance(w_):
            verts = normalize_vertices(t, w_, win)
            tg, ug = grid_axes(t, win, spec)
            return jnp.sum(distance_field_diff(verts, tg, ug))

        gw = jax.grad(total_distance)(w)
        # reference stores per-grid-point (dddy0, dddy1) pairs whose scatter
        # over segments is exactly dw; their raw sums must match ours
        assert abs(float(gw.sum())
                   - (gd["dddy_sum0"] + gd["dddy_sum1"])) < 1e-9

    def test_fd_waveform_amplitudes(self, rng):
        t, w, win, spec, _, _, _ = small_problem(rng, nt=15, nu=10, ntg=18)
        tj = jnp.array(t)

        @jax.jit
        def loss(w_):
            verts = normalize_vertices(tj, w_, win)
            tg, ug = grid_axes(tj, win, spec)
            d = distance_field_diff(verts, tg, ug)
            return jnp.sum(jnp.sin(d))  # nontrivial cotangent

        g = jax.grad(loss)(jnp.array(w))
        eps = 1e-6
        for i in range(len(w)):
            wp = jnp.array(w).at[i].add(eps)
            wm = jnp.array(w).at[i].add(-eps)
            fd = (loss(wp) - loss(wm)) / (2 * eps)
            # FD breaks when the perturbation flips a nearest segment
            # (documented in the reference, FingerprintLib.py:517); the
            # random waveform here has no such flip at 1e-6.
            assert abs(float(g[i]) - float(fd)) < 1e-6

    def test_fd_window_params(self, rng):
        # window params are differentiable end-to-end (beyond the reference)
        t, w, _, spec, _, _, _ = small_problem(rng, nt=15, nu=10, ntg=18)
        tj, wj = jnp.array(t), jnp.array(w)

        @jax.jit
        def loss(u0, u1):
            win = Window(jnp.array(t[0]), jnp.array(t[-1]), u0, u1,
                         jnp.array(1.0))
            pdf, _ = fingerprint_density(tj, wj, win, spec, lambdav=0.04)
            return jnp.sum(pdf * pdf)

        u0 = jnp.array(w.min() - 0.4)
        u1 = jnp.array(w.max() + 0.4)
        g0, g1 = jax.grad(loss, argnums=(0, 1))(u0, u1)
        eps = 1e-6
        fd0 = (loss(u0 + eps, u1) - loss(u0 - eps, u1)) / (2 * eps)
        fd1 = (loss(u0, u1 + eps) - loss(u0, u1 - eps)) / (2 * eps)
        assert abs(float(g0) - float(fd0)) < 1e-6
        assert abs(float(g1) - float(fd1)) < 1e-6

    def test_density_grad_matches_reference_chain(self, golden):
        # jax.grad of sum(pdf) == reference PDFderiv with unit chainmatrix
        gd = golden["fp_small"]
        t = jnp.array(gd["t"])
        w = jnp.array(gd["w"])
        t0, t1, u0, u1, nu, ntg = gd["grid"]
        win = make_window(t0, t1, u0, u1)
        spec = FingerprintSpec(nu=int(nu), ntg=int(ntg))

        def total_pdf(w_):
            pdf, _ = fingerprint_density(t, w_, win, spec, lambdav=0.04,
                                         q=None)
            return jnp.sum(pdf)

        g = jax.grad(total_pdf)(w)
        eps = 1e-7
        for i in [0, 3, 7, 12, 20, 39]:
            fd = (total_pdf(w.at[i].add(eps))
                  - total_pdf(w.at[i].add(-eps))) / (2 * eps)
            assert abs(float(g[i]) - float(fd)) < 1e-6


class TestBatching:
    def test_vmap_traces(self, rng):
        nb, nt = 4, 20
        t = jnp.linspace(0.0, 1.0, nt)
        ws = jnp.array(rng.standard_normal((nb, nt)))
        spec = FingerprintSpec(nu=12, ntg=nt)

        def one(w):
            win = window_from_waveform(t, w)
            pdf, _ = fingerprint_density(t, w, win, spec, lambdav=0.04)
            return pdf

        batched = jax.jit(jax.vmap(one))(ws)
        for i in range(nb):
            np.testing.assert_allclose(batched[i], one(ws[i]), atol=1e-13)

    def test_vmap_grad(self, rng):
        nb, nt = 3, 16
        t = jnp.linspace(0.0, 1.0, nt)
        ws = jnp.array(rng.standard_normal((nb, nt)))
        spec = FingerprintSpec(nu=10, ntg=nt)
        win = make_window(0.0, 1.0, -3.0, 3.0)

        def loss(w):
            pdf, _ = fingerprint_density(t, w, win, spec, lambdav=0.04)
            return jnp.sum(pdf)

        gb = jax.jit(jax.vmap(jax.grad(loss)))(ws)
        for i in range(nb):
            np.testing.assert_allclose(gb[i], jax.grad(loss)(ws[i]),
                                       atol=1e-13)


class TestPallasKernel:
    """The Pallas kernel (interpret mode on CPU) must match the jnp impl
    bit-for-bit — identical arithmetic by construction."""

    def test_matches_jnp_impl(self, rng):
        _, _, _, _, verts, tg, ug = small_problem(rng, nt=40, nu=24, ntg=40)
        from waveform_ot_tpu.ops.pallas_distance import distance_field_pallas

        a = distance_field(verts, tg, ug, impl="jnp")
        b = distance_field_pallas(verts, tg, ug)
        # identical arithmetic up to reduction order (1 ulp); on TPU the
        # compiled kernel is bit-exact vs the jnp impl
        np.testing.assert_allclose(np.asarray(a.d), np.asarray(b.d),
                                   rtol=1e-12, atol=1e-15)
        same = np.asarray(a.iclose) == np.asarray(b.iclose)
        assert np.abs(np.where(same, a.lam - b.lam, 0.0)).max() < 1e-12
        # disagreements must be exact geometric ties (same distance)
        assert np.abs(np.where(same, 0.0, a.d - b.d)).max() < 1e-12
        # the VJP offset vector p - x* must agree wherever the winner does
        dv = np.asarray(a.dvec) - np.asarray(b.dvec)
        assert np.abs(np.where(same[..., None], dv, 0.0)).max() < 1e-12

    def test_odd_sizes_and_chunking(self, rng):
        # grid not a multiple of the tile, several segment chunks
        from waveform_ot_tpu.ops.pallas_distance import distance_field_pallas

        t = np.linspace(0.0, 1.0, 301)
        w = np.sin(13 * t) + 0.02 * rng.standard_normal(301)
        win = make_window(0.0, 1.0, -1.5, 1.5)
        spec = FingerprintSpec(nu=37, ntg=301)
        verts = normalize_vertices(jnp.array(t), jnp.array(w), win)
        tg, ug = grid_axes(jnp.array(t), win, spec)
        a = distance_field(verts, tg, ug, impl="jnp")
        b = distance_field_pallas(verts, tg, ug, tpts=256, sc=128)
        np.testing.assert_allclose(np.asarray(a.d), np.asarray(b.d),
                                   rtol=1e-12, atol=1e-15)
        same = np.asarray(a.iclose) == np.asarray(b.iclose)
        assert np.abs(np.where(same, 0.0, a.d - b.d)).max() < 1e-12

    def test_pallas_through_vjp(self, rng):
        # fingerprint_density(impl='pallas') carries the envelope VJP
        t, w, win, spec, _, _, _ = small_problem(rng, nt=15, nu=10, ntg=18)
        tj, wj = jnp.array(t), jnp.array(w)

        def loss(w_, impl):
            pdf, _ = fingerprint_density(tj, w_, win, spec, lambdav=0.04,
                                         impl=impl)
            return jnp.sum(pdf * pdf)

        g_jnp = jax.grad(lambda w_: loss(w_, "jnp"))(wj)
        g_pal = jax.grad(lambda w_: loss(w_, "pallas"))(wj)
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_jnp),
                                   atol=1e-13)
