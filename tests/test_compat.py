"""Tests for the reference-API compatibility layer, cross-checked against
the live reference library when mounted."""

import numpy as np
import pytest

from waveform_ot_tpu import compat


@pytest.fixture()
def problem(rng):
    n = 14
    f = rng.random(n) + 0.05
    g = rng.random(n) + 0.05
    x = np.linspace(0.0, 1.0, n)
    return f, g, x


class TestCompatOTpdf:
    def test_construction_matches_reference_semantics(self, problem):
        f, g, x = problem
        src = compat.OTpdf((f, x))
        assert src.type == "1D"
        assert abs(src.amp - f.sum()) < 1e-12
        np.testing.assert_allclose(src.pdf, f / f.sum(), atol=1e-15)
        np.testing.assert_allclose(src.cdf[-1], 1.0, atol=0)

    def test_wasser_with_plan(self, problem):
        f, g, x = problem
        src = compat.OTpdf((f, x))
        tgt = compat.OTpdf((g, x + 0.01))
        out = compat.wasser(src, tgt, "W12", derivatives=True,
                            returnplan=True)
        w1, dw1, dt1, w2, dw2, dt2, H, dH = out
        assert w1 > 0 and w2 > 0
        assert H.shape == (src.n, tgt.n)
        assert dH.shape == (src.n, src.n, tgt.n)
        np.testing.assert_allclose(H.sum(1), src.pdf, atol=1e-12)

    def test_marginals_2d(self, rng):
        fs = rng.random((5, 7)) + 0.05
        xx, yy = np.meshgrid(np.linspace(0, 1, 7), np.linspace(0, 1, 5))
        pos = np.dstack([xx, yy])
        d = compat.OTpdf((fs, pos))
        d.setMarginals()
        assert d.marg[0].n == 7 and d.marg[1].n == 5
        out = compat.MargWasserstein(d, d, "W2")
        assert abs(out[0]) < 1e-12

    def test_sliced(self, rng):
        fs = rng.random((4, 4)) + 0.05
        gs = rng.random((4, 4)) + 0.05
        xx, yy = np.meshgrid(np.linspace(0, 1, 4), np.linspace(0, 1, 4))
        pos = np.dstack([xx, yy])
        s = compat.OTpdf((fs, pos))
        t = compat.OTpdf((gs, pos))
        w, dw = compat.SlicedWasserstein(s, t, 4, "W2", derivatives=True)
        assert w > 0 and dw.shape == (4, 4)


class TestCompatSolvers:
    """The reference's module-level alternative/validation solvers
    (OTlib.py:465-506, 743-852, 854-874, 876-904, 956-1011) through the
    compat layer, cross-checked against the closed-form wasser."""

    def test_numint_and_linprog_agree_with_wasser(self, problem):
        f, g, x = problem
        src = compat.OTpdf((f, x))
        tgt = compat.OTpdf((g, x + 0.01))
        w1, w2 = compat.wasser(src, tgt, "W12")
        w1n, w2n = compat.wasserNumInt(src, tgt)
        assert abs(w1n - w1) < 5e-4 and abs(w2n - w2) < 5e-4
        # LP needs equal supports (reference A_eq assumes square)
        tgt2 = compat.OTpdf((g, x))
        wlp, H = compat.Wasser_LinProg(src, tgt2, distfunc="W2")
        (w2s,) = compat.wasser(src, tgt2, "W2")
        assert abs(wlp - w2s) < 1e-8
        np.testing.assert_allclose(H.sum(1), src.pdf, atol=1e-8)
        ok, H2 = compat.wasser_find_optplan(src, tgt2, w2s, distfunc="W2")
        assert ok
        np.testing.assert_allclose(H2.sum(1), src.pdf, atol=1e-6)

    def test_sinkhorn_ms_converges_to_w2(self, problem):
        f, g, x = problem
        src = compat.OTpdf((f, x))
        tgt = compat.OTpdf((g, x))
        d, pi = compat.Sinkhorn_MS(src, tgt, gamma=2e-3, maxiters=800)
        (w2,) = compat.wasser(src, tgt, "W2")
        assert abs(d - w2) < 5e-3 * max(1.0, w2)
        assert pi.shape == (src.n, tgt.n)

    def test_sinkhorn_gaussian_runs(self, problem):
        f, g, x = problem
        src = compat.OTpdf((f, x))
        tgt = compat.OTpdf((g, x))
        d, v, w = compat.Sinkhorn(src, tgt, gamma=0.005, iter=100)
        assert np.isfinite(d) and v.shape == f.shape

    def test_barypath_forms(self, problem):
        f, g, x = problem
        src = compat.OTpdf((f, x))
        tgt = compat.OTpdf((g, x + 0.02))
        weights = [0.0, 0.5, 1.0]
        amps, xs = compat.barypath_pointmass(src, tgt, weights)
        np.testing.assert_allclose(amps[0], src.pdf, atol=1e-15)
        np.testing.assert_allclose(xs[-1], tgt.x, atol=1e-15)
        arr = compat.barypath(src, tgt, weights, pointmass=True)
        assert arr.shape[0] == 3 and arr.shape[1] == 2
        cont = compat.barypath(src, tgt, weights, npoints=2000)
        assert cont.shape == (3, 2, 2000)
        cont2, taxis = compat.barypath(src, tgt, weights, npoints=2000,
                                       returntaxis=True)
        assert taxis.shape == (2000,)

    @pytest.mark.skipif(
        not __import__("waveform_ot_tpu.native", fromlist=["available"]
                       ).available(),
        reason="native toolchain unavailable")
    def test_pot_wrappers_run_on_native_backend(self, problem):
        # wasserPOT/sinkhornPOT now fall back to the built-in C++ solvers
        # when POT is absent (see ops/pot_bridge.py); the reference's
        # raise-when-absent behaviour survives under backend='pot'
        from waveform_ot_tpu.ops import errors

        f, g, x = problem
        src = compat.OTpdf((f, x))
        tgt = compat.OTpdf((g, x))
        w = compat.wasserPOT(src, tgt)[0]
        ws = compat.sinkhornPOT(src, tgt, gamma=1e-2)[0]
        assert np.isfinite(w) and w >= 0
        assert np.isfinite(ws) and ws >= 0
        try:
            import ot  # noqa: F401
        except ImportError:
            with pytest.raises(errors.POTLibraryError):
                compat.wasserPOT(src, tgt, backend="pot")
            with pytest.raises(errors.POTLibraryError):
                compat.sinkhornPOT(src, tgt, backend="pot")


class TestCompatWaveformFP:
    def test_calcpdf_fields(self, rng):
        nt = 30
        t = np.linspace(0.0, 3.0, nt)
        w = np.sin(4 * t) + 0.05 * rng.standard_normal(nt)
        grid = (t[0], t[-1], w.min() - 0.3, w.max() + 0.3, 20, nt)
        wf = compat.waveformFP(t, w, grid)
        wf.calcpdf(lambdav=0.04)
        assert wf.dfield.shape == (20, nt)
        assert wf.pdf.shape == (20, nt)
        assert wf.irays.shape == (20 * nt,)
        assert wf.pos.shape == (20, nt, 2)

    def test_against_live_reference(self, reference_libs, rng):
        fp = reference_libs["FingerprintLib"]
        OT = reference_libs["OTlib"]
        nt = 30
        t = np.linspace(0.0, 3.0, nt)
        w = np.sin(4 * t) + 0.05 * rng.standard_normal(nt)
        grid = (t[0], t[-1], w.min() - 0.3, w.max() + 0.3, 20, nt)
        ours = compat.waveformFP(t, w, grid)
        ours.calcpdf(lambdav=0.04)
        theirs = fp.waveformFP(t, w, grid)
        theirs.calcpdf(lambdav=0.04)
        np.testing.assert_allclose(ours.dfield, theirs.dfield, atol=1e-10)
        np.testing.assert_allclose(ours.pdf, theirs.pdf, atol=1e-10)

        so = compat.OTpdf((ours.pdf, ours.pos))
        sr = OT.OTpdf((theirs.pdf, theirs.pos))
        # same fingerprint against a shifted copy, through both stacks
        w2 = np.roll(w, 2)
        o2 = compat.waveformFP(t, w2, grid)
        o2.calcpdf(lambdav=0.04)
        r2 = fp.waveformFP(t, w2, grid)
        r2.calcpdf(lambdav=0.04)
        to = compat.OTpdf((o2.pdf, o2.pos))
        tr = OT.OTpdf((r2.pdf, r2.pos))
        wo = compat.MargWasserstein(so, to, "W2", derivatives=True)
        wr = OT.MargWasserstein(sr, tr, distfunc="W2", derivatives=True)
        assert abs(wo[0] - wr[0]) <= 1e-9
        np.testing.assert_allclose(wo[1], wr[1], atol=1e-9)
