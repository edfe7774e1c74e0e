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
