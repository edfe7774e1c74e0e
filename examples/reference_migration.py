"""Drop-in migration walkthrough: reference calling code on the compat layer.

Every call below is written exactly the way msambridge/waveform-ot users
write it (OTlib / FingerprintLib class API) but runs on the TPU-native
core through waveform_ot_tpu.compat. It reproduces the reference's own
N-version self-test (OTlib.py:1428-1593): the closed-form ``wasser`` is
cross-validated against numerical integration, linear programming, the
Monge two-pointer and Sinkhorn on the same random problem, then a
fingerprint + marginal-Wasserstein pass mirrors the FingerprintLib demo.

Run: python examples/reference_migration.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import jax

if jax.default_backend() not in ("tpu",):
    jax.config.update("jax_enable_x64", True)

import numpy as np


def main() -> None:
    from waveform_ot_tpu import compat
    from waveform_ot_tpu.ops.validate import monge_1d

    rng = np.random.default_rng(61254557)  # the reference's __main__ seed
    n = 10
    f = rng.random(n)
    g = rng.random(n)
    x = np.linspace(0.0, 1.0, n)

    # --- reference calling convention: OTpdf + wasser --------------------
    source = compat.OTpdf((f, x))
    target = compat.OTpdf((g, x))
    w1, dw1, dt1, w2, dw2, dt2 = compat.wasser(source, target, "W12",
                                               derivatives=True)
    print(f"wasser:        W1 = {w1:.8f}   W2^2 = {w2:.8f}")

    # --- five independent solvers must agree (OTlib.py:1504-1593) --------
    w1n, w2n = compat.wasserNumInt(source, target)
    print(f"wasserNumInt:  W1 = {w1n:.8f}   W2^2 = {w2n:.8f}")
    wlp, H = compat.Wasser_LinProg(source, target, distfunc="W2")
    print(f"Wasser_LinProg:              W2^2 = {wlp:.8f}")
    _, c = monge_1d(f, g)
    print(f"Monge 2-ptr:                 W2^2 = {c:.8f}")
    ws, _ = compat.Sinkhorn_MS(source, target, gamma=2e-3, maxiters=800)
    print(f"Sinkhorn_MS:                 W2^2 = {ws:.8f} (entropic)")
    # LP and Monge run in host float64 and agree to 1e-8; the closed-form
    # wasser value matches them to f64 precision on CPU (tests enforce
    # <=1e-10) and to f32 precision when this demo runs on the TPU
    assert abs(wlp - c) < 1e-8
    tol = 1e-5  # f32-safe; the x64 <=1e-10 parity bar lives in tests/
    assert abs(w1n - w1) < 5e-4 and abs(w2n - w2) < 5e-4
    assert abs(wlp - w2) < tol and abs(c - w2) < tol
    assert abs(ws - w2) < 5e-3

    # transport plan consistency: marginals of H are the input pdfs
    out = compat.wasser(source, target, "W2", returnplan=True)
    Hp = out[-1]
    assert np.abs(Hp.sum(1) - source.pdf).max() < 1e-6  # f32 on TPU
    assert np.abs(Hp.sum(0) - target.pdf).max() < 1e-6
    print("plan marginals OK")

    # --- fingerprint demo: waveformFP + MargWasserstein ------------------
    t = np.linspace(0.0, 6.0, 120)
    wave_obs = np.sin(3 * t) * np.exp(-0.3 * t)
    wave_pred = np.sin(3 * (t - 0.15)) * np.exp(-0.3 * t)
    grid = (t[0], t[-1], -1.4, 1.4, 40, len(t))

    def build(wv):
        wf = compat.waveformFP(t, wv, grid)
        wf.calcpdf(lambdav=0.04, q=None)
        return wf, compat.OTpdf((wf.pdf, wf.pos))

    wf_pred, ot_pred = build(wave_pred)
    _, ot_obs = build(wave_obs)
    wvals, dw, dg = compat.MargWasserstein(ot_pred, ot_obs, distfunc="W2",
                                           derivatives=True,
                                           returnmargW=True)
    print(f"MargWasserstein: Wt = {wvals[0]:.6e}  Wu = {wvals[1]:.6e}  "
          f"dW/d(density) shape {np.shape(dw[0])}")
    assert wvals[0] > 0 and np.all(np.isfinite(dw[0]))

    sw = compat.SlicedWasserstein(ot_pred, ot_obs, 8, distfunc="W2")
    print(f"SlicedWasserstein(8): {sw[0]:.6e}")
    print("OK — reference calling code runs unchanged on the TPU core")


if __name__ == "__main__":
    main()
