"""Receiver-function fingerprint demo (the FingerprintLib ``__main__`` flow).

Rebuilds the reference's self-demo (libs/FingerprintLib.py:893-1047): a
synthetic receiver-function-style waveform, its 800x600 fingerprint
density by BOTH methods — the exact polyline distance field (Enumerate;
jnp/xla/pallas here) and fast marching from the +/-1 indicator (the
reference needs scikit-fmm; here the built-in native C++ solver runs it)
— with the phi/level-set/ray plots and the field statistics printout.

Run: python examples/receiver_function_demo.py [--small]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import numpy as np
import jax


def main(small: bool = False, outdir: str = "/tmp") -> None:
    if small:
        # the small config is a smoke-scale run; CPU avoids paying the
        # remote-TPU compile for an 80x60 grid (sitecustomize pins the
        # TPU plugin, so the config API is the only way to override)
        jax.config.update("jax_platforms", "cpu")
    from waveform_ot_tpu.compat import waveformFP
    from waveform_ot_tpu.ops.fmm import (
        distance_field_fmm, fmm_ray_endpoints, signed_indicator,
    )
    from waveform_ot_tpu import viz

    # synthetic RF waveform (FingerprintLib.py:932-936)
    nt = 63 if small else 626
    t = np.linspace(0.0, 1.0, nt)
    RF = 2 * np.sin(t * 6 * np.pi) - 3 * np.cos((2 * t + 0.30) * 2 * np.pi)
    du = RF.max() - RF.min()
    u0, u1 = RF.min() - 0.15 * du, RF.max() + 0.15 * du
    nu, ntg = (80, 60) if small else (800, 600)
    lambdav = 0.04

    wf = waveformFP(t, RF, (t[0], t[-1], u0, u1, nu, ntg))

    # exact polyline field (the reference's Enumerate branch; Pallas on TPU)
    t0 = time.time()
    wf.calcpdf(lambdav=lambdav, method="Enumerate")
    t_exact = time.time() - t0
    d_exact = np.asarray(wf.dfield)

    # fast marching from the indicator (reference fmm=True branch;
    # native C++ solver replaces skfmm)
    tgrid = np.linspace(0.0, 1.0, ntg)
    ugrid = np.linspace(0.0, 1.0, nu)
    tn = (t - t[0]) / (t[-1] - t[0])
    un = (RF - u0) / (u1 - u0)
    t0 = time.time()
    d_fmm = distance_field_fmm(tn, un, tgrid, ugrid)
    t_fmm = time.time() - t0

    pdf = np.asarray(wf.pdf)
    print(f" Lambda  {lambdav}\n Nt      {ntg}\n Nu      {nu}")
    print(f" Dmin    {d_exact.min():.6f}\n Dmax    {d_exact.max():.6f}")
    print(f" PDFmin  {pdf.min():.3e}\n PDFmax  {pdf.max():.6f}")
    print(f"\n exact polyline field : {t_exact:.3f} s "
          f"(impl={'pallas/TPU' if jax.default_backend() == 'tpu' else 'jnp/CPU'})")
    print(f" native fast marching : {t_fmm:.3f} s")
    err = np.abs(d_fmm - d_exact)
    band = d_exact > 2.0 / nu
    print(f" FMM vs exact: median |diff| {np.median(err[band]):.5f}, "
          f"max {err[band].max():.5f} (grid cell {1.0 / nu:.5f})")

    # the reference demo's figures: phi level sets, distance/PDF level
    # sets, rays back to the waveform (plot_phi / plot_LS / plot_rays)
    out = pathlib.Path(outdir)
    phi = signed_indicator(tn, un, tgrid, ugrid)
    viz.plot_phi(tn, un, tgrid, ugrid, phi=phi,
                 filename=str(out / "rf_phi.png"))
    verts = np.stack([tn, un], axis=1)
    viz.plot_fingerprint(d_exact, waveform_verts=verts, tgrid=tgrid,
                         ugrid=ugrid, filename=str(out / "rf_dfield.png"))
    viz.plot_fingerprint(pdf, waveform_verts=verts, tgrid=tgrid,
                         ugrid=ugrid, filename=str(out / "rf_pdf.png"))
    fld = wf._fld  # rays from the exact field (irays/lrays)
    viz.plot_rays(fld, verts, tgrid, ugrid,
                  filename=str(out / "rf_rays.png"))
    Xw, Yw = fmm_ray_endpoints(d_fmm, ((ugrid[-1] - ugrid[0]) / nu,
                                       (tgrid[-1] - tgrid[0]) / ntg))
    print(f" FMM ray endpoints span t [{Xw.min():.3f}, {Xw.max():.3f}], "
          f"u [{Yw.min():.3f}, {Yw.max():.3f}]")
    print(f" figures -> {out}/rf_*.png")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="downsampled waveform + 80x60 grid")
    ap.add_argument("--outdir", default="/tmp")
    a = ap.parse_args()
    main(small=a.small, outdir=a.outdir)
