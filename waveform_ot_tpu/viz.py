"""Plotting suite (host-side matplotlib).

Functional equivalents of the reference's plot helpers:
  OTlib.plotWasser / plotOT1D          (OTlib.py:508-572, 1320-1378)
  FingerprintLib.plot_LS / plot_rays /
  plotMarginals / plotPDFsurface       (FingerprintLib.py:627-889)
  ricker_util.plotrickers/plotmisfit/
  plotsurface                          (ricker_util.py:106-201, 428-552)
  loc_cmt_util.plotseis/plotmisfitsection (loc_cmt_util.py:64-110, 589-655)

All functions take arrays/pytrees and an optional matplotlib Axes; they
never mutate library state and only touch matplotlib lazily so headless
TPU jobs importing the package pay nothing.
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def plot_wasser_panels(source, target, npoints: int = 2000, filename=None):
    """Six-panel CDF / inverse-CDF / transport-map figure (plotWasser)."""
    plt = _plt()
    cf, fx = np.asarray(source.cdf), np.asarray(source.x)
    cg, gx = np.asarray(target.cdf), np.asarray(target.x)
    t = np.linspace(0, 1, npoints)
    IF = np.interp(t, cf, fx)
    IG = np.interp(t, cg, gx)
    x = np.linspace(min(fx[0], gx[0]), max(fx[-1], gx[-1]), npoints)
    F = np.interp(x, fx, cf)
    IGF = np.interp(F, cg, gx)
    fig, axs = plt.subplots(3, 2, figsize=(9, 10))
    axs[0, 0].plot(fx, cf, "r", label="$F(x)$")
    axs[0, 0].plot(gx, cg, "g", label="$G(x)$")
    axs[0, 0].set_title("CDFs")
    axs[0, 0].legend()
    axs[0, 1].plot(t, IF, "r", label="$F^{-1}$")
    axs[0, 1].plot(t, IG, "g", label="$G^{-1}$")
    axs[0, 1].set_title("Inverse CDFs")
    axs[0, 1].legend()
    axs[1, 0].plot(t, np.abs(IF - IG), "k")
    axs[1, 0].set_ylabel("$|G^{-1}-F^{-1}|$")
    axs[1, 1].plot(t, (IF - IG) ** 2, "m")
    axs[1, 1].set_ylabel("$(G^{-1}-F^{-1})^2$")
    axs[2, 0].plot(x, IGF, "b", label="$G^{-1}(F(x))$")
    axs[2, 0].plot(x, x, "k:")
    axs[2, 0].set_ylabel("T(x)")
    axs[2, 0].legend()
    axs[2, 1].plot(x, (x - IGF) ** 2)
    axs[2, 1].set_ylabel("$(x-T(x))^2$")
    fig.tight_layout()
    if filename:
        fig.savefig(filename)
    return fig


def plot_transport_plan(H, source=None, target=None, filename=None):
    """1-D plan heat map with marginals (reference plotOT1D)."""
    plt = _plt()
    H = np.asarray(H)
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.imshow(H, origin="lower", aspect="auto", cmap="cubehelix_r")
    ax.set_xlabel("target index")
    ax.set_ylabel("source index")
    if filename:
        fig.savefig(filename)
    return fig


def plot_fingerprint(field, waveform_verts=None, tgrid=None, ugrid=None,
                     levels: int = 20, filename=None, title=None):
    """Level sets of the distance/density field with the waveform overlaid
    (reference plot_LS, FingerprintLib.py:627-676)."""
    plt = _plt()
    field = np.asarray(field)
    fig, ax = plt.subplots(figsize=(10, 4))
    extent = None
    if tgrid is not None and ugrid is not None:
        extent = [float(tgrid[0]), float(tgrid[-1]),
                  float(ugrid[0]), float(ugrid[-1])]
    ax.contourf(field, levels, cmap="cubehelix_r",
                extent=extent, origin="lower")
    ax.contour(field, levels, colors="grey", linewidths=0.4,
               extent=extent, origin="lower")
    if waveform_verts is not None:
        v = np.asarray(waveform_verts)
        ax.plot(v[:, 0], v[:, 1], "k-", lw=1.2)
    if title:
        ax.set_title(title)
    if filename:
        fig.savefig(filename)
    return fig


def plot_rays(fld, verts, tgrid, ugrid, stride: int = 7, filename=None):
    """Rays from grid points to their nearest waveform point
    (reference plot_rays, FingerprintLib.py:714-770)."""
    plt = _plt()
    v = np.asarray(verts)
    tt, uu = np.meshgrid(np.asarray(tgrid), np.asarray(ugrid))
    p = np.stack([tt.ravel(), uu.ravel()], 1)
    ic = np.asarray(fld.iclose).ravel()
    lam = np.asarray(fld.lam).ravel()
    xstar = v[:-1][ic] + lam[:, None] * (v[1:] - v[:-1])[ic]
    fig, ax = plt.subplots(figsize=(10, 4))
    for i in range(0, len(p), stride):
        ax.plot([p[i, 0], xstar[i, 0]], [p[i, 1], xstar[i, 1]],
                "c-", lw=0.3)
    ax.plot(v[:, 0], v[:, 1], "k-", lw=1.4)
    if filename:
        fig.savefig(filename)
    return fig


def plot_marginals(pdf2d, tgrid, ugrid, filename_prefix=None):
    """Filled time/amplitude marginal strips (reference plotMarginals)."""
    plt = _plt()
    pdf2d = np.asarray(pdf2d)
    ft = pdf2d.sum(0)
    fu = pdf2d.sum(1)
    figs = []
    for name, x, f in (("t", np.asarray(tgrid), ft),
                       ("u", np.asarray(ugrid), fu)):
        fig = plt.figure(figsize=(9, 1.2))
        plt.plot(x, f)
        plt.fill_between(x, 0, f)
        plt.xlim(x[0], x[-1])
        plt.tick_params(left=False, labelleft=False)
        if filename_prefix:
            fig.savefig(f"{filename_prefix}_marginal_{name}.png", dpi=300)
        figs.append(fig)
    return figs


def plot_transport_frames(source, target, nframes: int = 5, filename=None):
    """Displacement-interpolation frames between two 1-D densities
    (reference plot_optimal_transform_frames, OTlib.py:1380-1424)."""
    plt = _plt()
    from waveform_ot_tpu.ops.barycenter import barycenter_continuous

    import numpy as _np

    w = _np.linspace(0.0, 1.0, nframes)
    path = _np.asarray(barycenter_continuous(source, target, w,
                                             npoints=4000))
    fig, axs = plt.subplots(nframes, 1, figsize=(8, 1.6 * nframes),
                            sharex=True, squeeze=False)
    for k in range(nframes):
        x, p = path[k, 0], path[k, 1]
        axs[k, 0].fill_between(x, 0, p, alpha=0.6)
        axs[k, 0].set_ylabel(f"w={w[k]:.2f}")
    fig.tight_layout()
    if filename:
        fig.savefig(filename)
    return fig


def plot_misfit_trace(misfits, second=None, log: bool = True,
                      title="misfit vs iteration", filename=None):
    """Convergence traces (reference plotmisfit, ricker_util.py:428-454)."""
    plt = _plt()
    fig = plt.figure(figsize=(6, 4))
    plotter = plt.semilogy if log else plt.plot
    plotter(np.asarray(misfits), "co-")
    if second is not None:
        plotter(np.asarray(second), "rx-")
    plt.title(title)
    plt.xlabel("iteration")
    if filename:
        fig.savefig(filename)
    return fig


def plot_seismograms(seis, t, overlays=(), filename=None, title=None):
    """(nr, 3, nt) seismogram grid (reference plotseis,
    loc_cmt_util.py:64-110)."""
    plt = _plt()
    s = np.asarray(seis)
    if s.ndim == 2:
        s = s[None]
    nr = s.shape[0]
    fig, axs = plt.subplots(nr, 3, figsize=(12, 1.0 + 1.5 * nr),
                            sharex=True, squeeze=False)
    labels = ["North", "East", "Vertical"]
    colors = ["b", "r", "g"]
    for i in range(nr):
        for j in range(3):
            if i == 0:
                axs[0, j].set_title(labels[j])
            for ov in overlays:
                o = np.asarray(ov)
                if o.ndim == 2:
                    o = o[None]
                axs[i, j].plot(t, o[i, j], "k--", lw=0.8, alpha=0.6)
            axs[i, j].plot(t, s[i, j], color=colors[j])
    if title:
        fig.suptitle(title, y=1.02)
    fig.tight_layout()
    if filename:
        fig.savefig(filename)
    return fig


def plot_misfit_surface(values, x, y, xtrue=None, ytrue=None, filename=None,
                        xlab="x", ylab="y"):
    """3-D shaded misfit surface (reference plotsurface,
    ricker_util.py:162-200)."""
    plt = _plt()
    from matplotlib import cm
    from matplotlib.colors import LightSource

    xv, yv = np.meshgrid(np.asarray(x), np.asarray(y))
    z = np.asarray(values)
    fig = plt.figure(figsize=(10, 10))
    ax = fig.add_subplot(projection="3d")
    ls = LightSource(315, 25)
    ax.view_init(azim=-45.0, elev=55)
    ax.plot_surface(xv, yv, z, rstride=1, cstride=1, linewidth=0,
                    antialiased=True,
                    facecolors=ls.shade(z, cmap=cm.cubehelix_r,
                                        blend_mode="soft"))
    if xtrue is not None:
        ax.plot([xtrue], [ytrue], [z.max()], "r^")
    ax.set_xlabel(xlab)
    ax.set_ylabel(ylab)
    ax.set_zlabel("waveform misfit")
    if filename:
        fig.savefig(filename, dpi=300)
    return fig


def plot_misfit_section(values, xgrid, ygrid, ninterp: int = 100,
                        sol=None, filename=None, title=None):
    """Interpolated misfit contour section (reference plotmisfitsection,
    loc_cmt_util.py:589-655, one panel)."""
    plt = _plt()
    from scipy.interpolate import griddata

    xg = np.asarray(xgrid).ravel()
    yg = np.asarray(ygrid).ravel()
    X, Y = np.meshgrid(np.linspace(xg.min(), xg.max(), ninterp),
                       np.linspace(yg.min(), yg.max(), ninterp))
    Ti = griddata((xg, yg), np.asarray(values).ravel(), (X, Y),
                  method="cubic")
    fig, ax = plt.subplots(figsize=(8, 6))
    cs = ax.contourf(X, Y, Ti, 30, cmap="cubehelix_r")
    ax.contour(X, Y, Ti, 30, colors="k", linewidths=0.2)
    fig.colorbar(cs)
    ax.plot(0.0, 0.0, "ko", markersize=4)
    if sol is not None:
        ax.plot(sol[0], sol[1], "co", markersize=5)
    if title:
        ax.set_title(title)
    if filename:
        fig.savefig(filename)
    return fig
