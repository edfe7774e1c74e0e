"""Drop-in migration layer: the reference's class-based API.

Users of msambridge/waveform-ot can keep their calling code: ``OTpdf``,
``waveformFP``, module-level ``wasser``/``MargWasserstein``/
``SlicedWasserstein`` here mirror the reference signatures
(libs/OTlib.py:82-163,596-741,1055-1318; libs/FingerprintLib.py:48-180) and
delegate to the functional TPU-native core. These wrappers are eager-mode
conveniences — for jit/vmap/grad pipelines use the functional API
(waveform_ot_tpu.ops / .inversion) directly.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from waveform_ot_tpu.ops import errors
from waveform_ot_tpu.ops.fingerprint import (
    FingerprintSpec, density_from_distance, distance_field, grid_axes,
    make_window, normalize_vertices,
)
from waveform_ot_tpu.ops.marginal import marg_wasserstein as _marg
from waveform_ot_tpu.ops.otpdf import (
    make_density_1d, make_density_2d, marginals, validate_density,
)
from waveform_ot_tpu.ops.sliced import (
    project_sliced, sliced_wasserstein as _sliced,
)
from waveform_ot_tpu.ops.wasser import (
    check_common_cdf, transport_plan_1d, transport_plan_jacobian,
    wasser as _wasser,
)


class OTpdf:
    """Reference-compatible PDF container (OTlib.py:82-163).

    Construct with a (amplitudes, locations) tuple; normalization, CDF and
    1D/2D detection happen immediately; ``setMarginals``/``setSliced``
    populate ``.marg``/``.proj`` like the reference.
    """

    def __init__(self, pdf):
        f, x = pdf
        validate_density(f, x)
        self._d = make_density_2d(jnp.asarray(f), jnp.asarray(x)) \
            if np.ndim(f) == 2 else make_density_1d(jnp.asarray(f),
                                                    jnp.asarray(x))
        self.ndim = 2 if np.ndim(f) == 2 else 1
        self.type = "2D" if self.ndim == 2 else "1D"
        self.amp = float(self._d.amp)
        self.pdf = np.asarray(self._d.pdf)
        self.x = np.asarray(self._d.x)
        if self.ndim == 2:
            self.nx, self.ny = self.pdf.shape
            self.n = self.nx * self.ny
        else:
            self.n = self.pdf.shape[0]
            self.cdf = np.asarray(self._d.cdf)
        self.calcmarg = True
        self.calcproj = True
        self.nproj = 0

    @property
    def density(self):
        """The underlying functional pytree (Density1D/Density2D)."""
        return self._d

    def setMarginals(self):
        if self.type != "2D":
            raise errors.TargetSource2DShapeError()
        mt, mu = marginals(self._d)
        self.marg = [OTpdf((np.asarray(mt.pdf), np.asarray(mt.x))),
                     OTpdf((np.asarray(mu.pdf), np.asarray(mu.x)))]
        self.angles = np.array([0.0, np.pi / 2])
        self.calcmarg = False

    def setSliced(self, Nproj, org):
        if self.type != "2D":
            raise errors.TargetSource2DShapeError()
        pr = project_sliced(self._d, Nproj, org)
        self.nproj = Nproj
        self.origin = org
        self.proj = [OTpdf((np.asarray(pr.f_sorted[i]),
                            np.asarray(pr.x_sorted[i])))
                     for i in range(Nproj)]
        self.psorted = np.asarray(pr.psorted)
        self.angles = np.asarray(pr.angles)
        self.calcproj = False


def wasser(source: OTpdf, target: OTpdf, distfunc="W12", derivatives=False,
           returnplan=False, checkCommonCDF=False,
           ignoreCommonCDFerror=False, **_ignored):
    """Reference-compatible wasser (OTlib.py:596-741 signature subset)."""
    if checkCommonCDF or derivatives:
        try:
            check_common_cdf(source.pdf * source.amp,
                             target.pdf * target.amp)
        except errors.TargetSourceCDFError:
            if not ignoreCommonCDFerror:
                raise
    out = _wasser(source.density, target.density, distfunc=distfunc,
                  derivatives=derivatives)
    out = [np.asarray(v) if hasattr(v, "shape") and v.shape else float(v)
           for v in out]
    if returnplan:
        f = source.pdf * source.amp
        g = target.pdf * target.amp
        out.append(np.asarray(transport_plan_1d(
            jnp.asarray(f), jnp.asarray(source.x),
            jnp.asarray(g), jnp.asarray(target.x))))
        if derivatives:
            out.append(np.asarray(transport_plan_jacobian(
                jnp.asarray(f), jnp.asarray(source.x),
                jnp.asarray(g), jnp.asarray(target.x))))
    return out


def MargWasserstein(source: OTpdf, target: OTpdf, distfunc="W2",
                    derivatives=False, returnmargW=False, **_ignored):
    """Reference-compatible MargWasserstein (OTlib.py:1055-1154)."""
    out = _marg(source.density, target.density, distfunc=distfunc,
                derivatives=derivatives, returnmargW=returnmargW)

    def conv(v):
        if isinstance(v, list):
            return [conv(u) for u in v]
        a = np.asarray(v)
        return a if a.shape else float(a)

    return [conv(v) for v in out]


def SlicedWasserstein(source: OTpdf, target: OTpdf, Nproj, distfunc="W2",
                      derivatives=False, returnplan=False,
                      origin=(0.5, 0.5), **_ignored):
    """Reference-compatible SlicedWasserstein (OTlib.py:1156-1318 subset)."""
    out = _sliced(source.density, target.density, Nproj, distfunc=distfunc,
                  derivatives=derivatives, returnplan=returnplan,
                  origin=origin)
    return [np.asarray(v) if hasattr(v, "shape") and v.shape else float(v)
            for v in out]


def wasserNumInt(source: OTpdf, target: OTpdf):
    """Reference-compatible wasserNumInt (OTlib.py:854-874): brute-force
    (W1, W2^2) by inverse-CDF sampling. Validation oracle."""
    from waveform_ot_tpu.ops.validate import wasserstein_numint

    return wasserstein_numint(source.pdf * source.amp, source.x,
                              target.pdf * target.amp, target.x)


def Wasser_LinProg(source: OTpdf, target: OTpdf, distfunc="W1",
                   maxiter: int = 5000, **_ignored):
    """Reference-compatible Wasser_LinProg (OTlib.py:465-506): exact W by
    scipy linear programming. Returns (W, plan)."""
    from waveform_ot_tpu.ops.validate import cost_matrix, linprog_plan

    p = 1 if distfunc == "W1" else 2
    H = linprog_plan(source.pdf, source.x, target.pdf, target.x, p=p,
                     maxiter=maxiter)
    W = float(np.sum(cost_matrix(source.x, target.x, p) * H))
    return W, H


def wasser_find_optplan(source: OTpdf, target: OTpdf, W, distfunc="W2",
                        **_ignored):
    """Reference-compatible wasser_find_optplan (OTlib.py:876-904):
    recover the optimal plan from a known W value by bounded least
    squares."""
    from waveform_ot_tpu.ops.validate import find_plan_from_w

    p = 1 if distfunc == "W1" else 2
    return find_plan_from_w(source.pdf, source.x, target.pdf, target.x,
                            float(W), p=p)


def Sinkhorn(source: OTpdf, target: OTpdf, gamma: float = 0.005,
             iter: int = 250, **_ignored):
    """Reference-compatible Gaussian-kernel Sinkhorn (OTlib.py:956-967).
    Returns (distance, v, w) scaling fields like the reference."""
    from waveform_ot_tpu.ops.sinkhorn import sinkhorn_gaussian

    d, v, w = sinkhorn_gaussian(jnp.asarray(source.pdf),
                                jnp.asarray(target.pdf), gamma=gamma,
                                iters=iter)
    return float(d), np.asarray(v), np.asarray(w)


def Sinkhorn_MS(sou: OTpdf, tar: OTpdf, gamma: float = 5e-4,
                maxiters: int = 5001, **_ignored):
    """Reference-compatible dense-kernel Sinkhorn (OTlib.py:969-1011).
    Returns (W^p estimate, plan)."""
    from waveform_ot_tpu.ops.sinkhorn import sinkhorn_dense

    d, pi = sinkhorn_dense(sou.density, tar.density, gamma=gamma,
                           iters=maxiters)
    return float(d), np.asarray(pi)


def wasserPOT(source: OTpdf, target: OTpdf, distfunc="W2", **kw):
    """Reference-compatible POT bridge (OTlib.py:906-928). Runs on the
    built-in native exact-EMD solver when POT is absent; pass
    ``backend='pot'`` for the reference's raise-when-absent behaviour."""
    from waveform_ot_tpu.ops.pot_bridge import wasser_pot

    return wasser_pot(source.density, target.density, distfunc=distfunc,
                      **kw)


def sinkhornPOT(source: OTpdf, target: OTpdf, distfunc="W2", **kw):
    """Reference-compatible POT Sinkhorn (OTlib.py:1015-1053)."""
    from waveform_ot_tpu.ops.pot_bridge import sinkhorn_pot

    return sinkhorn_pot(source.density, target.density, distfunc=distfunc,
                        **kw)


def barypath_pointmass(source: OTpdf, target: OTpdf, weights):
    """Reference-compatible barypath_pointmass (OTlib.py:743-786):
    (amplitudes, positions) lists with the original pdfs substituted at the
    endpoints."""
    from waveform_ot_tpu.ops.barycenter import barycenter_pointmass

    amps, xs = barycenter_pointmass(source.density, target.density,
                                    weights, include_endpoints=True)
    return [np.asarray(a) for a in amps], [np.asarray(x) for x in xs]


def barypath(source: OTpdf, target: OTpdf, weights, npoints: int = 50000,
             returntaxis: bool = False, pointmass: bool = False):
    """Reference-compatible barypath (OTlib.py:788-852): continuous
    displacement interpolation (or the pointmass (k, 2, m) array form)."""
    from waveform_ot_tpu.ops.barycenter import (
        barycenter_continuous, barycenter_pointmass,
    )

    if pointmass:
        xs, dtk = barycenter_pointmass(source.density, target.density,
                                       weights)
        out = np.stack([np.asarray(xs),
                        np.broadcast_to(np.asarray(dtk), xs.shape)], axis=1)
        return out
    out = barycenter_continuous(source.density, target.density, weights,
                                npoints=npoints, return_taxis=returntaxis)
    if returntaxis:
        return np.asarray(out[0]), np.asarray(out[1])
    return np.asarray(out)


class waveformFP:
    """Reference-compatible fingerprint object (FingerprintLib.py:48-180).

    Holds the waveform, window and — after ``calcpdf`` — the distance field
    ``dfield``, density ``pdf``, nearest-segment data ``irays``/``lrays``
    and grid positions ``pos``, all as NumPy arrays like the reference.
    """

    def __init__(self, t, w, grid, fpgrid=None, theta=45.0, tantheta=1.0):
        (t0, t1, u0, u1, nug, ntg) = grid
        self.nt = len(t)
        self.ntg = int(ntg)
        self.nug = int(nug)
        self.tlim = (t0, t1)
        self.ulim = (u0, u1)
        kw = {"tantheta": tantheta} if tantheta != 1.0 else {"theta": theta}
        self._win = make_window(t0, t1, u0, u1, **kw)
        self.tant = float(self._win.tantheta)
        self.theta = float(np.rad2deg(np.arctan(self.tant)))
        self._spec = FingerprintSpec(nu=self.nug, ntg=self.ntg)
        self._t = jnp.asarray(t)
        self._w = jnp.asarray(w)
        self._fpbox = None if fpgrid is None else tuple(fpgrid[0:4])
        delt = self.tant * (t1 - t0)
        self.tlimn = ((t[0] - t0) / delt, (t[-1] - t0) / delt)
        self.p = np.array([np.asarray(t), np.asarray(w)]).T
        verts = normalize_vertices(self._t, self._w, self._win)
        self.pn = np.asarray(verts)
        self.dcalc = False

    def calcpdf(self, q=None, lambdav=0.04, deriv=False, method="Enumerate",
                verbose=False, nsegs=0):
        self.lam = lambdav
        self.q = q
        verts = normalize_vertices(self._t, self._w, self._win)
        tg, ug = grid_axes(self._t, self._win, self._spec,
                           fpbox=self._fpbox)
        impl = {"Enumerate": "auto", "NNsearch": "nn"}.get(method)
        if method in ("FMM", "fmm"):
            from waveform_ot_tpu.ops.fmm import distance_field_fmm

            self.dfield = distance_field_fmm(np.asarray(self.pn[:, 0]),
                                             np.asarray(self.pn[:, 1]),
                                             np.asarray(tg), np.asarray(ug))
            self.type = "FMM"
        elif impl is None:
            raise errors.FingerprintMethodError(method)
        elif impl == "nn":
            from waveform_ot_tpu.ops.fingerprint import distance_field_nn

            fld = distance_field_nn(verts, tg, ug)
            self._store_field(fld)
            self.type = "NNs"
        else:
            fld = distance_field(verts, tg, ug, impl=impl)
            self._store_field(fld)
            self.type = "Enu"
        self.pdf = np.asarray(density_from_distance(
            jnp.asarray(self.dfield), lambdav, q=q))
        tt, uu = np.meshgrid(np.asarray(tg), np.asarray(ug))
        self.pos = np.dstack([tt, uu])
        self.dcalc = True

    def _store_field(self, fld):
        self._fld = fld  # full DistanceField (viz.plot_rays consumes it)
        self.dfield = np.asarray(fld.d)
        self.irays = np.asarray(fld.iclose).ravel()
        self.lrays = np.asarray(fld.lam).ravel()
