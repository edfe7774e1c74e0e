"""Drop-in migration layer for the reference's ``loc_cmt_util`` module.

Reference users write ``from libs import loc_cmt_util as lc``; pointing that
import here (``from waveform_ot_tpu import compat_loc_cmt as lc``) keeps
their calling code working: every public name of loc_cmt_util.py (the
pyprop8 forward wrapper, the scipy ``optfunc``/``optfunc_L2``/``optfunc_OT``
objectives, the OT-object builders, moment-tensor helpers, the
``opt_history`` blackboard of loc_cmt_util_opt.py, analysis and plotting,
pickle I/O) exists with the reference signature and delegates to the
functional TPU-native core.

The physics behind ``prop8seis`` is the framework's own on-device layered-
medium forward (models/layered.py — differentiable f-k synthesis, Fukuoka
six-layer crust by default) instead of host pyprop8; its derivative array
is produced by ``jax.jacfwd`` but laid out exactly like pyprop8's
(``(nr, nderiv, nc, nt)``, diag-first moment-tensor channel order,
receiver-depth z sign) so the reference's ``drv_rpd2xyz`` chain — live
parity-tested in models/pyprop8_bridge.py — consumes it unchanged.

Eager-mode convenience only — jit/vmap/grad pipelines should use
``waveform_ot_tpu.inversion.loc_cmt`` directly.

Reference: /root/reference/libs/loc_cmt_util.py:28-702,
loc_cmt_util_opt.py:9-12. Requires jax_enable_x64 (the layered f-k solve
runs its stack algebra in float64 — see models/layered.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from waveform_ot_tpu.compat import MargWasserstein, OTpdf, waveformFP
from waveform_ot_tpu.inversion.analysis import check_convergence
from waveform_ot_tpu.inversion.windows import build_windows as _build_windows
from waveform_ot_tpu.models.layered import (
    LayeredModel,
    fukuoka_model,
    layered_model_from_table,
    layered_seismograms,
)
from waveform_ot_tpu.models.pyprop8_bridge import _DIAGORDER, _drv_to_cartesian
from waveform_ot_tpu.models.seismo import (
    StationSet,
    moment_tensor_from_sdr,
    moment_tensor_ls,
    mxyz_from_upper,
)
from waveform_ot_tpu.ops.transforms import arctan_transform
from waveform_ot_tpu.utils import io as _io
from waveform_ot_tpu import viz as _viz

# -- optimisation-history blackboard (reference loc_cmt_util_opt.py:9-12) ---
# The reference keeps these in a sibling module (loc_cmt_util_opt); here
# they live on the compat module itself, like compat_ricker's Wdata/Wits.
# Notebook code that did ``lo.optdata = optdata`` assigns the module
# attribute instead: ``lc.optdata = optdata``.

opt_history: list = []
opt_history_data: list = []
optdata = []


def init():
    """Reset the history blackboard (reference loc_cmt_util_opt.init)."""
    global opt_history, opt_history_data, optdata
    opt_history, opt_history_data, optdata = [], [], []


# -- forward physics (loc_cmt_util.py:28-58) ---------------------------------

_NM2MOMENT = 1.0e-13  # Nm -> moment argument value (loc_cmt_util.py:29)


class DerivativeSwitches:
    """pyprop8-compatible derivative selector.

    Declares which derivative channels ``prop8seis`` packs into its
    ``(nr, nderiv, nc, nt)`` array and at which indices (``i_x``/``i_y``/
    ``i_z`` or ``i_r``/``i_phi``/``i_z``, plus ``i_mt`` for the six
    diag-first moment-tensor channels) — the attribute surface
    ``drv_rpd2xyz`` reads (loc_cmt_util.py:155-158, 360-383).
    """

    def __init__(self, x=False, y=False, z=False, r=False, phi=False,
                 moment_tensor=False, structure=None):
        self.x, self.y, self.z = bool(x), bool(y), bool(z)
        self.r, self.phi = bool(r), bool(phi)
        self.moment_tensor = bool(moment_tensor)
        self.structure = structure
        self.spherical = self.r or self.phi
        self.has_loc = self.spherical or self.x or self.y or self.z
        n = 0
        if self.spherical:
            self.i_r, self.i_phi, self.i_z = 0, 1, 2
            n = 3
        elif self.has_loc:
            self.i_x, self.i_y, self.i_z = 0, 1, 2
            n = 3
        self.i_mt = n
        self.nderiv = n + (6 if self.moment_tensor else 0)


class _Source:
    """Lightweight stand-in for pp.PointSource (the attributes the
    notebooks read: location and ``Mxyz`` with a leading source axis,
    as consumed by ``setmref``)."""

    def __init__(self, x, y, z, Mxyz):
        self.x, self.y, self.z = float(x), float(y), float(z)
        self.Mxyz = np.asarray(Mxyz)[np.newaxis]


class _Stations:
    """Lightweight stand-in for pp.ListOfReceivers: receiver coordinates
    plus the source-relative range ``rr`` and ccw-from-x azimuth ``pp``
    that ``drv_rpd2xyz`` uses for the spherical chain."""

    def __init__(self, recx, recy, x, y):
        self.xx = np.asarray(recx, float)
        self.yy = np.asarray(recy, float)
        self.nstations = self.xx.size
        dx = self.xx - float(x)
        dy = self.yy - float(y)
        self.rr = np.hypot(dx, dy)
        self.pp = np.arctan2(dy, dx)


def _resolve_model(prop8data):
    """prop8data['model'] -> LayeredModel: already one, a raw layer table
    (thickness, vp, vs, rho rows), or absent -> the Fukuoka 6-layer crust
    of the Figs 9-12 notebooks."""
    model = prop8data.get("model")
    if model is None:
        return fukuoka_model()
    if isinstance(model, LayeredModel):
        return model
    return layered_model_from_table(model)


_FWD_CACHE: dict = {}


def _forward_fns(nt, timestep, nk, kmax, jac_mode="full"):
    """Jitted layered forward + jacfwd restricted to the ACTIVE parameter
    slice — 'loc' differentiates only (x, y, z), 'mt' only the six m6
    components, 'full' all 9 — cached per static configuration
    (model/stations ride as traced pytree arguments). The restriction
    matters: the flagship loc-only workflow would otherwise pay 9
    forward-mode columns of the f-k solve per objective call and use 3."""
    base = (int(nt), float(timestep), int(nk), float(kmax))
    if base not in _FWD_CACHE:
        def fwd(params, model, stx, sty):
            _, s = layered_seismograms(
                params[0], params[1], params[2],
                mxyz_from_upper(params[3:]),
                StationSet(x=stx, y=sty), model=model,
                nt=base[0], dt=base[1], nk=base[2], kmax=base[3])
            return s

        _FWD_CACHE[base] = {"raw": fwd, "fwd": jax.jit(fwd)}
    entry = _FWD_CACHE[base]
    if jac_mode not in entry:
        raw = entry["raw"]
        if jac_mode == "loc":
            def jacfn(params, model, stx, sty):
                f = lambda p3: raw(jnp.concatenate([p3, params[3:]]),
                                   model, stx, sty)
                return jax.jacfwd(f)(params[:3])
        elif jac_mode == "mt":
            def jacfn(params, model, stx, sty):
                f = lambda m6: raw(jnp.concatenate([params[:3], m6]),
                                   model, stx, sty)
                return jax.jacfwd(f)(params[3:])
        else:
            jacfn = jax.jacfwd(raw)
        entry[jac_mode] = jax.jit(jacfn)
    return entry["fwd"], entry[jac_mode]


def _assemble_channels(jac, drv, stations):
    """(nr, 9, nc, nt) jacobian in (x, y, z_src, m6-upper) parameter order
    -> the pyprop8 channel layout ``drv`` declares: source-z negated to the
    receiver-depth convention, cartesian optionally rotated to (r, phi)
    using the station geometry (inverting the drv_rpd2xyz chain,
    loc_cmt_util.py:363-373), moment-tensor channels reordered diag-first.
    """
    chans = []
    if drv.spherical:
        dx, dy = jac[:, 0], jac[:, 1]
        cosp = np.cos(stations.pp)
        sinp = np.sin(stations.pp)
        dr = -((dx.T) * cosp + (dy.T) * sinp).T
        dp = ((dx.T) * (sinp * stations.rr)
              - (dy.T) * (cosp * stations.rr)).T
        chans += [dr, dp, -jac[:, 2]]
    elif drv.has_loc:
        chans += [jac[:, 0], jac[:, 1], -jac[:, 2]]
    if drv.moment_tensor:
        # channel j holds d/d(m6[k]) with _DIAGORDER[k] == j
        inv = np.argsort(_DIAGORDER)
        chans += [jac[:, 3 + inv[j]] for j in range(6)]
    return np.stack(chans, axis=1)


def prop8seis(x, y, z, prop8data, Mxyz=None, drv=None, show_progress=True,
              nt=61, timestep=1.0, returndata=False):
    """Reference-signature seismogram forward (loc_cmt_util.py:28-58) on
    the on-device layered-medium physics.

    prop8data keys: 'sdrm' (strike, dip, rake, Mo[Nm]), 'recx'/'recy'
    (receiver coordinates), 'model' (LayeredModel | layer table | None ->
    Fukuoka), optional 'nk'/'kmax' wavenumber-quadrature overrides.
    Returns (t, s[, deriv][, source, stations]) with s shaped (nr, 3, nt)
    and deriv shaped (nr, drv.nderiv, 3, nt) in pyprop8's channel layout.
    """
    del show_progress  # the on-device forward has no progress bar
    strike, dip, rake, Mo = prop8data["sdrm"]
    if Mxyz is None:
        Mxyz = np.asarray(
            moment_tensor_from_sdr(strike, dip, rake, Mo * _NM2MOMENT))
    recx = np.asarray(prop8data["recx"], float).flatten()
    recy = np.asarray(prop8data["recy"], float).flatten()
    model = _resolve_model(prop8data)
    jac_mode = "full"
    if drv is not None and not (drv.has_loc and drv.moment_tensor):
        jac_mode = "loc" if drv.has_loc else "mt"
    fwd, jacf = _forward_fns(nt, timestep,
                             prop8data.get("nk", 1024),
                             prop8data.get("kmax", 2.5), jac_mode=jac_mode)
    m6 = np.asarray(Mxyz)[np.triu_indices(3)]
    params = jnp.asarray(np.concatenate([[x, y, z], m6]), jnp.float64)
    stx = jnp.asarray(recx, jnp.float64)
    sty = jnp.asarray(recy, jnp.float64)
    s = np.asarray(fwd(params, model, stx, sty))
    t = timestep * np.arange(nt)
    out = [t, s]
    if drv is not None:
        cols = np.moveaxis(np.asarray(jacf(params, model, stx, sty)), -1, 1)
        # embed the restricted columns at their positions in the 9-wide
        # (x, y, z, m6) parameter order _assemble_channels indexes
        if jac_mode == "full":
            jac = cols
        else:
            jac = np.zeros((s.shape[0], 9) + s.shape[1:], cols.dtype)
            if jac_mode == "loc":
                jac[:, :3] = cols
            else:
                jac[:, 3:] = cols
        out.append(_assemble_channels(jac, drv, _Stations(recx, recy, x, y)))
    if returndata:
        out += [_Source(x, y, z, Mxyz), _Stations(recx, recy, x, y)]
    return tuple(out)


def misfitfunc(so, sp):
    """L2 misfit between waveform arrays (loc_cmt_util.py:60-62)."""
    r = (np.asarray(so) - np.asarray(sp)).flatten()
    return float(np.dot(r, r))


def plotseis(splot, tt, splot0=None, splot1=None, splot2=None, title=None,
             filename="seis.pdf"):
    """Seismogram grid plot (loc_cmt_util.py:64-110), delegating to
    viz.plot_seismograms; accepts 1-D/2-D/3-D arrays like the reference."""

    def _3d(a):
        a = np.asarray(a)
        if a.ndim == 1:
            return a[np.newaxis, np.newaxis, :]
        if a.ndim == 2:
            return a[np.newaxis, :, :]
        return a

    overlays = [_3d(o) for o in (splot0, splot1, splot2) if o is not None]
    return _viz.plot_seismograms(_3d(splot), tt, overlays=overlays,
                                 filename=filename, title=title)


# -- scipy objectives (loc_cmt_util.py:113-306) ------------------------------


def _model_head(m_in, invopt, precon):
    """Preconditioning, parameter layout and the depth floor shared by the
    L2/OT objectives (loc_cmt_util.py:126-158)."""
    if invopt["precon"] and precon:
        m = np.asarray(m_in, float) * np.asarray(invopt["mscal"], float)
    else:
        m = np.asarray(m_in, float)
    loc, cmt = bool(invopt["loc"]), bool(invopt["cmt"])
    if loc:
        x, y, z = m[:3]
    else:
        x, y, z = np.asarray(invopt["mref"], float).ravel()[:3]
    z = max(z, 0.001)
    Mxyz = None
    if cmt:
        Mxyz = buildMxyzfromupper(m[3:] if loc else m)
    return m, loc, cmt, x, y, z, Mxyz


def _forward_and_modelderiv(x, y, z, Mxyz, prop8data, loc, cmt, geometry):
    """One forward + jacobian call; returns (t, seis_pred, derivxyz, d)
    where derivxyz is the (nm, nr, nc, nt) model-derivative array the
    reference's returnseisd/returnderiv paths hand back, and d is its
    (nm, nr*nc*nt) reshape in the (x, y, z[, 6 m6]) row order the
    objectives contract against (loc_cmt_util.py:226-236)."""
    nt = np.shape(prop8data["obs_seis"])[-1]
    timestep = prop8data.get("timestep", 1.0)
    if geometry == "cartesian":
        drv = DerivativeSwitches(x=loc, y=loc, z=loc, moment_tensor=cmt,
                                 structure=prop8data.get("model"))
    else:
        drv = DerivativeSwitches(r=loc, phi=loc, z=loc, moment_tensor=cmt,
                                 structure=prop8data.get("model"))
    t, seis_pred, deriv, _, stations = prop8seis(
        x, y, z, prop8data, Mxyz=Mxyz, drv=drv, show_progress=False,
        nt=nt, timestep=timestep, returndata=True)
    if loc:
        derivxyz = drv_rpd2xyz(drv, deriv, stations, geometry=geometry)
        nm = 9 if cmt else 3
    else:
        # cmt-only: just the six upper-triangular moment-tensor rows
        derivxyz = np.array([deriv[:, drv.i_mt + _DIAGORDER[k]]
                             for k in range(6)])
        nm = 6
    return t, seis_pred, derivxyz, derivxyz.reshape(nm, -1)


def optfunc(m, optdata, returnseis=False, return2W=False, precon=True):
    """Dispatch to the L2 or OT objective on invopt['mistype']
    (loc_cmt_util.py:113-118)."""
    invopt = optdata["invopt"]
    if invopt["mistype"] == "OT":
        return optfunc_OT(m, optdata, returnseis=returnseis,
                          return2W=return2W, precon=precon)
    if invopt["mistype"] == "L2":
        return optfunc_L2(m, optdata, returnseis=returnseis, precon=precon)
    raise ValueError(f"unknown mistype {invopt['mistype']!r}")


def optfunc_L2(m_in, optdata, returnseis=False, returnseisd=False,
               noderiv=False, geometry="cartesian", precon=True):
    """L2 objective: (misfit, d misfit/dm) via the layered forward and its
    jacobian (loc_cmt_util.py:120-184). Appends to ``opt_history_data``."""
    invopt = optdata["invopt"]
    prop8data = optdata["prop8data"]
    seis_obs = np.asarray(prop8data["obs_seis"])
    if not invopt["loc"] and not invopt["cmt"]:
        return 0.0, np.zeros_like(np.asarray(m_in, float))
    m, loc, cmt, x, y, z, Mxyz = _model_head(m_in, invopt, precon)
    t, seis_pred, derivxyz, d = _forward_and_modelderiv(
        x, y, z, Mxyz, prop8data, loc, cmt, geometry)
    dr = (seis_pred - seis_obs).flatten()
    mis = float(np.dot(dr, dr))
    dmis = 2.0 * d.dot(dr)
    opt_history_data.append([mis, m, dmis, seis_pred, Mxyz])
    if returnseis:
        return mis, dmis, t, seis_pred
    if returnseisd:
        # reference returns the 4-D (nm, nr, nc, nt) derivative array here
        # (loc_cmt_util.py:180), not its flattened objective form
        return mis, dmis, t, seis_pred, derivxyz
    if noderiv:
        return mis
    if invopt["precon"] and precon:
        dmis = dmis * np.asarray(invopt["mscal"], float)
    return mis, dmis


def optfunc_OT(m_in, optdata, returnseis=False, returnwobj=False,
               returngrid=False, noderiv=False, returnderiv=False,
               return2W=False, geometry="cartesian", precon=True):
    """Wasserstein objective: forward -> arctan transform -> fingerprints
    -> marginal OT per trace -> chain rule back to the model
    (loc_cmt_util.py:186-306). Appends to ``opt_history_data``."""
    OTdata = optdata["OTdata"]
    invopt = optdata["invopt"]
    prop8data = optdata["prop8data"]
    seis_obs = np.asarray(prop8data["obs_seis"])
    if not invopt["loc"] and not invopt["cmt"]:
        return 0.0, np.zeros_like(np.asarray(m_in, float))
    m, loc, cmt, x, y, z, Mxyz = _model_head(m_in, invopt, precon)
    t, seis_pred, derivxyz, d = _forward_and_modelderiv(
        x, y, z, Mxyz, prop8data, loc, cmt, geometry)

    nr, nc, ntw = seis_obs.shape
    returnmarg = OTdata["Wopt"] != "Wavg" or return2W
    obs_grids = OTdata["obs_grids"]
    wfobs_target = OTdata["wfobs_target"]
    wfo = OTdata.get("wfobs")

    _, dundu = arctan_trans(seis_pred, obs_grids, deriv=True)
    wfp, wfpred_source = BuildOTobjfromWaveform(
        t, seis_pred, obs_grids, OTdata, lambdav=OTdata["plambda"],
        deriv=True, theta=OTdata["theta"])

    mis = 0.0
    if returnmarg:
        misW = np.zeros(2)
        drW = np.zeros((2, nr, nc, ntw))
        dg = np.zeros(2)
        for i in range(nr):
            for j in range(nc):
                w2pl, drl, dgl = CalcWasserWaveform(
                    wfpred_source[i][j], wfobs_target[i][j], wfp[i][j],
                    distfunc=OTdata["distfunc"], deriv=True,
                    returnmarg=True)
                misW += np.asarray(w2pl, float)
                drW[0, i, j, :] = drl[0]
                drW[1, i, j, :] = drl[1]
                dg[:] = np.asarray(dgl, float)  # last trace, as reference
    else:
        drW = np.zeros((nr, nc, ntw))
        for i in range(nr):
            for j in range(nc):
                w2p, drW[i, j, :], dg = CalcWasserWaveform(
                    wfpred_source[i][j], wfobs_target[i][j], wfp[i][j],
                    distfunc=OTdata["distfunc"], deriv=True,
                    returnmarg=False)
                mis += w2p

    if returnmarg:
        drW = drW * dundu[np.newaxis]
        dmis0 = d.dot(drW[0].flatten())
        dmis1 = d.dot(drW[1].flatten())
        if return2W:
            dmis = [dmis0, dmis1]
            mis = misW
        elif OTdata["Wopt"] == "Wt":
            dmis, mis = dmis0, misW[0]
        elif OTdata["Wopt"] == "Wu":
            dmis, mis = dmis1, misW[1]
    else:
        drW = drW * dundu
        dmis = d.dot(drW.flatten())

    opt_history_data.append([mis, m, dmis, seis_pred, Mxyz])
    if returnseis:
        return mis, dmis, t, seis_pred
    if returnwobj:
        return mis, dmis, wfo, wfp, wfpred_source, wfobs_target
    if returngrid:
        return mis, dmis, obs_grids
    if noderiv:
        return mis
    if returnderiv:
        # reference: mis, dmis, derivxyz (nm, nr, nc, nt), dr (the
        # dundu-scaled waveform derivative) — loc_cmt_util.py:304
        return mis, dmis, derivxyz, drW
    if invopt["precon"] and precon:
        dmis = dmis * np.asarray(invopt["mscal"], float)
    return mis, dmis


# -- moment-tensor solve / helpers (loc_cmt_util.py:309-396) -----------------


def Moment_LS(xyz, prop8data):
    """Least-squares moment tensor (upper-triangular 6-vector) at a fixed
    location (loc_cmt_util.py:309-334), via the differentiable linear
    solve in models.seismo.moment_tensor_ls on the layered forward."""
    x, y, z = [float(v) for v in xyz]
    z = max(z, 0.001)
    seis_obs = jnp.asarray(np.asarray(prop8data["obs_seis"], float))
    nt = seis_obs.shape[-1]
    timestep = prop8data.get("timestep", 1.0)
    model = _resolve_model(prop8data)
    stations = StationSet(
        x=jnp.asarray(np.asarray(prop8data["recx"], float).flatten()),
        y=jnp.asarray(np.asarray(prop8data["recy"], float).flatten()))

    def forward(m6):
        return layered_seismograms(
            x, y, z, mxyz_from_upper(m6), stations, model=model, nt=nt,
            dt=timestep, nk=prop8data.get("nk", 1024),
            kmax=prop8data.get("kmax", 2.5))[1]

    return np.asarray(moment_tensor_ls(jnp.asarray([x, y, z]), stations,
                                       seis_obs, forward=forward))


def recordresult(x):
    """scipy callback recorder (loc_cmt_util.py:338-350); reads the
    module-level ``optdata``/``opt_history_data`` blackboard."""
    invopt = optdata["invopt"]
    mis = opt_history_data[-1][0]
    Mxyz = opt_history_data[-1][-1]
    index = len(opt_history_data)
    xx = np.asarray(x, float)
    if invopt["precon"]:
        xx = xx * np.asarray(invopt["mscal"], float)
    opt_history.append([xx, mis, index, Mxyz])


def buildMxyzfromupper(vals):
    """Symmetric 3x3 from 6 upper-triangle values (loc_cmt_util.py:352)."""
    return np.asarray(mxyz_from_upper(jnp.asarray(vals, jnp.float64)))


def BuildMxyz(A):
    """Alias construction of the symmetric tensor (loc_cmt_util.py:385)."""
    return buildMxyzfromupper(A)


def drv_rpd2xyz(drv, deriv, stations, geometry="spherical"):
    """Reorder/rotate derivative seismograms to (x, y, z[, 6 m6]) rows
    (loc_cmt_util.py:360-383) — delegates to the live-parity-tested
    implementation in models.pyprop8_bridge."""
    return _drv_to_cartesian(drv, np.asarray(deriv), stations,
                             geometry=geometry)


def setmref(invopt, source, mtrue):
    """Reference model assembly for the inversion (loc_cmt_util.py:391)."""
    if invopt["loc"] and invopt["cmt"]:
        return [mtrue[0], mtrue[1], mtrue[2],
                source.Mxyz[0][np.triu_indices(3)]]
    if invopt["loc"]:
        return mtrue
    return source.Mxyz[0][np.triu_indices(3)]


# -- analysis (loc_cmt_util.py:399-446, 667-702) -----------------------------


def checkconverge(solutions, dlimit=1.0, mlimit=None, verbose=False):
    """Convergence classification of repeat inversions
    (loc_cmt_util.py:399-427): converged iff |loc_final - loc_true| <
    dlimit, restricted to starts off the |x|=80 outer square. ``solutions``
    rows are [mstart, mis_start, mfinal, mis_final, mtrue, mis_true]."""
    del mlimit  # the reference hardcodes its misfit condition off
    m_starts = np.array([np.asarray(s[0], float) for s in solutions])
    m_finals = np.array([np.asarray(s[2], float) for s in solutions])
    m_true = np.asarray(solutions[0][4], float)
    conv, dist, considered, frac = check_convergence(
        m_starts, m_finals, m_true, dlimit=dlimit, exclude_edge=80.0)
    con = list(conv & considered)
    gcon = list(considered)
    if verbose:
        for i, s in enumerate(solutions):
            print(i, ":", " start: ", m_starts[i][:3], " mis start ", s[1],
                  " mis final:", s[3], " mfinal", m_finals[i][:3], con[i])
        n = max(int(considered.sum()), 1)
        print("\n", int(np.sum(con)), " of ", float(n), " converged: ",
              100.0 * frac, "%")
    return con, dist, gcon


def buildFingerprintwindows(t, wave, Nu=None, Nt=None, u0=None, u1=None):
    """Per-trace fingerprint 6-tuples [t0,t1,u0,u1,Nu,Nt]
    (loc_cmt_util.py:430-446): amplitude box = trace range padded by 30%
    (via inversion.windows.build_windows), Nu = 1.3*nt by default."""
    wave = np.asarray(wave, float)
    nr, nc, ntw = wave.shape
    win = _build_windows(jnp.asarray(np.asarray(t, float)),
                         jnp.asarray(wave), pad=0.3, u0=u0, u1=u1)
    nu_used = int(1.3 * ntw) if Nu is None else int(Nu)
    nt_used = ntw if Nt is None else int(Nt)
    u0a, u1a = np.asarray(win.u0), np.asarray(win.u1)
    t0, t1 = float(win.t0), float(win.t1)
    return [[[t0, t1, float(u0a[i, j]), float(u1a[i, j]), nu_used, nt_used]
             for j in range(nc)] for i in range(nr)]


# -- OT builders (loc_cmt_util.py:448-587) -----------------------------------


def BuildOTobjfromWaveform(t, wavein, gridin, OTdata, norm=False,
                           verbose=False, lambdav=None, deriv=False,
                           fpgrid=None, theta=45.0):
    """(nr, nc) waveforms -> nested lists of (waveformFP, OTpdf)
    (loc_cmt_util.py:448-524): amplitudes are arctan-squashed with the RAW
    grids, fingerprints built on the (0,1) grids OTdata['obs_grids01']."""
    del norm, fpgrid  # reference hardcodes fpgrid=None in this variant
    wavein = np.asarray(wavein, float)
    if wavein.ndim == 1:
        nr, nc = 1, 1
        wave = wavein[np.newaxis, np.newaxis, :]
        grid = [[list(gridin)]]
    elif wavein.ndim == 3:
        nr, nc, _ = wavein.shape
        wave = wavein
        grid = gridin
    else:
        raise ValueError("waveform must be 1-D or (nr, nc, nt)")
    u = arctan_trans(wave, grid)
    grid01 = OTdata["obs_grids01"]
    if wavein.ndim == 1 and np.ndim(grid01[0][0]) == 0:
        grid01 = [[list(grid01)]]
    lam = 0.04 if lambdav is None else lambdav
    wflist = [[None] * nc for _ in range(nr)]
    wfolist = [[None] * nc for _ in range(nr)]
    for i in range(nr):
        for j in range(nc):
            wf = waveformFP(np.asarray(t, float), u[i][j], grid01[i][j],
                            theta=theta)
            wf.calcpdf(lambdav=lam, deriv=deriv, q=None)
            wflist[i][j] = wf
            wfolist[i][j] = OTpdf((wf.pdf, wf.pos))
    if verbose:
        print(" BuildOTobjfromWaveform:", nr, "x", nc, "fingerprints")
    return wflist, wfolist


def CalcWasserWaveform(wfsource, wftarget, wf, distfunc="W2", deriv=False,
                       Nproj=10, returnmarg=False):
    """Marginal Wasserstein + chain rule back to waveform amplitudes and
    window origin time — the loc/CMT variant (loc_cmt_util.py:527-574),
    whose origin-time rescale is 1/(t1-t0) WITHOUT tantheta (unlike
    ricker_util.py:333; see TraceConfig.include_tant_in_dg)."""
    del Nproj  # reference signature artifact (Marginal method only)
    if not deriv:
        out = MargWasserstein(wfsource, wftarget, distfunc=distfunc,
                              returnmargW=returnmarg)
        return out if returnmarg else out[0]
    w, dw, dwg = MargWasserstein(wfsource, wftarget, derivatives=True,
                                 distfunc=distfunc, returnmargW=returnmarg)
    scale = wf.tlim[1] - wf.tlim[0]
    if returnmarg:
        wf.PDFderivMarg(dw)
        return w, wf.pdfdMarg, [dwg[0] / scale, dwg[1] / scale]
    wf.PDFderiv(chainmatrix=dw)
    return w, wf.pdfd, dwg / scale


def arctan_trans(u, grids, deriv=False):
    """Batched arctan transform with per-trace (u0, u1) from the grid
    lists (loc_cmt_util.py:576-587) — the nested loops become one
    broadcast through ops.transforms.arctan_transform."""
    u = np.asarray(u, float)
    nr, nc, _ = u.shape
    g = np.asarray([[grids[i][j][2:4] for j in range(nc)]
                    for i in range(nr)], float)
    u0 = g[..., 0][..., np.newaxis]
    u1 = g[..., 1][..., np.newaxis]
    out = arctan_transform(jnp.asarray(u), jnp.asarray(u0), jnp.asarray(u1),
                           deriv=deriv)
    if deriv:
        return np.asarray(out[0]), np.asarray(out[1])
    return np.asarray(out)


# -- plotting / persistence / reporting (loc_cmt_util.py:589-702) ------------


def plotmisfitsection(xlim, ylim, xgrid, ygrid, zg, ztrue, sol, misfitgrid,
                      invopt, plotfile, returncontfunc=False):
    """2x2 depth-section misfit figures, one file per entry of
    ``misfitgrid`` (loc_cmt_util.py:589-655), via viz.plot_misfit_sections.
    With ``returncontfunc`` also returns the last figure's four
    interpolated (log-clipped for L2) contour fields."""
    from scipy.interpolate import griddata

    ninterp = 100
    tplot_out = None
    for i, misplot in enumerate(misfitgrid):
        _viz.plot_misfit_sections(misplot, xgrid, ygrid, zg, ztrue, sol=sol,
                                  mistype=invopt["mistype"], ninterp=ninterp,
                                  filename=plotfile[i])
        if returncontfunc:
            X, Y = np.meshgrid(np.linspace(xlim[0], xlim[1], ninterp),
                               np.linspace(ylim[0], ylim[1], ninterp))
            tplot_out = np.zeros((4, ninterp, ninterp))
            for k in range(4):
                ti = griddata((np.asarray(xgrid).flatten(),
                               np.asarray(ygrid).flatten()),
                              np.asarray(misplot[k]).flatten(), (X, Y),
                              method="cubic")
                tplot_out[k] = (ti if invopt["mistype"] == "OT"
                                else np.log(np.clip(ti, 1.0, np.inf)))
    if returncontfunc:
        return tplot_out


def writepickle(filename, listOfStr, listOfdata):
    _io.write_pickle(filename, listOfStr, listOfdata)


def readpickle(filename):
    return _io.read_pickle(filename)


def printanalysis(sol, opt, mtrue, mstart, mis_start, mis_true, prop8data,
                  sdata_nonoise, fit=False):
    """Solution summary prints (loc_cmt_util.py:667-702): location/CMT
    errors, optionally the best-fit CMT at the true location (with and
    without noise) via Moment_LS."""
    print("\n Some analysis of solution: ")
    if not opt.success:
        print("\n Optimisation Failed")
        return
    mis_final = opt.fun
    mfinal = np.asarray(sol, float)[:3]
    Mxyz_true = buildMxyzfromupper(np.asarray(mtrue, float)[3:])
    Mxyz_final = opt_history[-1][3]
    print("\n Model loc start :", np.asarray(mstart, float)[:3],
          "\n Misfit start :", mis_start, "\n Misfit final :", mis_final,
          "\n Misfit true  :", mis_true)
    print("\n Final location = ", mfinal,
          "\n True location = ", np.asarray(mtrue, float)[:3])
    print("\n Start CMT = \n",
          buildMxyzfromupper(np.asarray(mstart, float)[3:]))
    print("\n Final CMT = \n", Mxyz_final)
    print("\n True CMT = \n", Mxyz_true)
    with np.errstate(divide="ignore", invalid="ignore"):
        print("\n % Error in CMT:\n",
              100.0 * (np.asarray(Mxyz_final) - Mxyz_true) / Mxyz_true)
    if fit:
        x, y, z = np.asarray(mtrue, float)[:3]
        m_fit = BuildMxyz(Moment_LS([x, y, z], prop8data))
        print("\n Best fit CMT using True location = \n", m_fit)
        with np.errstate(divide="ignore", invalid="ignore"):
            print("\n % Error :\n", 100.0 * (m_fit - Mxyz_true) / Mxyz_true)
        p8 = dict(prop8data)
        p8["obs_seis"] = sdata_nonoise
        m_fit2 = BuildMxyz(Moment_LS([x, y, z], p8))
        print("\n Best fit CMT using True location and noiseless data = \n",
              m_fit2)
        with np.errstate(divide="ignore", invalid="ignore"):
            print("\n % Error :\n", 100.0 * (m_fit2 - Mxyz_true) / Mxyz_true)
