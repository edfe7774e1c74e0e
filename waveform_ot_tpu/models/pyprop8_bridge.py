"""Host-callback bridge for CPU-only forward physics (pyprop8).

The reference computes seismograms with pyprop8 on the host
(loc_cmt_util.prop8seis, loc_cmt_util.py:28-58) and chains its analytic
Jacobians through drv_rpd2xyz (loc_cmt_util.py:360-383). In the TPU build,
the OT misfit runs on-device and the physics stays host-side behind
``jax.pure_callback`` with a ``jax.custom_vjp`` whose backward pass uses
the host-provided Jacobian — so ``jax.grad`` of the full objective works
transparently across the host/device boundary (SURVEY.md section 7 phase 5).

The machinery (:func:`host_forward_with_jacobian`) is generic and tested
with a mock host function; :func:`prop8seis` wires it to pyprop8 when that
optional dependency is installed.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

try:  # optional dependency, like the reference's guarded POT/skfmm imports
    import pyprop8 as _pp
    from pyprop8.utils import clp_filter as _clp_filter
    from pyprop8.utils import make_moment_tensor as _make_mt
    from pyprop8.utils import rtf2xyz as _rtf2xyz

    HAVE_PYPROP8 = True
except ImportError:  # pragma: no cover - environment without pyprop8
    _pp = None
    HAVE_PYPROP8 = False


def host_forward_with_jacobian(host_fn: Callable, m, out_shape, out_dtype,
                               jac_shape):
    """Differentiable wrapper for a host function with analytic Jacobian.

    Args:
      host_fn: numpy function m -> (value, jac) with value.shape == out_shape
               and jac.shape == (len(m),) + out_shape.
      m: (nm,) parameter array (device).
      out_shape / out_dtype / jac_shape: static result specs.

    Returns value as a device array; ``jax.grad`` through it contracts the
    cotangent with the host Jacobian (computed in the same callback and
    returned as a VJP residual — one host call per evaluation, like the
    reference's single pyprop8 call per objective, loc_cmt_util.py:226).
    """

    result_spec = (jax.ShapeDtypeStruct(out_shape, out_dtype),
                   jax.ShapeDtypeStruct(jac_shape, out_dtype))

    def _call(mv):
        val, jac = host_fn(np.asarray(mv))
        return (np.asarray(val, out_dtype), np.asarray(jac, out_dtype))

    @jax.custom_vjp
    def fwd(mv):
        val, _ = jax.pure_callback(_call, result_spec, mv)
        return val

    def fwd_fwd(mv):
        val, jac = jax.pure_callback(_call, result_spec, mv)
        return val, jac

    def fwd_bwd(jac, ct):
        nm = jac.shape[0]
        return (jnp.tensordot(jac.reshape(nm, -1), ct.ravel(), axes=1,
                              precision=jax.lax.Precision.HIGHEST),)

    fwd.defvjp(fwd_fwd, fwd_bwd)
    return fwd(m)


# ---------------------------------------------------------------------------
# pyprop8 wiring (active only when the package is installed)
# ---------------------------------------------------------------------------

_DIAGORDER = [0, 3, 4, 1, 5, 2]  # pyprop8 'diag-first' -> upper-triangular
                                 # (loc_cmt_util.py:311,362)


def _drv_to_cartesian(drv, deriv, stations, geometry="cartesian"):
    """Reorder/rotate pyprop8 derivative seismograms to
    (x, y, z[, 6 upper-tri M]) rows — reference drv_rpd2xyz
    (loc_cmt_util.py:360-383), including the z sign flip and the
    spherical->cartesian receiver-angle chain."""
    if geometry == "spherical":
        dr = deriv[:, drv.i_r, :, :]
        dp = deriv[:, drv.i_phi, :, :]
        dd = deriv[:, drv.i_z, :, :]
        dx = ((dr.T) * (-np.cos(stations.pp))
              + (dp.T) * (np.sin(stations.pp) / stations.rr)).T
        dy = -((dr.T) * (np.sin(stations.pp))
               + (dp.T) * (np.cos(stations.pp) / stations.rr)).T
        dz = -dd
    else:
        dx = deriv[:, drv.i_x, :, :]
        dy = deriv[:, drv.i_y, :, :]
        dz = -deriv[:, drv.i_z, :, :]
    rows = [dx, dy, dz]
    if drv.moment_tensor:
        rows += [deriv[:, drv.i_mt + _DIAGORDER[k], :, :] for k in range(6)]
    return np.array(rows)


def prop8seis_host(x, y, z, prop8data, Mxyz=None, nt=61, timestep=1.0,
                   derivatives=True, geometry="cartesian"):
    """Host-side pyprop8 forward (+Jacobian), mirroring prop8seis
    (loc_cmt_util.py:28-58). Returns (t, seis, jac_or_None)."""
    if not HAVE_PYPROP8:
        raise ImportError("pyprop8 is not installed")
    Nm2moment = 1.0e-13
    strike, dip, rake, Mo = prop8data["sdrm"]
    if Mxyz is None:
        Mxyz = _rtf2xyz(_make_mt(strike, dip, rake, Mo * Nm2moment, 0, 0))
    source = _pp.PointSource(x, y, z, Mxyz, np.zeros((3, 1)), 0.0)
    stations = _pp.ListOfReceivers(xx=prop8data["recx"].flatten(),
                                   yy=prop8data["recy"].flatten(), depth=0.0)
    stf = lambda om: _clp_filter(om, 2 * np.pi * 0.05, 2 * np.pi * 0.2)
    if not derivatives:
        t, s = _pp.compute_seismograms(
            prop8data["model"], source, stations, nt, timestep, 0.023,
            source_time_function=stf, derivatives=None, show_progress=False)
        return t, np.atleast_3d(s), None
    if geometry == "cartesian":
        drv = _pp.DerivativeSwitches(x=True, y=True, z=True,
                                     moment_tensor=True,
                                     structure=prop8data["model"])
    else:
        drv = _pp.DerivativeSwitches(r=True, phi=True, z=True,
                                     moment_tensor=True,
                                     structure=prop8data["model"])
    t, s, d = _pp.compute_seismograms(
        prop8data["model"], source, stations, nt, timestep, 0.023,
        source_time_function=stf, derivatives=drv, show_progress=False)
    jac = _drv_to_cartesian(drv, np.atleast_3d(d) if d.ndim < 4 else d,
                            stations, geometry=geometry)
    return t, np.atleast_3d(s), jac


def prop8seis(m, prop8data, nr: int, nt: int = 61, timestep: float = 1.0,
              cmt: bool = True, dtype=jnp.float64):
    """Differentiable device-side pyprop8 seismograms.

    Args:
      m: (3,) location or (9,) location + upper-tri moment tensor.
      prop8data: host dict (model, recx, recy, sdrm) as in the reference.

    Returns (nr, 3, nt) seismograms; grad w.r.t. m uses pyprop8's Jacobians.
    """
    from waveform_ot_tpu.models.seismo import mxyz_from_upper

    nm = 9 if cmt else 3

    def host_fn(mv):
        Mxyz = None
        if cmt:
            Mxyz = np.asarray(mxyz_from_upper(jnp.asarray(mv[3:])))
        _, s, jac = prop8seis_host(mv[0], mv[1], max(mv[2], 1e-3), prop8data,
                                   Mxyz=Mxyz, nt=nt, timestep=timestep)
        return s, jac[:nm]

    return host_forward_with_jacobian(
        host_fn, m, (nr, 3, nt), dtype, (nm, nr, 3, nt))
