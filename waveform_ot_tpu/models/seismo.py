"""Seismogram forward modelling for the source-location / CMT examples.

The reference drives its flagship example (Figs 9-12) with pyprop8
seismograms (loc_cmt_util.py:28-58). pyprop8 is CPU-only Python; the
TPU-native stack therefore provides two interchangeable forwards:

  * :func:`synthetic_seismograms` — an on-device, fully differentiable
    far-field point-source model (homogeneous-medium P+SV/SH radiation,
    linear in the moment tensor, smooth in source position). It preserves
    every structural property the inversion machinery relies on —
    (nr, 3, nt) trace layout, linearity in M (so ``moment_tensor_ls``
    recovers M exactly, like Moment_LS at loc_cmt_util.py:309-334),
    depth-dependence, arrival moveout — while running inside jit/vmap on
    TPU. All the loc/CMT pipelines and tests run on this model.
  * ``models.pyprop8_bridge`` — a ``jax.pure_callback`` wrapper around real
    pyprop8 (when installed) with a custom VJP fed by pyprop8's own
    analytic Jacobians, mirroring drv_rpd2xyz (loc_cmt_util.py:360-383).

Moment-tensor utilities mirror loc_cmt_util.buildMxyzfromupper /
BuildMxyz (loc_cmt_util.py:352-357, 385-388) and pyprop8.utils'
make_moment_tensor/rtf2xyz (standard Aki & Richards eqn 4.88-4.89 forms).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# moment tensor helpers
# ---------------------------------------------------------------------------

_TRIU = jnp.triu_indices(3)


def mxyz_from_upper(vals):
    """Symmetric 3x3 from its 6 upper-triangle entries (row-major order
    Mxx, Mxy, Mxz, Myy, Myz, Mzz), matching buildMxyzfromupper."""
    m = jnp.zeros((3, 3), jnp.asarray(vals).dtype)
    m = m.at[_TRIU].set(vals)
    return m + m.T - jnp.diag(jnp.diag(m))


def upper_from_mxyz(m):
    """Inverse of :func:`mxyz_from_upper`."""
    return m[_TRIU]


def moment_tensor_from_sdr(strike, dip, rake, m0=1.0, degrees=True):
    """Moment tensor (x=North, y=East, z=Up cartesian) from strike/dip/rake.

    Standard double-couple formulas (Aki & Richards eqn 4.88-4.89 in the
    (r, theta, phi) basis, then rotated to cartesian like pyprop8.utils'
    make_moment_tensor + rtf2xyz composition used at loc_cmt_util.py:33).
    """
    if degrees:
        strike = jnp.deg2rad(strike)
        dip = jnp.deg2rad(dip)
        rake = jnp.deg2rad(rake)
    ss, cs = jnp.sin(strike), jnp.cos(strike)
    s2s, c2s = jnp.sin(2 * strike), jnp.cos(2 * strike)
    sd, cd = jnp.sin(dip), jnp.cos(dip)
    s2d, c2d = jnp.sin(2 * dip), jnp.cos(2 * dip)
    sr, cr = jnp.sin(rake), jnp.cos(rake)
    mxx = -(sd * cr * s2s + s2d * sr * ss * ss)
    mxy = sd * cr * c2s + 0.5 * s2d * sr * s2s
    mxz = -(cd * cr * cs + c2d * sr * ss)
    myy = sd * cr * s2s - s2d * sr * cs * cs
    myz = -(cd * cr * ss - c2d * sr * cs)
    mzz = s2d * sr
    return m0 * jnp.array([[mxx, mxy, mxz],
                           [mxy, myy, myz],
                           [mxz, myz, mzz]])


# ---------------------------------------------------------------------------
# synthetic far-field forward model
# ---------------------------------------------------------------------------


class StationSet(NamedTuple):
    """Receiver coordinates at the surface (pytree; shapes (nr,))."""

    x: jax.Array
    y: jax.Array


class MediumConfig(NamedTuple):
    """Homogeneous-medium parameters (pytree of scalars)."""

    vp: jax.Array
    vs: jax.Array
    rho: jax.Array

    @staticmethod
    def default(dtype=jnp.float64):
        return MediumConfig(vp=jnp.asarray(6.0, dtype),
                            vs=jnp.asarray(3.46, dtype),
                            rho=jnp.asarray(2.7, dtype))


def _stf_velocity(tau, fc):
    """Band-limited source pulse: derivative-of-Gaussian wavelet, smooth in
    tau (plays the role of the reference's clp_filter STF,
    loc_cmt_util.py:43)."""
    a = (jnp.pi * fc) ** 2
    return -2.0 * a * tau * jnp.exp(-a * tau * tau)


def synthetic_seismograms(x, y, z, mxyz, stations: StationSet, nt: int = 61,
                          dt: float = 1.0, medium: MediumConfig | None = None,
                          fc: float = 0.08, t0: float = 0.0):
    """Three-component far-field seismograms (nr, 3, nt).

    u_P = gamma (gamma.M.gamma) / (4 pi rho vp^3 r) * s(t - r/vp)
    u_S = (M.gamma - gamma (gamma.M.gamma)) / (4 pi rho vs^3 r) * s(t - r/vs)

    Components are (North=ux, East=uy, Vertical=uz), matching the
    reference's (nr, nc=3, nt) layout (loc_cmt_util.py:36-53). Linear in
    ``mxyz``; smooth in (x, y, z) for z > 0.
    """
    if medium is None:
        medium = MediumConfig.default(jnp.asarray(x).dtype)
    t = t0 + dt * jnp.arange(nt, dtype=jnp.asarray(x).dtype)
    dx = stations.x - x
    dy = stations.y - y
    dz = jnp.broadcast_to(z, dx.shape)
    r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    gam = jnp.stack([dx, dy, dz], axis=-1) / r[:, None]     # (nr, 3)
    # HIGHEST: (nr,3)@(3,3) is tiny; default f32 matmul is bf16 on TPU and
    # biases the forward (and hence the misfit gradient) at ~1e-3 relative
    mg = jnp.matmul(gam, mxyz,
                    precision=jax.lax.Precision.HIGHEST)    # (nr, 3)
    gmg = jnp.sum(mg * gam, axis=-1)                        # (nr,)
    four_pi_rho = 4.0 * jnp.pi * medium.rho
    amp_p = gmg / (four_pi_rho * medium.vp ** 3 * r)        # (nr,)
    vec_s = mg - gam * gmg[:, None]                         # (nr, 3)
    amp_s = 1.0 / (four_pi_rho * medium.vs ** 3 * r)
    tau_p = t[None, :] - (r / medium.vp)[:, None]           # (nr, nt)
    tau_s = t[None, :] - (r / medium.vs)[:, None]
    wp = _stf_velocity(tau_p, fc)                           # (nr, nt)
    ws = _stf_velocity(tau_s, fc)
    u = (gam[:, :, None] * (amp_p[:, None] * wp)[:, None, :]
         + vec_s[:, :, None] * (amp_s[:, None] * ws)[:, None, :])
    return t, u


def moment_tensor_ls(xyz, stations: StationSet, seis_obs, nt: int = 61,
                     dt: float = 1.0, medium: MediumConfig | None = None,
                     fc: float = 0.08, forward=None):
    """Linear least-squares moment tensor at a fixed location.

    Seismograms are linear in M, so M solves (G^T G) m = G^T d where G's
    six columns are unit-moment-tensor forwards — the reference's
    Moment_LS (loc_cmt_util.py:309-334) built from pyprop8 derivative
    seismograms. Differentiable w.r.t. ``xyz`` by autodiff of the solve.
    """
    x, y, z = xyz[0], xyz[1], xyz[2]
    if forward is None:
        def forward(m6):
            return synthetic_seismograms(x, y, z, mxyz_from_upper(m6),
                                         stations, nt=nt, dt=dt,
                                         medium=medium, fc=fc)[1]
    basis = jnp.eye(6, dtype=jnp.asarray(seis_obs).dtype)
    G = jax.vmap(lambda e: forward(e).ravel())(basis)       # (6, nr*3*nt)
    hp = jax.lax.Precision.HIGHEST
    gtd = jnp.matmul(G, seis_obs.ravel(), precision=hp)
    gtg = jnp.matmul(G, G.T, precision=hp)
    return jnp.linalg.solve(gtg, gtd)
