"""Wasserstein barycenter paths (displacement interpolation).

Rewrite of barypath_pointmass / barypath (reference: libs/OTlib.py:743-852).
Used by the point-mass demo (Point_mass_demo_Fig_5) and transport-animation
plots. The point-mass variant returns the merged-support interpolation for
every weight at once (batched over weights instead of the reference's
Python list accumulation); the continuous variant interpolates inverse CDFs
on a regular quantile grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from waveform_ot_tpu.ops.otpdf import Density1D
from waveform_ot_tpu.ops.wasser import _merge


def barycenter_pointmass(source: Density1D, target: Density1D, weights,
                         include_endpoints: bool = False):
    """Displacement interpolation of point masses (OTlib.py:743-786).

    Returns (positions (k, m), masses (m,)): for each weight w the support
    moves to (1-w)*x_f[indf] + w*x_g[indg] carrying mass dtk.

    With ``include_endpoints=True``, mirrors the reference's return
    structure exactly (OTlib.py:777-786): a pair of Python lists
    (amplitudes, positions), with the FIRST and LAST entries replaced
    unconditionally by the original (source.pdf, source.x) and
    (target.pdf, target.x) — the reference substitutes the endpoints
    whatever the first/last weights are, so entries are ragged (length n at
    the ends, merged length m inside), hence lists rather than one array.
    """
    _, _, indf, indg, dtk = _merge(source.cdf, target.cdf)
    xft = source.x[indf]
    xgt = target.x[indg]
    w = jnp.asarray(weights)[:, None]
    xs = (1.0 - w) * xft[None, :] + w * xgt[None, :]
    if not include_endpoints:
        return xs, dtk
    amps = [dtk] * xs.shape[0]
    xlist = [xs[i] for i in range(xs.shape[0])]
    amps[0], xlist[0] = source.pdf, source.x
    amps[-1], xlist[-1] = target.pdf, target.x
    return amps, xlist


def barycenter_continuous(source: Density1D, target: Density1D, weights,
                          npoints: int = 50000, return_taxis: bool = False):
    """Continuous displacement interpolation via inverse-CDF blending
    (OTlib.py:839-852): interpolate both inverse CDFs onto a regular
    quantile grid, blend, and differentiate to recover the pdf.

    Returns (k, 2, npoints): [:, 0] support positions, [:, 1] density.
    """
    t = jnp.linspace(0.0, 1.0, npoints, dtype=source.cdf.dtype)
    finv = jnp.interp(t, source.cdf, source.x)
    ginv = jnp.interp(t, target.cdf, target.x)

    def one(w):
        x = w * ginv + (1.0 - w) * finv
        pdf = jnp.gradient(t) / jnp.maximum(jnp.gradient(x), 1e-30)
        return jnp.stack([x, pdf])

    out = jax.vmap(one)(jnp.asarray(weights))
    if return_taxis:
        return out, t
    return out
