"""Entropically regularized optimal transport (Sinkhorn iterations).

Rewrites of the reference's three Sinkhorn variants (libs/OTlib.py:936-1011):

  Sinkhorn / SinkhornAB (Baerentzen)  -> sinkhorn_gaussian
     kernel applications are Gaussian blurs on the grid; the reference uses
     scipy.ndimage.gaussian_filter, here a separable explicit-kernel
     convolution (XLA conv, differentiable), iterated with lax.scan.
  Sinkhorn_MS (Snow/Sambridge)        -> sinkhorn_dense
     dense Gibbs kernel K = exp(-cost/gamma)/max, mu/nu matmul iterations
     (MXU), returns (distance^2, plan) like OTlib.py:1011.

A log-domain stabilized variant (:func:`sinkhorn_log`) is added beyond the
reference — the dense kernel underflows for small gamma; the log-sum-exp
form is the standard remedy and matches sinkhorn_dense where both are
stable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# f32 matmuls default to bf16 on TPU; the Sinkhorn fixed point is
# sensitive to kernel-apply precision, and these matrices are small
_HP = jax.lax.Precision.HIGHEST

_EPS = 1e-300


def _gaussian_kernel_1d(sigma, truncate: float = 32.0, dtype=jnp.float64):
    radius = int(truncate * float(sigma) + 0.5)
    x = jnp.arange(-radius, radius + 1, dtype=dtype)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_filter(image, sigma, truncate: float = 32.0):
    """Separable Gaussian blur, matching scipy.ndimage.gaussian_filter with
    mode='constant' (zero padding) as used at OTlib.py:936-937."""
    k = _gaussian_kernel_1d(sigma, truncate, image.dtype)
    r = (k.shape[0] - 1) // 2

    def blur_axis(img, axis):
        moved = jnp.moveaxis(img, axis, -1)
        padded = jnp.pad(moved, [(0, 0)] * (moved.ndim - 1) + [(r, r)])
        out = jax.vmap(lambda row: jnp.correlate(row, k, mode="valid"))(
            padded.reshape(-1, padded.shape[-1]))
        return jnp.moveaxis(out.reshape(moved.shape), -1, axis)

    out = image
    for ax in range(image.ndim):
        out = blur_axis(out, ax)
    return out


def sinkhorn_gaussian(mu0, mu1, gamma: float = 0.005, iters: int = 250):
    """Gaussian-kernel entropic W2 on a regular unit-spaced grid
    (reference Sinkhorn, OTlib.py:956-967). Returns (distance, v, w)."""

    def step(carry, _):
        v, w = carry
        v = mu0 / jnp.maximum(gaussian_filter(w, gamma), _EPS)
        w = mu1 / jnp.maximum(gaussian_filter(v, gamma), _EPS)
        return (v, w), None

    v0 = jnp.ones_like(mu0)
    (v, w), _ = jax.lax.scan(step, (v0, jnp.ones_like(mu1)), None,
                             length=iters)
    logv = jnp.log(jnp.maximum(v, _EPS))
    logw = jnp.log(jnp.maximum(w, _EPS))
    dist = jnp.sum(mu0 * logv + mu1 * logw) * gamma
    return dist, v, w


def _pairwise_sq(fx, gx):
    f2 = fx.reshape(fx.shape[0], -1)
    g2 = gx.reshape(gx.shape[0], -1)
    d = f2[:, None, :] - g2[None, :, :]
    return jnp.sum(d * d, axis=-1)


def sinkhorn_dense(source, target, gamma: float = 5e-4,
                   iters: int = 5001):
    """Dense-kernel Sinkhorn (reference Sinkhorn_MS, OTlib.py:969-1011).

    Accepts Density1D/Density2D pytrees; returns (W^p estimate, plan) with
    the reference's conventions (kernel normalized by its max; distance
    recovered by contracting the plan with the cost).
    """
    f = source.pdf.reshape(-1)
    g = target.pdf.reshape(-1)
    fx = source.x.reshape(source.n, -1)
    gx = target.x.reshape(target.n, -1)
    cost = _pairwise_sq(fx, gx)
    M = jnp.exp(-cost / gamma)
    amp = jnp.max(M)
    M = M / amp
    src = (f / jnp.sum(f))[:, None]
    tgt = (g / jnp.sum(g))[:, None]
    nu0 = jnp.ones((target.n, 1), f.dtype)
    mu0 = jnp.ones((source.n, 1), f.dtype)

    def step(carry, _):
        _, nu = carry
        mu = src / jnp.matmul(M, nu, precision=_HP)
        nu = tgt / jnp.matmul(M.T, mu, precision=_HP)
        return (mu, nu), None

    # the plan uses the (mu, nu) pair exactly as the reference leaves them
    # after its final loop iteration (OTlib.py:998-1008) - mu from before
    # the last nu update, no trailing recompute
    (mu, nu), _ = jax.lax.scan(step, (mu0, nu0), None, length=iters)
    pi = jnp.matmul(jnp.matmul(jnp.diag(nu.reshape(-1)), M.T,
                               precision=_HP),
                    jnp.diag(mu.reshape(-1)), precision=_HP)
    dist = amp * jnp.sum(pi.T * cost)
    return dist, pi


def sinkhorn_log(source, target, gamma: float = 5e-4, iters: int = 500):
    """Log-domain stabilized Sinkhorn (beyond the reference; standard
    log-sum-exp form). Returns (W^p estimate, plan)."""
    f = (source.pdf / jnp.sum(source.pdf)).reshape(-1)
    g = (target.pdf / jnp.sum(target.pdf)).reshape(-1)
    fx = source.x.reshape(source.n, -1)
    gx = target.x.reshape(target.n, -1)
    cost = _pairwise_sq(fx, gx)
    logf = jnp.log(jnp.maximum(f, _EPS))
    logg = jnp.log(jnp.maximum(g, _EPS))
    mC = -cost / gamma

    def step(carry, _):
        alpha, beta = carry
        alpha = logf - jax.scipy.special.logsumexp(mC + beta[None, :],
                                                   axis=1)
        beta = logg - jax.scipy.special.logsumexp(mC + alpha[:, None],
                                                  axis=0)
        return (alpha, beta), None

    init = (jnp.zeros_like(logf), jnp.zeros_like(logg))
    (alpha, beta), _ = jax.lax.scan(step, init, None, length=iters)
    logpi = alpha[:, None] + mC + beta[None, :]
    pi = jnp.exp(logpi)
    return jnp.sum(pi * cost), pi
