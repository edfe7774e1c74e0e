"""Ricker wavelet forward model.

Rewrite of ricker_util.ricker / rickerwavelet (reference:
libs/ricker_util.py:22-89). The double-Ricker has 3 parameters
(tpert, amp, f) — see eqn (36) of Sambridge et al. (2022). Everything is
jnp and differentiable; the reference's hand-coded parameter derivatives
(dwpd, ricker_util.py:82-87) are kept as :func:`ricker_wavelet_with_jacobian`
for parity (note the reference's d/d tpert is itself an
``np.gradient``-based approximation), while the native path is just
``jax.jacfwd`` of :func:`ricker_wavelet`.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _ricker_time_axis(length: float, dt: float) -> np.ndarray:
    # static python-side axis, like np.arange(-length/2, (length-dt)/2, dt)
    return np.arange(-length / 2, (length - dt) / 2, dt)


def ricker(f, length: float = 0.128, dt: float = 0.001, deriv: bool = False):
    """Single Ricker wavelet and optional df-derivative (ricker_util.py:22-30)."""
    t = jnp.asarray(_ricker_time_axis(length, dt))
    pift2 = (jnp.pi ** 2) * (t ** 2)
    a = 1.0 - 2.0 * pift2 * f ** 2
    b = jnp.exp(-pift2 * f ** 2)
    y = a * b
    if deriv:
        dw = b * (-4.0 * pift2 * f) + a * (-2.0 * pift2 * f * b)
        return t, y, dw
    return t, y


def ricker_wavelet(tpert, amp, f, trange=(-2.0, 2.0), length: float = 4.0,
                   dt: float = 4.0 / 128.0, noise=None):
    """Double Ricker wavelet (ricker_util.py:38-89, jitter removed as in the
    reference default ``removejitter=True``).

    Args:
      tpert, amp, f: wavelet centre time, amplitude factor, frequency factor
                     (may be traced scalars — fully differentiable).
      trange: output time span; the number of samples is 2 * length/dt.
      noise: optional additive noise array (e.g. from models.gp_noise),
             matching the reference's sigma_amp/sigma_cor options which are
             applied by the caller here for functional purity.

    Returns (t, w) with t = linspace(trange) + tpert.
    """
    freq = f * 25.0 * 4.0 / 128.0  # a wavelength of 25 Hz (ricker_util.py:62)
    _, w = ricker(freq, length=length, dt=dt)
    wp = amp * jnp.concatenate([w, w])
    tp = jnp.linspace(trange[0], trange[1], wp.shape[0])
    if noise is not None:
        wp = wp + noise
    return tp + tpert, wp


def ricker_wavelet_noisy(key, tpert, amp, f, trange=(-2.0, 2.0),
                         sigma_amp: float = 0.0, sigma_cor: float = 0.0,
                         length: float = 4.0, dt: float = 4.0 / 128.0):
    """Double Ricker with the reference's noise options
    (ricker_util.py:73-80): white noise scaled by sigma_amp*max|w| when
    sigma_cor == 0, otherwise GP-correlated noise with std sigma_amp
    (drawn with jax.random instead of the reference's global numpy seed).
    """
    import jax
    import jax.random as jrandom

    from waveform_ot_tpu.models.gp_noise import correlated_noise

    t, w = ricker_wavelet(tpert, amp, f, trange=trange, length=length, dt=dt)
    if sigma_amp == 0.0:
        return t, w
    if sigma_cor == 0.0:
        noise = sigma_amp * jnp.max(jnp.abs(w)) * jrandom.normal(
            key, w.shape, w.dtype)
    else:
        noise = correlated_noise(key, w.shape[0], sigma_amp, sigma_cor)
    return t, w + noise


def ricker_wavelet_with_jacobian(tpert, amp, f, trange=(-2.0, 2.0),
                                 length: float = 4.0, dt: float = 4.0 / 128.0):
    """(t, w, dw/dm) with the reference's analytic jacobian conventions
    (ricker_util.py:82-87): row 0 = -grad(w)/dt (time-offset), row 1 = w/amp
    (amplitude), row 2 = amp * d(ricker)/df * 25*4/128 (frequency)."""
    freq = f * 25.0 * 4.0 / 128.0
    _, w, dwf = ricker(freq, length=length, dt=dt, deriv=True)
    wp = amp * jnp.concatenate([w, w])
    tp = jnp.linspace(trange[0], trange[1], wp.shape[0])
    dstep = tp[1] - tp[0]
    dwpd = jnp.stack([
        -jnp.gradient(wp, dstep),
        jnp.concatenate([w, w]),
        amp * jnp.concatenate([dwf, dwf]) * 25.0 * 4.0 / 128.0,
    ])
    return tp + tpert, wp, dwpd
