"""Gaussian-process correlated noise (reference: libs/myGP.py).

The reference builds a dense covariance matrix with a Python double loop and
samples with np.random.multivariate_normal (myGP.py:31-57). Here the
covariance is a single broadcast, sampling is a Cholesky transform of
``jax.random`` normals, and the kernels are vectorized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sq_exp(x, xp, s1, rho):
    return (s1 ** 2) * jnp.exp(-((x - xp) ** 2) / (2.0 * rho ** 2))


def matern0(x, xp, s1, rho):
    return (s1 ** 2) * jnp.exp(-jnp.abs(x - xp) / rho)


def matern1(x, xp, s1, rho):
    r = jnp.abs(x - xp) / rho
    return (s1 ** 2) * (1.0 + jnp.sqrt(3.0) * r) * jnp.exp(-jnp.sqrt(3.0) * r)


def matern2(x, xp, s1, rho):
    r = jnp.abs(x - xp) / rho
    return (s1 ** 2) * (1.0 + jnp.sqrt(5.0) * r + 5.0 * r ** 2 / 3.0) \
        * jnp.exp(-jnp.sqrt(5.0) * r)


def periodic(x, xp, s1, rho, period=1.0):
    return (s1 ** 2) * jnp.exp(
        -2.0 * jnp.sin(jnp.abs(x - xp) * jnp.pi / period) ** 2 / rho ** 2)


KERNELS = {"sqExp": sq_exp, "matern0": matern0, "matern1": matern1,
           "matern2": matern2, "periodic": periodic}


def covariance(xx, kernel=sq_exp, s1: float = 0.2, rho: float = 0.2):
    """Dense covariance matrix K[i, j] = k(x_i, x_j) (vectorized)."""
    return kernel(xx[:, None], xx[None, :], s1, rho)


def create_curve(key, nx: int = 250, x0=(-3.0, 3.0), corr: float = 0.2,
                 s1: float = 0.2, kernel=sq_exp, jitter: float | None = None):
    """Draw one GP curve (reference Createcurve, myGP.py:18-64).

    Returns (x, y): x = linspace(x0), y ~ N(0, K) sampled on the internal
    (-1, 1) grid like the reference. ``jitter`` defaults per dtype: the
    squared-exponential K is numerically rank-deficient, and the float32
    Cholesky (x64 disabled) needs a larger diagonal shift than float64 or
    it returns NaN.
    """
    xx = jnp.linspace(-1.0, 1.0, nx)
    K = covariance(xx, kernel=kernel, s1=s1, rho=corr)
    if jitter is None:
        jitter = 1e-10 if K.dtype == jnp.float64 else 1e-5
    L = jnp.linalg.cholesky(K + jitter * jnp.eye(nx))
    y = L @ jax.random.normal(key, (nx,), dtype=K.dtype)
    return jnp.linspace(x0[0], x0[1], nx), y


def correlated_noise(key, n: int, sigma_amp: float, corr: float):
    """Noise scaled to std sigma_amp, matching ricker_util.py:76-78."""
    _, y = create_curve(key, nx=n, corr=corr)
    return y * sigma_amp / jnp.std(y)


# -- reference-name surface (myGP.py) ---------------------------------------

sqExp = sq_exp  # reference camelCase name (myGP.py:7)


def Createcurve(plotyn, nx: int = 250, x0=(-3.0, 3.0), corr: float = 0.2):
    """Reference-signature GP curve draw (myGP.py:18-64): ``plotyn``
    selects the diagnostic figures; the draw itself delegates to
    :func:`create_curve` (jax.random with a fixed key replacing the
    reference's global numpy RNG state)."""
    key = jax.random.PRNGKey(1726151)  # the reference's diagnostic seed
    x, y = create_curve(key, nx=nx, x0=tuple(x0), corr=corr)
    if plotyn:
        from waveform_ot_tpu.viz import _plt

        plt = _plt()
        xx = jnp.linspace(-1.0, 1.0, nx)
        fig, axs = plt.subplots(1, 3, figsize=(15, 4))
        axs[0].plot(xx, sq_exp(xx, 0.0, 0.2, corr))
        axs[0].set_title("covariance function")
        axs[1].imshow(covariance(xx, rho=corr), cmap="cubehelix")
        axs[1].set_title("covariance matrix")
        axs[2].plot(x, y)
        axs[2].set_title("A Gaussian Process")
        plt.close(fig)
    return x, y
