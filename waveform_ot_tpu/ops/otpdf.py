"""Discrete densities as immutable pytrees.

TPU-first replacement for the reference's mutable ``OTpdf`` class
(reference: libs/OTlib.py:82-163). Instead of an object that normalizes in
``__init__`` and caches marginals/projections on ``self``, densities here are
``NamedTuple`` pytrees produced by pure functions, so they vmap/jit/shard
transparently and gradients flow through construction.

  reference OTpdf.__init__      -> make_density_1d / make_density_2d
  reference OTpdf.setMarginals  -> marginals            (OTlib.py:146-163)
  reference OTpdf.setSliced     -> ops.sliced.project_sliced (OTlib.py:119-144)

All functions accept *unnormalized*, non-negative amplitudes; ``amp`` keeps
the raw total mass so derivatives w.r.t. unnormalized amplitudes match the
reference conventions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from waveform_ot_tpu.ops import errors


class Density1D(NamedTuple):
    """A 1-D discrete density with cached CDF.

    Fields (mirroring OTlib.py:90-114):
      amp: scalar, raw total mass (sum of unnormalized amplitudes)
      pdf: (n,) normalized amplitudes (sums to 1)
      x:   (n,) support locations
      cdf: (n,) cumulative distribution, renormalized so cdf[-1] == 1
    """

    amp: jax.Array
    pdf: jax.Array
    x: jax.Array
    cdf: jax.Array

    @property
    def n(self) -> int:
        return self.pdf.shape[-1]


class Density2D(NamedTuple):
    """A 2-D discrete density over a structured grid.

    Fields:
      amp: scalar, raw total mass
      pdf: (nx, ny) normalized amplitudes
      x:   (nx, ny, 2) grid point coordinates; x[..., 0] varies along axis 1
           (the reference's time axis), x[..., 1] along axis 0 (amplitude)
    """

    amp: jax.Array
    pdf: jax.Array
    x: jax.Array

    @property
    def nx(self) -> int:
        return self.pdf.shape[-2]

    @property
    def ny(self) -> int:
        return self.pdf.shape[-1]

    @property
    def n(self) -> int:
        return self.nx * self.ny


def _normalize(f: jax.Array) -> tuple[jax.Array, jax.Array]:
    amp = jnp.sum(f)
    return amp, f / amp


def make_density_1d(f: jax.Array, x: jax.Array) -> Density1D:
    """Build a 1-D density pytree from unnormalized amplitudes and locations.

    Matches OTlib.py:90-114: pdf = f/sum(f); cdf = cumsum(pdf) renormalized
    by its last entry to kill accumulation round-off.
    """
    f = jnp.asarray(f)
    x = jnp.asarray(x)
    amp, pdf = _normalize(f)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = cdf / cdf[..., -1:]
    return Density1D(amp=amp, pdf=pdf, x=x, cdf=cdf)


def make_density_2d(f: jax.Array, x: jax.Array) -> Density2D:
    """Build a 2-D density pytree.

    ``f`` has shape (nx, ny); ``x`` has shape (nx, ny, 2).
    """
    f = jnp.asarray(f)
    x = jnp.asarray(x)
    amp, pdf = _normalize(f)
    return Density2D(amp=amp, pdf=pdf, x=x)


def make_density(f: jax.Array, x: jax.Array):
    """Dispatch on rank like the reference OTpdf constructor (OTlib.py:97)."""
    if jnp.ndim(f) == 2:
        return make_density_2d(f, x)
    return make_density_1d(f, x)


def validate_density(f, x) -> None:
    """Eager-mode validation mirroring OTpdf.__init__ errors (OTlib.py:91-110).

    Raises :class:`errors.PDFSignError` / :class:`errors.PDFShapeError`.
    Only call with concrete (non-traced) arrays.
    """
    import numpy as np

    f = np.asarray(f)
    x = np.asarray(x)
    if np.min(f) < 0.0:
        raise errors.PDFSignError()
    if f.ndim == 2:
        if f.shape != x.shape[:2]:
            raise errors.PDFShapeError(
                f"2-D pdf shape {f.shape} != location grid {x.shape[:2]}"
            )
    else:
        if f.shape != x.shape:
            raise errors.PDFShapeError(
                f"1-D pdf shape {f.shape} != location shape {x.shape}"
            )


def marginals(density: Density2D) -> tuple[Density1D, Density1D]:
    """Time/amplitude marginals of a 2-D density.

    Mirrors OTpdf.setMarginals (OTlib.py:146-163): marginal 0 sums over
    axis 0 and lives on x[0, :, 0] (the axis-1 / "time" coordinates);
    marginal 1 sums over axis 1 and lives on x[:, 0, 1].

    The returned 1-D densities are renormalized (each marginal of a
    normalized 2-D pdf sums to 1 up to round-off; ``make_density_1d``
    re-divides exactly as the reference's nested OTpdf construction does).
    """
    f0 = jnp.sum(density.pdf, axis=0)
    f1 = jnp.sum(density.pdf, axis=1)
    x0 = density.x[0, :, 0]
    x1 = density.x[:, 0, 1]
    return make_density_1d(f0, x0), make_density_1d(f1, x1)


def marginals_raw(pdf2d: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Axis sums only (no pytree), for fused differentiable pipelines."""
    return jnp.sum(pdf2d, axis=0), jnp.sum(pdf2d, axis=1)
