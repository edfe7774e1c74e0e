"""Per-trace fingerprint window construction (batched).

Reference: loc_cmt_util.buildFingerprintwindows (loc_cmt_util.py:430-446)
builds a Python list-of-lists of per-(receiver, component) windows with a
double loop; here the windows are a single :class:`Window` pytree whose
fields carry the (nr, nc) batch dims, ready for ``jax.vmap``.
"""

from __future__ import annotations

import jax.numpy as jnp

from waveform_ot_tpu.ops.fingerprint import Window


def build_windows(t, wave, pad: float = 0.3, u0=None, u1=None,
                  tantheta: float = 1.0) -> Window:
    """Batched amplitude windows from observed traces.

    Args:
      t: (nt,) shared time axis.
      wave: (..., nt) traces (any leading batch dims).
      pad: amplitude padding fraction (reference uses 0.3).
      u0, u1: optional fixed limits overriding the per-trace ones.

    Returns a Window whose u0/u1 have the batch shape ``wave.shape[:-1]``
    and whose t0/t1/tantheta are scalars (shared time axis).
    """
    wmin = jnp.min(wave, axis=-1)
    wmax = jnp.max(wave, axis=-1)
    du = wmax - wmin
    u0a = wmin - pad * du if u0 is None else jnp.broadcast_to(u0, wmin.shape)
    u1a = wmax + pad * du if u1 is None else jnp.broadcast_to(u1, wmax.shape)
    return Window(t0=jnp.min(t), t1=jnp.max(t), u0=u0a, u1=u1a,
                  tantheta=jnp.asarray(tantheta, u0a.dtype))


def unit_amplitude_windows(win: Window) -> Window:
    """(0,1)-amplitude windows after the arctan transform — the reference's
    ``obs_grids01`` (loc_cmt_util.py:498)."""
    return Window(t0=win.t0, t1=win.t1, u0=jnp.zeros_like(win.u0),
                  u1=jnp.ones_like(win.u1), tantheta=win.tantheta)


def default_grid_dims(nt: int, factor: float = 1.3) -> tuple[int, int]:
    """(nu, ntg) defaults: Nu = int(1.3*nt), Ntg = nt
    (loc_cmt_util.py:441-444; ricker_util.py:239-240)."""
    return int(factor * nt), nt
