"""L2 waveform misfit utilities.

Reference: ricker_util.datawindowunion / LSmisfit (ricker_util.py:91-103,
341-343) — interpolate two waveforms onto the union of their time windows
(zero fill outside) and take the squared residual sum. Used by the L2-vs-W2
comparison figures.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def window_union(tref, wref, t, w, nt: int | None = None):
    """Resample both waveforms onto the union time grid with zero fill.

    Matches datawindowunion: grid from min(t0) to max(t1) at the spacing of
    ``t``; values outside each waveform's support are zero. ``nt`` must be
    static under jit (defaults to the reference's int((t1-t0)/dt) only in
    eager mode).
    """
    t0 = jnp.minimum(tref[0], t[0])
    t1 = jnp.maximum(tref[-1], t[-1])
    if nt is None:
        dt = float(t[1] - t[0])
        nt = int((float(t1) - float(t0)) / dt)
    tnew = jnp.linspace(t0, t1, nt)
    w1 = jnp.interp(tnew, t, w, left=0.0, right=0.0)
    w2 = jnp.interp(tnew, tref, wref, left=0.0, right=0.0)
    return w1, w2, tnew


def ls_misfit(tref, wref, tpred, wpred, nt: int | None = None):
    """Sum of squared residuals on the union grid (reference LSmisfit)."""
    w1, w2, _ = window_union(tref, wref, tpred, wpred, nt=nt)
    r = w1 - w2
    return jnp.dot(r, r, precision=jax.lax.Precision.HIGHEST)
