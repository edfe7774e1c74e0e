"""Inversion objective functions.

Rewrites of the reference's scipy-facing objectives:
  ricker_util.optfunc        (ricker_util.py:373-404)  -> ricker_objective
  loc_cmt_util.optfunc_OT    (loc_cmt_util.py:186-306) -> loc_cmt_objective
  loc_cmt_util.optfunc_L2    (loc_cmt_util.py:120-183) -> loc_cmt_l2_objective
(the loc/CMT objectives live in inversion/loc_cmt.py; this module holds the
Ricker problem).

Two flavours are provided:
  * ``ricker_misfit`` — the TPU-native scalar objective: one pure function,
    gradients via ``jax.value_and_grad``. Because a tpert shift leaves the
    fingerprint invariant and translates the time-marginal support (see
    inversion/pipeline.py docstring), autodiff reproduces the reference's
    'deriv[0] = dg' window-derivative convention exactly.
  * ``ricker_objective`` — API-parity wrapper returning (w2, deriv) with the
    reference's explicit chain assembly (analytic wavelet jacobian, arctan
    slope correction, dg overwrite; ricker_util.py:384-403) for bit-level
    comparison and scipy.optimize use.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from waveform_ot_tpu.inversion.pipeline import (
    Targets, TraceConfig, calc_wasser_waveform, grid6_to_window,
    trace_misfit,
)
from waveform_ot_tpu.models.ricker import (
    ricker_wavelet, ricker_wavelet_with_jacobian,
)
from waveform_ot_tpu.ops.fingerprint import Window
from waveform_ot_tpu.ops.transforms import arctan_transform


class RickerProblem(NamedTuple):
    """Pytree bundling the reference's positional data list
    (ricker_util.py:382-383: [wfobs_target, distfunc, trange, grid,
    lambdav, transform, alpha, theta])."""

    targets: Targets
    window: Window  # raw-amplitude window (u0,u1 pre-transform)
    trange: tuple
    alpha: float


def make_ricker_problem(targets: Targets, grid6, trange=(-2.0, 7.0),
                        alpha: float = 0.5, theta: float = 45.0,
                        lambdav: float = 0.03, p: int = 2,
                        q: int | None = None, transform: bool = True):
    win, spec = grid6_to_window(grid6, theta=theta)
    cfg = TraceConfig(nu=spec.nu, ntg=spec.ntg, lambdav=lambdav, q=q, p=p,
                      transform=transform)
    prob = RickerProblem(targets=targets, window=win, trange=tuple(trange),
                         alpha=alpha)
    return prob, cfg


def ricker_misfit(m, prob: RickerProblem, cfg: TraceConfig, impl="auto"):
    """Scalar objective: weighted marginal Wasserstein of the double-Ricker
    fit, w2 = alpha*W_t + (1-alpha)*W_u (eqn 21; ricker_util.py:390)."""
    t, w = ricker_wavelet(m[0], m[1], m[2], trange=prob.trange)
    wt, wu = trace_misfit(t, w, prob.window, prob.targets, cfg, impl=impl)
    return prob.alpha * wt + (1.0 - prob.alpha) * wu


def ricker_value_and_grad(m, prob: RickerProblem, cfg: TraceConfig,
                          impl="auto"):
    """Native (w2, dw2/dm) via autodiff of :func:`ricker_misfit`."""
    return jax.value_and_grad(ricker_misfit)(m, prob, cfg, impl=impl)


def ricker_objective(m, prob: RickerProblem, cfg: TraceConfig, impl="auto"):
    """(w2, deriv) with the reference's explicit assembly
    (ricker_util.py:384-403):

      forward wavelet + analytic jacobian -> arctan transform -> fingerprint
      misfit per marginal -> dr scaled by arctan slope -> deriv = dudm . dr
      mixed by alpha -> deriv[0] overwritten by the window derivative dg.
    """
    tpos, wpos, dudm = ricker_wavelet_with_jacobian(
        m[0], m[1], m[2], trange=prob.trange)
    win = prob.window
    un, dundu = arctan_transform(wpos, win.u0, win.u1, deriv=True)
    win01 = Window(win.t0, win.t1, jnp.zeros_like(win.u0),
                   jnp.ones_like(win.u1), win.tantheta)
    cfg_fp = dataclasses.replace(cfg, transform=False)
    w2M, dr, dgM = calc_wasser_waveform(
        tpos, un, win01, prob.targets, cfg_fp, deriv=True, returnmarg=True,
        impl=impl)
    a = prob.alpha
    w2 = a * w2M[0] + (1.0 - a) * w2M[1]
    dg = a * dgM[0] + (1.0 - a) * dgM[1]
    drt = dr[0] * dundu
    dru = dr[1] * dundu
    hp = jax.lax.Precision.HIGHEST  # tiny (3, nt) chain matmuls: avoid
    deriv = (a * jnp.matmul(dudm, drt, precision=hp)  # TPU bf16 default
             + (1.0 - a) * jnp.matmul(dudm, dru, precision=hp))
    deriv = deriv.at[0].set(dg)
    return w2, deriv
