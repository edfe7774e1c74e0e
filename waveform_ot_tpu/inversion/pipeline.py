"""Waveform -> fingerprint -> marginal-Wasserstein misfit pipelines.

Functional rewrite of the reference's L3 glue:

  ricker_util.BuildOTobjfromWaveform (ricker_util.py:204-268)
      -> build_fingerprint / build_target
  ricker_util.CalcWasserWaveform     (ricker_util.py:289-339)
  loc_cmt_util.CalcWasserWaveform    (loc_cmt_util.py:527-574)
      -> trace_misfit (pure value) / calc_wasser_waveform (parity wrapper)

The entire chain is a pure function of the predicted waveform, so one
``jax.value_and_grad`` call replaces the reference's hand-assembled
wdistderiv -> PDFderivMarg -> MargWasserstein-projection chain rule. The
window-origin-time derivative follows the reference convention exactly: a
time shift of the waveform leaves the fingerprint invariant (the grid spans
the waveform) and rigidly translates the time-marginal support, so the
reference's "translate the source marginal" derivative (OTlib.py:1121,
rescaled at ricker_util.py:333 by 1/(tantheta*(t1-t0))) *is* the exact
derivative, and autodiff reproduces it.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from waveform_ot_tpu.ops.fingerprint import (
    FingerprintSpec, Window, fingerprint_density, make_window,
)
from waveform_ot_tpu.ops.marginal import marg_wasserstein_value
from waveform_ot_tpu.ops.otpdf import Density1D, make_density_1d
from waveform_ot_tpu.ops.transforms import arctan_transform


@dataclasses.dataclass(frozen=True)
class TraceConfig:
    """Static per-pipeline configuration (hashable; jit-safe).

    Mirrors the knobs threaded through the reference's data tuples
    (SURVEY.md section 5 'Config / flag system'):
      nu, ntg:   fingerprint grid dims (grid[4:6])
      lambdav:   density length scale (calcpdf lambdav)
      q:         density exponent (None -> exp(-|d|/lam), 2 -> exp(-d^2/lam))
      p:         Wasserstein order (distfunc 'W1'|'W2')
      transform: arctan amplitude squash before fingerprinting
      include_tant_in_dg: reference discrepancy switch - ricker_util.py:333
                 divides the origin-time derivative by tantheta*(t1-t0) but
                 loc_cmt_util.py:569 omits tantheta; True matches ricker.
    """

    nu: int
    ntg: int
    lambdav: float = 0.04
    q: int | None = None
    p: int = 2
    transform: bool = False
    include_tant_in_dg: bool = True

    @property
    def spec(self) -> FingerprintSpec:
        return FingerprintSpec(nu=self.nu, ntg=self.ntg)


class Targets(NamedTuple):
    """Precomputed observed-side marginals (built once per inversion, like
    the reference's wfobs_target, Figs_9_10_11 cell 46)."""

    t: Density1D
    u: Density1D


def apply_transform(w, win: Window, cfg: TraceConfig):
    """Optionally arctan-squash amplitudes into a (0,1) window
    (ricker_util.py:241-244: the window becomes (u0,u1)=(0,1))."""
    if not cfg.transform:
        return w, win
    wn = arctan_transform(w, win.u0, win.u1)
    win01 = Window(win.t0, win.t1, jnp.zeros_like(win.u0),
                   jnp.ones_like(win.u1), win.tantheta)
    return wn, win01


def build_fingerprint(t, w, win: Window, cfg: TraceConfig, impl="auto"):
    """Waveform -> (pdf2d, (tgrid, ugrid)), applying the configured transform.

    Equivalent to BuildOTobjfromWaveform's fingerprint construction
    (ricker_util.py:204-268 / loc_cmt_util.py:448-524); the OTpdf wrapper
    is unnecessary — downstream code consumes the raw field + supports.
    """
    wn, win_used = apply_transform(w, win, cfg)
    return fingerprint_density(t, wn, win_used, cfg.spec,
                               lambdav=cfg.lambdav, q=cfg.q, impl=impl)


def build_target(t, w, win: Window, cfg: TraceConfig, impl="auto") -> Targets:
    """Observed-side marginals, computed once outside the optimizer."""
    pdf, (tg, ug) = build_fingerprint(t, w, win, cfg, impl=impl)
    ft = jnp.sum(pdf, axis=0)
    fu = jnp.sum(pdf, axis=1)
    return Targets(t=make_density_1d(ft, tg), u=make_density_1d(fu, ug))


def trace_misfit(t, w, win: Window, targets: Targets, cfg: TraceConfig,
                 tshift=0.0, impl="auto"):
    """(W_t, W_u) between the predicted waveform's fingerprint marginals and
    precomputed observed marginals. Pure and fully differentiable: gradients
    w.r.t. ``w`` reproduce the reference's PDFderivMarg chain
    (FingerprintLib.py:205-228); the gradient w.r.t. ``tshift`` is the
    reference's normalized window-origin derivative dwg (OTlib.py:1121)."""
    pdf, (tg, ug) = build_fingerprint(t, w, win, cfg, impl=impl)
    return marg_wasserstein_value(pdf, tg, ug, targets.t, targets.u,
                                  p=cfg.p, tshift=tshift)


def dg_scale(win: Window, cfg: TraceConfig):
    """Normalized -> physical origin-time derivative factor
    (ricker_util.py:333 with tantheta; loc_cmt_util.py:569 without)."""
    scale = win.t1 - win.t0
    if cfg.include_tant_in_dg:
        scale = scale * win.tantheta
    return 1.0 / scale


def calc_wasser_waveform(t, w, win: Window, targets: Targets,
                         cfg: TraceConfig, deriv: bool = False,
                         returnmarg: bool = True, impl="auto"):
    """API-parity wrapper matching reference CalcWasserWaveform returns
    (ricker_util.py:289-339):

      returnmarg=True,  deriv=True:  ([Wt, Wu], [dWt/dw, dWu/dw], [dgt, dgu])
      returnmarg=False, deriv=True:  (Wavg, dWavg/dw, dgavg)
      deriv=False:                   [Wt, Wu] or Wavg

    where dW/dw is w.r.t. the waveform amplitudes fed to the fingerprint
    (post-transform if cfg.transform — multiply by the arctan slope to get
    raw-amplitude derivatives, as optfunc does at ricker_util.py:393-397).
    Note w here is the *pre-fingerprint* amplitude array: when
    cfg.transform, pass the already-transformed amplitudes and a (0,1)
    window, exactly like the reference feeds waveformFP.
    """
    cfg_notr = dataclasses.replace(cfg, transform=False)

    if not deriv:
        wt, wu = trace_misfit(t, w, win, targets, cfg_notr, impl=impl)
        if returnmarg:
            return [wt, wu]
        return (wt + wu) / 2.0

    # one shared forward (the fingerprint is the expensive part), two
    # backward passes — one per marginal
    zero = jnp.zeros((), w.dtype)
    (wt, wu), vjp_fn = jax.vjp(
        lambda w_, s_: trace_misfit(t, w_, win, targets, cfg_notr,
                                    tshift=s_, impl=impl), w, zero)
    one = jnp.ones((), wt.dtype)
    zo = jnp.zeros((), wt.dtype)
    drt, dgt = vjp_fn((one, zo))
    dru, _ = vjp_fn((zo, one))
    s = dg_scale(win, cfg)
    if returnmarg:
        return [wt, wu], [drt, dru], [dgt * s, jnp.zeros_like(dgt)]
    return (wt + wu) / 2.0, (drt + dru) / 2.0, dgt * s / 2.0


def grid6_to_window(grid6, theta: float = 45.0, tantheta: float | None = None,
                    dtype=None):
    """Reference 6-tuple (t0,t1,u0,u1,Nu,Nt) -> (Window, FingerprintSpec)."""
    t0, t1, u0, u1, nu, ntg = grid6
    win = make_window(t0, t1, u0, u1, theta=theta, tantheta=tantheta,
                      dtype=dtype)
    return win, FingerprintSpec(nu=int(nu), ntg=int(ntg))


def auto_grid6(t, wave, pad: float = 0.2, nu_factor: float = 1.3):
    """Auto window like BuildOTobjfromWaveform(norm=True)
    (ricker_util.py:233-240): amplitude limits padded by ``pad``*range,
    time limits from the waveform, Nu = int(nu_factor * len(wave)),
    Ntg = len(wave). Host-side (shapes must be static)."""
    import numpy as np

    wave_np = np.asarray(wave)
    t_np = np.asarray(t)
    du = wave_np.max() - wave_np.min()
    return (float(t_np.min()), float(t_np.max()),
            float(wave_np.min() - pad * du), float(wave_np.max() + pad * du),
            int(nu_factor * len(wave_np)), len(wave_np))
