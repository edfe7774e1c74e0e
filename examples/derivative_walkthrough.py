"""Derivative chain walkthrough with finite-difference verification
(reference Ricker_waveform_derivatives notebook).

Checks every derivative stage of the pipeline against central differences:
distance field w.r.t. waveform amplitudes, marginal-Wasserstein w.r.t.
density amplitudes and window origin, full dW/du and dW/dm chain — the
reference runs these interactively (cells 31, 36, 41, 50); here it is one
script printing max errors.

Run: python examples/derivative_walkthrough.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import numpy as np

import jax

# FD verification wants float64; run on CPU (x64 is emulated/slow on TPU)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp


def fd(fn, x, eps=1e-6, idxs=None):
    x = jnp.asarray(x)
    idxs = range(x.size) if idxs is None else idxs
    out = {}
    for i in idxs:
        xp = x.reshape(-1).at[i].add(eps).reshape(x.shape)
        xm = x.reshape(-1).at[i].add(-eps).reshape(x.shape)
        out[i] = (float(fn(xp)) - float(fn(xm))) / (2 * eps)
    return out


def main() -> None:
    from waveform_ot_tpu.inversion import (
        TraceConfig, build_target, make_ricker_problem, ricker_misfit,
        ricker_value_and_grad,
    )
    from waveform_ot_tpu.inversion.pipeline import (
        grid6_to_window, trace_misfit,
    )
    from waveform_ot_tpu.models import ricker_wavelet
    from waveform_ot_tpu.ops import (
        FingerprintSpec, distance_field_diff, grid_axes, make_window,
        normalize_vertices,
    )

    rng = np.random.default_rng(1)

    # stage 1: distance field w.r.t. waveform amplitudes -------------------
    nt = 40
    t = jnp.linspace(-2.0, 2.0, nt)
    w = jnp.array(np.sin(3 * np.asarray(t)) + 0.05 * rng.standard_normal(nt))
    win = make_window(-2.0, 2.0, float(w.min()) - 0.3, float(w.max()) + 0.3)
    spec = FingerprintSpec(nu=24, ntg=nt)

    def dsum(w_):
        v = normalize_vertices(t, w_, win)
        tg, ug = grid_axes(t, win, spec)
        return jnp.sum(jnp.sin(distance_field_diff(v, tg, ug, "jnp")))

    g = jax.grad(dsum)(w)
    fds = fd(jax.jit(dsum), w, idxs=[0, 5, 17, 33])
    err = max(abs(float(g[i]) - v) for i, v in fds.items())
    print(f"stage 1  d(distance field)/d(amplitude)  max FD err = {err:.2e}")

    # stage 2: full trace misfit w.r.t. waveform + window shift ------------
    mtrue = (0.0, 1.6, 1.0)
    trange = (-2.0, 7.0)
    tobs, wobs = ricker_wavelet(*mtrue, trange=trange)
    wobs = wobs + 0.01 * jnp.max(jnp.abs(wobs)) * jnp.asarray(
        rng.standard_normal(wobs.shape))
    grid6 = (-2.0, 7.0, -2.0, 2.6, 80, 512)
    win2, _ = grid6_to_window(grid6)
    cfg = TraceConfig(nu=80, ntg=512, lambdav=0.03, q=None, p=2,
                      transform=True)
    targets = build_target(tobs, wobs, win2, cfg, impl="jnp")
    tp, wp = ricker_wavelet(0.4, 1.2, 1.1, trange=trange)

    def wsum(w_):
        wt, wu = trace_misfit(tp, w_, win2, targets, cfg, impl="jnp")
        return 0.5 * (wt + wu)

    g2 = jax.grad(wsum)(wp)
    # indices inside the active wavelet: in the flat tails an amplitude
    # perturbation flips nearest segments and central differences break
    # (the reference documents this caveat at FingerprintLib.py:517)
    fds2 = fd(jax.jit(wsum), wp, idxs=[90, 128, 180])
    err2 = max(abs(float(g2[i]) - v) for i, v in fds2.items())
    print(f"stage 2  dW/d(waveform amplitude)        max FD err = {err2:.2e}")

    # stage 3: end-to-end dW/dm via one value_and_grad ---------------------
    prob, _ = make_ricker_problem(targets, grid6, trange=trange, alpha=0.5,
                                  lambdav=0.03)
    m = jnp.array([0.4, 1.2, 1.1])
    w2, dm = ricker_value_and_grad(m, prob, cfg, impl="jnp")
    mis = jax.jit(lambda mm: ricker_misfit(mm, prob, cfg, impl="jnp"))
    fds3 = fd(mis, m, eps=1e-6)
    errs = [abs(float(dm[i]) - fds3[i]) for i in range(3)]
    print(f"stage 3  dW/dm (t0, amp, freq) vs FD     errs = "
          f"{errs[0]:.2e} {errs[1]:.2e} {errs[2]:.2e}")
    print(f"         W2 = {float(w2):.6e}, grad = {np.asarray(dm)}")
    assert err < 1e-6 and err2 < 1e-6 and max(errs) < 1e-6
    print("OK - all derivative stages verified by central differences")


if __name__ == "__main__":
    main()
