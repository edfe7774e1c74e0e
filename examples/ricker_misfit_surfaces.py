"""W1/W2 vs L2 misfit surfaces for the double-Ricker problem
(reference Ricker_Figs_1_7).

The reference evaluates the misfit at each (time-shift x amplitude) grid
node in a serial Python loop and caches to pickle; here the whole surface
is ONE vmapped, jitted evaluation (SURVEY.md 3.5).

Run: python examples/ricker_misfit_surfaces.py [--n 20] [--plot]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import numpy as np

import jax
import jax.numpy as jnp


def main(n: int = 20, plot: bool = False) -> None:
    from waveform_ot_tpu.inversion import (
        TraceConfig, build_target, make_ricker_problem, ricker_misfit,
    )
    from waveform_ot_tpu.inversion.l2 import ls_misfit
    from waveform_ot_tpu.inversion.pipeline import grid6_to_window
    from waveform_ot_tpu.models import ricker_wavelet

    mtrue = jnp.array([0.0, 1.6, 1.0])
    trange = (-2.0, 7.0)
    tobs, wobs = ricker_wavelet(*mtrue, trange=trange)
    rng = np.random.default_rng(0)
    wobs = wobs + 0.01 * float(jnp.max(jnp.abs(wobs))) * jnp.asarray(
        rng.standard_normal(wobs.shape), wobs.dtype)

    grid6 = (-2.0, 7.0, -2.0, 2.6, 80, 512)
    win, spec = grid6_to_window(grid6)
    cfg = TraceConfig(nu=80, ntg=512, lambdav=0.03, q=None, p=2,
                      transform=True)
    targets = build_target(tobs, wobs, win, cfg)
    prob, _ = make_ricker_problem(targets, grid6, trange=trange, alpha=0.5,
                                  lambdav=0.03)

    import dataclasses

    cfg_w1 = dataclasses.replace(cfg, p=1)

    def l2_of(m):
        t, w = ricker_wavelet(m[0], m[1], m[2], trange=trange)
        return ls_misfit(tobs, wobs, t, w, nt=wobs.shape[0])

    # -- 1-D time-shift profiles (paper Fig 1): W1/W2 stay quasi-convex
    #    over multi-period shifts where L2 cycle-skips ---------------------
    nprof = max(41, n)
    shifts = jnp.linspace(-3.0, 3.0, nprof)
    msp = jnp.stack([shifts, jnp.full(nprof, 1.6), jnp.ones(nprof)], axis=1)
    w1p = jax.jit(jax.vmap(lambda m: ricker_misfit(m, prob, cfg_w1)))(msp)
    w2p = jax.jit(jax.vmap(lambda m: ricker_misfit(m, prob, cfg)))(msp)
    l2p = jax.jit(jax.vmap(l2_of))(msp)

    def n_local_minima(v):
        v = np.asarray(v)
        return int(np.sum((v[1:-1] < v[:-2]) & (v[1:-1] <= v[2:])))

    nw1, nw2, nl2 = (n_local_minima(v) for v in (w1p, w2p, l2p))
    print(f"time-shift profile local minima: W1={nw1} W2={nw2} L2={nl2}")
    assert nw1 <= 2 and nw2 <= 2 and nl2 > nw2, \
        "expected W basins wider/fewer than L2's cycle-skipping minima"

    tshifts = jnp.linspace(-1.5, 1.5, n)
    amps = jnp.linspace(0.8, 2.4, n)
    tv, av = jnp.meshgrid(tshifts, amps)
    ms = jnp.stack([tv.ravel(), av.ravel(),
                    jnp.ones(n * n, tv.dtype)], axis=1)

    surface = jax.jit(jax.vmap(lambda m: ricker_misfit(m, prob, cfg)))
    t0 = time.perf_counter()
    w2 = surface(ms)
    jax.block_until_ready(w2)
    print(f"W2 surface {n}x{n} ({n*n} objective evals): "
          f"{time.perf_counter()-t0:.3f} s (incl. compile)")
    t0 = time.perf_counter()
    w2 = surface(ms)
    jax.block_until_ready(w2)
    print(f"steady state: {time.perf_counter()-t0:.3f} s")

    w1 = jax.jit(jax.vmap(lambda m: ricker_misfit(m, prob, cfg_w1)))(ms)
    l2 = jax.jit(jax.vmap(l2_of))(ms)

    iw = int(jnp.argmin(w2))
    iw1 = int(jnp.argmin(w1))
    il = int(jnp.argmin(l2))
    print(f"W2 minimum at tshift={float(ms[iw,0]):+.3f} amp={float(ms[iw,1]):.3f}")
    print(f"W1 minimum at tshift={float(ms[iw1,0]):+.3f} amp={float(ms[iw1,1]):.3f}")
    print(f"L2 minimum at tshift={float(ms[il,0]):+.3f} amp={float(ms[il,1]):.3f}")

    if plot:
        from waveform_ot_tpu import viz

        viz.plot_misfit_surface(np.asarray(w2).reshape(n, n), tshifts, amps,
                                xtrue=0.0, ytrue=1.6,
                                filename="ricker_w2_surface.png",
                                xlab="time shift", ylab="amplitude")
        viz.plot_misfit_surface(np.asarray(l2).reshape(n, n), tshifts, amps,
                                xtrue=0.0, ytrue=1.6,
                                filename="ricker_l2_surface.png",
                                xlab="time shift", ylab="amplitude")
        viz.plot_misfit_surface(np.asarray(w1).reshape(n, n), tshifts, amps,
                                xtrue=0.0, ytrue=1.6,
                                filename="ricker_w1_surface.png",
                                xlab="time shift", ylab="amplitude")
        viz.plot_misfit_profiles(shifts, [w1p, w2p, l2p],
                                 ["W1", "W2", "L2"],
                                 title="Fig-1 time-shift profiles",
                                 filename="ricker_profiles.png")
        print("wrote ricker_w2_surface.png, ricker_l2_surface.png, "
              "ricker_w1_surface.png, ricker_profiles.png")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--plot", action="store_true")
    main(**vars(ap.parse_args()))
