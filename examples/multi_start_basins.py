"""Convergence-basin comparison: W2 vs L2, many starting points
(reference source_location_cmt_W2L2_Fig_12).

The reference runs 64 separate scipy inversions in a Python loop; here all
starts run as ONE vmapped on-device LBFGS — the whole Fig-12 experiment is
a single jitted call per misfit type.

Run: python examples/multi_start_basins.py [--nstarts 16] [--nr 8]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import numpy as np

import jax
import jax.numpy as jnp


def main(nstarts: int = 16, nr: int = 8) -> None:
    from waveform_ot_tpu.inversion import (
        InvOptions, TraceConfig, build_loc_cmt_problem, check_convergence,
        loc_cmt_misfit, minimize_multi_start,
    )
    from waveform_ot_tpu.models import (
        StationSet, moment_tensor_from_sdr, synthetic_seismograms,
    )

    nt = 61
    ang = np.linspace(0, 2 * np.pi, nr, endpoint=False)
    stations = StationSet(x=jnp.array(60.0 * np.cos(ang)),
                          y=jnp.array(60.0 * np.sin(ang)))
    loc_true = jnp.array([2.0, -1.5, 12.0])
    mxyz = moment_tensor_from_sdr(30.0, 60.0, 45.0, m0=5.0e6)
    t, s = synthetic_seismograms(*loc_true, mxyz, stations, nt=nt, dt=1.0)
    rng = np.random.default_rng(3)
    obs = s + 0.005 * float(jnp.max(jnp.abs(s))) * jnp.array(
        rng.standard_normal(s.shape))

    cfg = TraceConfig(nu=79, ntg=nt, lambdav=0.04, q=None, p=2)
    prob = build_loc_cmt_problem(t, obs, stations, cfg, mxyz_fixed=mxyz)

    k = int(np.sqrt(nstarts))
    gx, gy = np.meshgrid(np.linspace(-50, 50, k), np.linspace(-50, 50, k))
    starts = jnp.array(np.stack([gx.ravel() + float(loc_true[0]),
                                 gy.ravel() + float(loc_true[1]),
                                 np.full(k * k, 10.0)], axis=1))

    for mistype in ("OT", "L2"):
        opts = InvOptions(loc=True, cmt=False, mistype=mistype)
        fn = lambda m: loc_cmt_misfit(m, prob, opts, cfg)
        run = jax.jit(lambda xs: minimize_multi_start(fn, xs, max_iter=150))
        t0 = time.perf_counter()
        res = run(starts)
        jax.block_until_ready(res.x)
        dt = time.perf_counter() - t0
        conv, dist, cons, frac = check_convergence(
            np.asarray(starts), np.asarray(res.x), np.asarray(loc_true),
            dlimit=2.0, exclude_edge=None)
        print(f"{mistype}: {k*k} starts in {dt:.2f} s -> "
              f"{100*frac:.0f}% converged (median |err| = "
              f"{np.median(dist):.2f} km)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nstarts", type=int, default=16)
    ap.add_argument("--nr", type=int, default=8)
    main(**vars(ap.parse_args()))
