"""Earthquake source-location inversion with W2 vs L2 misfits
(reference source_location_cmt_W2L2_Figs_9_10_11).

Synthetic seismograms (on-device far-field forward; swap in the pyprop8
bridge when pyprop8 is installed) at a ring of receivers, observed side
perturbed with noise; one L-BFGS-B inversion per misfit plus a vmapped
misfit-grid scan — the scan the reference runs as 1,764 serial objective
evaluations is one jitted call here.

Run: python examples/loc_cmt_inversion.py [--nr 12] [--grid 11] [--plot]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import numpy as np

import jax
import jax.numpy as jnp


def main(nr: int = 12, grid: int = 11, plot: bool = False) -> None:
    from waveform_ot_tpu.inversion import (
        InvOptions, TraceConfig, build_loc_cmt_problem,
        loc_cmt_value_and_grad, minimize_scipy, misfit_grid,
    )
    from waveform_ot_tpu.models import (
        StationSet, moment_tensor_from_sdr, synthetic_seismograms,
    )

    nt = 61
    ang = np.linspace(0, 2 * np.pi, nr, endpoint=False)
    stations = StationSet(x=jnp.array(60.0 * np.cos(ang) + 5.0),
                          y=jnp.array(60.0 * np.sin(ang) - 3.0))
    loc_true = jnp.array([2.0, -1.5, 12.0])
    mxyz = moment_tensor_from_sdr(30.0, 60.0, 45.0, m0=5.0e6)
    t, s = synthetic_seismograms(*loc_true, mxyz, stations, nt=nt, dt=1.0)
    rng = np.random.default_rng(7)
    obs = s + 0.01 * float(jnp.max(jnp.abs(s))) * jnp.array(
        rng.standard_normal(s.shape))

    cfg = TraceConfig(nu=79, ntg=nt, lambdav=0.04, q=None, p=2)
    prob = build_loc_cmt_problem(t, obs, stations, cfg,
                                 mxyz_fixed=mxyz)
    m0 = loc_true + jnp.array([25.0, -20.0, 8.0])
    print("start:", np.asarray(m0), " true:", np.asarray(loc_true))

    for mistype in ("OT", "L2"):
        opts = InvOptions(loc=True, cmt=False, mistype=mistype)
        res = minimize_scipy(
            lambda m: loc_cmt_value_and_grad(m, prob, opts, cfg), m0)
        err = np.linalg.norm(res.x - np.asarray(loc_true))
        print(f"{mistype}: solution={np.round(res.x, 3)} |err|={err:.3f} "
              f"iters={res.nit} success={res.success}")

    # vmapped misfit surface scan over (x, y) at a few depths --------------
    opts = InvOptions(loc=True, cmt=False, mistype="OT")
    xs = jnp.linspace(-40.0, 44.0, grid)
    ys = jnp.linspace(-40.0, 44.0, grid)
    zs = jnp.array([6.0, 12.0, 20.0])
    xv, yv, zv = jnp.meshgrid(xs, ys, zs, indexing="ij")
    ms = jnp.stack([xv.ravel(), yv.ravel(), zv.ravel()], axis=1)
    scan = jax.jit(lambda mm: misfit_grid(mm, prob, opts, cfg))
    t0 = time.perf_counter()
    vals = scan(ms)
    jax.block_until_ready(vals)
    print(f"misfit grid {grid}x{grid}x3 = {ms.shape[0]} objective evals: "
          f"{time.perf_counter()-t0:.2f} s (incl. compile)")
    t0 = time.perf_counter()
    vals = scan(ms)
    jax.block_until_ready(vals)
    print(f"steady state: {time.perf_counter()-t0:.3f} s")
    imin = int(jnp.argmin(vals))
    print(f"grid minimum at {np.round(np.asarray(ms[imin]), 2)}")

    if plot:
        from waveform_ot_tpu import viz

        v3 = np.asarray(vals).reshape(grid, grid, 3)
        xg, yg = np.meshgrid(np.asarray(xs), np.asarray(ys), indexing="ij")
        viz.plot_misfit_section(v3[:, :, 1], xg, yg,
                                sol=(float(loc_true[0]),
                                     float(loc_true[1])),
                                title="W2 misfit at z=12 km",
                                filename="loc_cmt_misfit_section.png")
        viz.plot_seismograms(np.asarray(s[:4]), np.asarray(t),
                             overlays=[np.asarray(obs[:4])],
                             filename="loc_cmt_seis.png")
        print("wrote loc_cmt_misfit_section.png, loc_cmt_seis.png")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nr", type=int, default=12)
    ap.add_argument("--grid", type=int, default=11)
    ap.add_argument("--plot", action="store_true")
    main(**vars(ap.parse_args()))
