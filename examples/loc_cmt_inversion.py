"""Earthquake source-location inversion with W2 vs L2 misfits
(reference source_location_cmt_W2L2_Figs_9_10_11).

Default physics is the on-device layered-medium f-k forward
(models/layered.py) on the reference's six-layer Fukuoka crustal model
with the GCMT 2005 Mw 6.6 mechanism (strike=302, dip=88, rake=-14,
Figs_9_10_11 cells 10-23) — the same experiment the reference drives with
pyprop8. ``--physics farfield`` switches to the homogeneous far-field
synthetic for a fast smoke run. Observed data carry white noise; one
L-BFGS-B inversion per misfit plus a misfit-grid scan (the scan the
reference runs as 1,764 serial objective evaluations and caches to
pickle is one jitted call here — depth-amortized through
layered_misfit_grid for the layered physics, 0.9 ms/node on one v5e).

Run: python examples/loc_cmt_inversion.py [--physics layered|farfield]
     [--grid 7] [--nk 384] [--plot]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import numpy as np

import jax
import jax.numpy as jnp


FUKUOKA_X = [10., 30., 50., -15., 8., 25., -25., 55., 80., 75., -70.]
FUKUOKA_Y = [-75., -77., -70., -50., -46., -42., -25., -26., -23., -5., 30.]


def main(physics: str = "layered", grid: int = 7, nk: int = 384,
         plot: bool = False) -> None:
    # CPU: float64 oracle path (x64). TPU: float32 inputs — the layered
    # forward then runs its x64-free all-dd32 production path
    # (emulated f64 on this TPU runtime is ~1000x and miscompiles the
    # stack algebra; models/layered.py docstring).
    on_tpu = jax.default_backend() != "cpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float32 if on_tpu else jnp.float64
    from waveform_ot_tpu.inversion import (
        InvOptions, TraceConfig, build_loc_cmt_problem,
        loc_cmt_value_and_grad, minimize_scipy, misfit_grid,
    )
    from waveform_ot_tpu.models import (
        StationSet, fukuoka_model, make_layered_forward,
        moment_tensor_from_sdr, synthetic_seismograms,
    )

    nt = 61
    if physics == "layered":
        # the reference's Fukuoka network (Figs_9_10_11 cell 17)
        stations = StationSet(x=jnp.asarray(FUKUOKA_X, dtype),
                              y=jnp.asarray(FUKUOKA_Y, dtype))
        # GCMT mechanism, Mo in the reference's 1e-13/Nm moment units
        mxyz = moment_tensor_from_sdr(302.0, 88.0, -14.0,
                                      m0=0.93e6).astype(dtype)
        loc_true = jnp.asarray([1.0, 1.0, 20.0], dtype)
        forward = make_layered_forward(stations, model=fukuoka_model(),
                                       nt=nt, dt=1.0, nk=nk, kmax=1.8)
        t = jnp.arange(nt, dtype=dtype)
        # jit the data-generation forward too: op-by-op dispatch of the
        # f-k synthesis hits unimplemented eager kernels on the TPU runtime
        s = jax.jit(forward)(*loc_true, mxyz)
    else:
        nr = 12
        ang = np.linspace(0, 2 * np.pi, nr, endpoint=False)
        stations = StationSet(x=jnp.asarray(60.0 * np.cos(ang) + 5.0, dtype),
                              y=jnp.asarray(60.0 * np.sin(ang) - 3.0, dtype))
        loc_true = jnp.asarray([2.0, -1.5, 12.0], dtype)
        mxyz = moment_tensor_from_sdr(30.0, 60.0, 45.0, m0=5.0e6).astype(
            dtype)
        forward = None
        t, s = synthetic_seismograms(*loc_true, mxyz, stations, nt=nt,
                                     dt=1.0)
    rng = np.random.default_rng(7)
    obs = s + 0.01 * float(jnp.max(jnp.abs(s))) * jnp.array(
        rng.standard_normal(s.shape))

    cfg = TraceConfig(nu=79, ntg=nt, lambdav=0.04, q=None, p=2)
    prob = build_loc_cmt_problem(t, obs, stations, cfg,
                                 mxyz_fixed=mxyz)
    m0 = loc_true + jnp.array([20.0, -15.0, 6.0])
    print(f"physics={physics}  start: {np.asarray(m0)}  "
          f"true: {np.asarray(loc_true)}")

    errs = {}
    for mistype in ("OT", "L2"):
        opts = InvOptions(loc=True, cmt=False, mistype=mistype)
        res = minimize_scipy(
            lambda m: loc_cmt_value_and_grad(m, prob, opts, cfg,
                                             forward=forward), m0)
        errs[mistype] = err = np.linalg.norm(res.x - np.asarray(loc_true))
        print(f"{mistype}: solution={np.round(res.x, 3)} |err|={err:.3f} "
              f"iters={res.nit} success={res.success}")
    # the experiment's outcome (Figs 9-11): from this distant start the W2
    # objective's broad valley recovers the source (L2's narrow basin may
    # not — that contrast is the paper's point, so only OT is asserted)
    assert errs["OT"] < 2.0, f"OT recovery failed: |err|={errs['OT']:.3f} km"

    # misfit surface scan over (x, y) at two depths ------------------------
    opts = InvOptions(loc=True, cmt=False, mistype="OT")
    xs = jnp.linspace(-40.0, 44.0, grid)
    ys = jnp.linspace(-40.0, 44.0, grid)
    zs = jnp.array([10.0, 20.0]) if physics == "layered" else \
        jnp.array([6.0, 12.0, 20.0])
    if physics == "layered":
        # depth-amortized scan: stage A (the expensive interface scans)
        # once per z-slice, stage B + OT per (x, y) node — the measured
        # 0.9 ms/node path (BASELINE.md round-5). z_loop='unroll' on CPU:
        # the XLA CPU fusion emitter perturbs scan-wrapped f-k bodies
        # (layered_misfit_grid docstring); TPU runs 'scan' clean.
        from waveform_ot_tpu.inversion import layered_misfit_grid
        from waveform_ot_tpu.models import make_layered_stages

        stages = make_layered_stages(model=fukuoka_model(), nt=nt, dt=1.0,
                                     nk=nk, kmax=1.8)
        xv, yv = jnp.meshgrid(xs, ys, indexing="ij")
        xy = jnp.stack([xv.ravel(), yv.ravel()], axis=1)
        zv3, xv3, yv3 = jnp.meshgrid(zs, xs, ys, indexing="ij")
        ms = jnp.stack([xv3.ravel(), yv3.ravel(), zv3.ravel()], axis=1)
        z_loop = "scan" if on_tpu else "unroll"
        scan = jax.jit(lambda zz, xx: layered_misfit_grid(
            zz, xx, prob, opts, cfg, stages, z_loop=z_loop)[0].ravel())
        scan_args = (zs, xy)
    else:
        xv, yv, zv = jnp.meshgrid(xs, ys, zs, indexing="ij")
        ms = jnp.stack([xv.ravel(), yv.ravel(), zv.ravel()], axis=1)
        scan = jax.jit(lambda mm: misfit_grid(mm, prob, opts, cfg,
                                              forward=forward))
        scan_args = (ms,)
    t0 = time.perf_counter()
    vals = scan(*scan_args)
    jax.block_until_ready(vals)
    print(f"misfit grid {grid}x{grid}x{zs.shape[0]} = {ms.shape[0]} "
          f"objective evals: {time.perf_counter()-t0:.2f} s (incl. compile)")
    t0 = time.perf_counter()
    vals = scan(*scan_args)
    jax.block_until_ready(vals)
    print(f"steady state: {time.perf_counter()-t0:.3f} s")
    imin = int(jnp.argmin(vals))
    print(f"grid minimum at {np.round(np.asarray(ms[imin]), 2)}")
    # the misfit surface's global grid minimum must sit within one grid
    # cell of the true epicentre (Figs_9_10_11 cell 64's surface shape)
    dx = float(xs[1] - xs[0])
    assert abs(float(ms[imin, 0]) - float(loc_true[0])) <= dx + 1e-6 and \
        abs(float(ms[imin, 1]) - float(loc_true[1])) <= dx + 1e-6, \
        f"grid minimum {np.asarray(ms[imin])} far from {np.asarray(loc_true)}"

    if plot:
        from waveform_ot_tpu import viz

        nz = int(zs.shape[0])
        if physics == "layered":   # layered scan orders (z, x, y)
            v3 = np.moveaxis(np.asarray(vals).reshape(nz, grid, grid), 0, -1)
        else:
            v3 = np.asarray(vals).reshape(grid, grid, nz)
        xg, yg = np.meshgrid(np.asarray(xs), np.asarray(ys), indexing="ij")
        viz.plot_misfit_section(v3[:, :, nz - 1], xg, yg,
                                sol=(float(loc_true[0]),
                                     float(loc_true[1])),
                                title=f"W2 misfit at z={float(zs[-1])} km",
                                filename="loc_cmt_misfit_section.png")
        viz.plot_seismograms(np.asarray(s[:4]), np.asarray(t),
                             overlays=[np.asarray(obs[:4])],
                             filename="loc_cmt_seis.png")
        print("wrote loc_cmt_misfit_section.png, loc_cmt_seis.png")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--physics", choices=("layered", "farfield"),
                    default="layered")
    ap.add_argument("--grid", type=int, default=7)
    ap.add_argument("--nk", type=int, default=384)
    ap.add_argument("--plot", action="store_true")
    main(**vars(ap.parse_args()))
