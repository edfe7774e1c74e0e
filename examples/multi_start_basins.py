"""Convergence-basin comparison: W2 vs L2, many starting points
(reference source_location_cmt_W2L2_Fig_12).

The reference runs 64 separate scipy inversions in a Python loop; here all
starts run as ONE vmapped on-device LBFGS — the whole Fig-12 experiment is
a single jitted call per misfit type.

Modes (mirroring Fig_12 cells 34-47):
  * location-only (default): 3-dim (x, y, z) starts on a grid;
  * ``--cmt``: the notebook's joint loc+CMT mode — 9-dim parameter space,
    each start's moment-tensor block initialized by the linear Moment_LS
    solve at that start (cell 43), constant preconditioning
    (precontype='constant': mscal = [60 km x3, Mo x6]).

Physics: the on-device layered-medium f-k forward (models/layered.py) on
the reference's six-layer Fukuoka crustal model by default, or the fast
homogeneous far-field synthetic with ``--physics farfield``.

Run: python examples/multi_start_basins.py [--nstarts 16] [--nr 8]
         [--cmt] [--physics layered|farfield]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import numpy as np

import jax
import jax.numpy as jnp


def main(nstarts: int = 16, nr: int = 8, cmt: bool = False,
         physics: str = "layered", nk: int = 256) -> None:
    from waveform_ot_tpu.inversion import (
        InvOptions, TraceConfig, build_loc_cmt_problem, check_convergence,
        loc_cmt_misfit, minimize_multi_start,
    )
    from waveform_ot_tpu.models import (
        StationSet, fukuoka_model, make_layered_forward, moment_tensor_ls,
        moment_tensor_from_sdr, synthetic_seismograms, upper_from_mxyz,
    )

    # Precision is chosen before ANY array creation (mixed-precision
    # pytrees break the solver's while_loop carries). CPU: float64 oracle
    # path (x64). TPU: float32 inputs — the layered forward runs its
    # x64-free all-dd32 production path (emulated f64 on this
    # TPU runtime is ~1000x and miscompiles; models/layered.py docstring).
    on_tpu = jax.default_backend() != "cpu"
    if not on_tpu and not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float32 if on_tpu else jnp.float64

    nt = 61
    ang = np.linspace(0, 2 * np.pi, nr, endpoint=False)
    stations = StationSet(x=jnp.asarray(60.0 * np.cos(ang), dtype),
                          y=jnp.asarray(60.0 * np.sin(ang), dtype))
    loc_true = jnp.asarray([2.0, -1.5, 12.0], dtype)
    mxyz = moment_tensor_from_sdr(30.0, 60.0, 45.0, m0=5.0e6).astype(dtype)

    if physics == "layered":
        forward = make_layered_forward(stations, model=fukuoka_model(),
                                       nt=nt, dt=1.0, nk=nk)
        t = jnp.arange(nt, dtype=dtype)
        # jit the data generation too: op-by-op dispatch of the f-k
        # synthesis hits unimplemented eager kernels on the TPU runtime
        s = jax.jit(forward)(*loc_true, mxyz)
    else:
        forward = None
        t, s = synthetic_seismograms(*loc_true, mxyz, stations, nt=nt,
                                     dt=1.0)
    rng = np.random.default_rng(3)
    obs = s + 0.005 * float(jnp.max(jnp.abs(s))) * jnp.array(
        rng.standard_normal(s.shape))

    cfg = TraceConfig(nu=79, ntg=nt, lambdav=0.04, q=None, p=2)
    prob = build_loc_cmt_problem(t, obs, stations, cfg, mxyz_fixed=mxyz)

    k = int(np.sqrt(nstarts))
    # the 9-dim joint mode starts nearer the source: with the homogeneous
    # far-field physics the joint OT/L2 landscapes carry local minima
    # beyond ~20 km (verified with scipy too — a landscape property, not a
    # solver one), unlike the reference's layered Fukuoka setup whose OT
    # basin spans its (-40,-40,40) start (Fig_12 cell 42)
    span = 12.0 if cmt else 50.0
    gx, gy = np.meshgrid(np.linspace(-span, span, k),
                         np.linspace(-span, span, k))
    starts = jnp.array(np.stack([gx.ravel() + float(loc_true[0]),
                                 gy.ravel() + float(loc_true[1]),
                                 np.full(k * k, 10.0)], axis=1))

    if cmt:
        # per-start CMT block from the linear LS solve at that start
        # (Fig_12 cell 43: mstart = append(mstart, Moment_LS(mstart, ...)))
        from waveform_ot_tpu.models import mxyz_from_upper

        def ls_at(l):
            fwd = None if forward is None else (
                lambda m6: forward(l[0], l[1], l[2], mxyz_from_upper(m6)))
            return moment_tensor_ls(l, stations, obs, nt=nt, dt=1.0,
                                    forward=fwd)

        m6s = jax.vmap(ls_at)(starts)
        starts9 = jnp.concatenate([starts, m6s], axis=1)
        mscal = jnp.concatenate(
            [jnp.full(3, 60.0),
             jnp.full(6, float(jnp.abs(upper_from_mxyz(mxyz)).max()))])
        prob = prob._replace(mscal=mscal.astype(starts.dtype))
        starts = starts9 / mscal
        m_true_full = np.concatenate([np.asarray(loc_true),
                                      np.asarray(upper_from_mxyz(mxyz))])
    else:
        mscal = jnp.ones(3)
        m_true_full = np.asarray(loc_true)

    max_iter = 600 if cmt else 150   # the 9-dim OT surface is
    # ill-conditioned in the tensor block; scipy needs ~300 evals too
    for mistype in ("OT", "L2"):
        opts = InvOptions(loc=True, cmt=cmt, mistype=mistype, precon=cmt)
        fn = lambda m: loc_cmt_misfit(m, prob, opts, cfg, forward=forward)
        if physics == "layered":
            # host-orchestrated batched L-BFGS: the all-on-device
            # while_loop inlines ~3 copies of the dd objective graph and
            # can crash the remote TPU compiler at this program size
            # (lbfgs.minimize_lbfgs_batched_host docstring); the device
            # still evaluates every start as one batched program per step
            from waveform_ot_tpu.inversion import minimize_lbfgs_batched_host

            run = lambda xs: minimize_lbfgs_batched_host(
                fn, xs, max_iter=max_iter, eval_chunk=16)
        else:
            run = jax.jit(lambda xs: minimize_multi_start(
                fn, xs, max_iter=max_iter))
        t0 = time.perf_counter()
        res = run(starts)
        jax.block_until_ready(res.x)
        dt = time.perf_counter() - t0
        sol = np.asarray(res.x) * np.asarray(mscal)
        st = np.asarray(starts) * np.asarray(mscal)
        conv, dist, cons, frac = check_convergence(
            st[:, :3], sol[:, :3], np.asarray(loc_true),
            dlimit=2.0, exclude_edge=None)
        line = (f"{mistype}: {k*k} starts in {dt:.2f} s -> "
                f"{100*frac:.0f}% converged (median loc |err| = "
                f"{np.median(dist):.2f} km")
        if cmt:
            mrel = (np.abs(sol[:, 3:] - m_true_full[3:])
                    / np.abs(m_true_full[3:]).max()).max(axis=1)
            line += f", median CMT rel err = {np.median(mrel):.3f}"
        nfail = int(np.sum(np.asarray(res.ls_failed)))
        if nfail:
            line += f", {nfail} linesearch-frozen lanes"
        print(line + ")")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--nstarts", type=int, default=16)
    ap.add_argument("--nr", type=int, default=8)
    ap.add_argument("--cmt", action="store_true",
                    help="joint 9-dim loc+CMT mode (Fig_12 cmt=True)")
    ap.add_argument("--physics", choices=("layered", "farfield"),
                    default="layered")
    ap.add_argument("--nk", type=int, default=256,
                    help="wavenumber samples for the layered forward")
    main(**vars(ap.parse_args()))
