"""Source-location / moment-tensor inversion objectives (batched, on-device).

Rewrite of the reference's flagship pipeline (loc_cmt_util.py:113-306):
``optfunc_OT`` / ``optfunc_L2`` driving the Fukuoka-earthquake example of
Figs 9-12. Where the reference loops serially over (receiver, component)
traces in Python (loc_cmt_util.py:255-271, 503-519 — SURVEY.md 2.5), this
module vmaps one differentiable per-trace pipeline over all traces and jits
the whole objective; the gradient w.r.t. source location and moment tensor
is one ``jax.grad`` through forward physics, arctan transform, fingerprint
kernel, marginal OT, and the sum over traces.

The forward model is pluggable: the on-device synthetic
(models.seismo.synthetic_seismograms) by default, or the pyprop8 host
bridge (models.pyprop8_bridge.prop8seis) when pyprop8 is installed.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from waveform_ot_tpu.inversion.pipeline import (
    Targets, TraceConfig, build_target, trace_misfit,
)
from waveform_ot_tpu.inversion.windows import (
    build_windows, unit_amplitude_windows,
)
from waveform_ot_tpu.models.seismo import (
    MediumConfig, StationSet, mxyz_from_upper, synthetic_seismograms,
)
from waveform_ot_tpu.ops.fingerprint import Window
from waveform_ot_tpu.ops.transforms import arctan_transform


@dataclasses.dataclass(frozen=True)
class InvOptions:
    """Static inversion switches — the reference's ``invopt`` dict
    (SURVEY.md section 5; assembled in Figs_9_10_11 cell 34)."""

    loc: bool = True
    cmt: bool = False
    mistype: str = "OT"      # 'OT' | 'L2'
    wopt: str = "Wavg"       # 'Wavg' | 'Wt' | 'Wu'
    precon: bool = False
    zmin: float = 0.001


class LocCMTProblem(NamedTuple):
    """Dynamic problem data (pytree) — the reference's ``optdata`` bundle
    (loc_cmt_util.py:113-125) made explicit."""

    t: jax.Array                 # (nt,) time axis
    seis_obs: jax.Array          # (nr, 3, nt) observed seismograms
    windows: Window              # per-trace raw-amplitude windows (nr, 3)
    targets: Targets             # batched observed marginals (nr*3, ...)
    stations: StationSet
    medium: MediumConfig
    mref: jax.Array              # (3,) fixed location when loc=False
    mscal: jax.Array             # parameter preconditioner (reference mscal)
    mxyz_fixed: jax.Array        # (3,3) moment tensor when cmt=False
    fc: jax.Array                # source pulse corner frequency


def _clamp_depth_straight_through(z, zmin):
    """Value max(z, zmin) with gradient 1 everywhere — the reference clamps
    z before the forward call but still returns d(mis)/dz evaluated at the
    clamped point (loc_cmt_util.py:206)."""
    return z - jax.lax.stop_gradient(z - jnp.maximum(z, zmin))


def build_loc_cmt_problem(t, seis_obs, stations: StationSet, cfg: TraceConfig,
                          mref=None, mscal=None, mxyz_fixed=None,
                          medium: MediumConfig | None = None, fc=0.08,
                          pad: float = 0.3, impl="auto") -> LocCMTProblem:
    """Precompute windows + observed-side fingerprint marginals (once,
    mirroring Figs_9_10_11 cell 46 / OTdata['wfobs_target'])."""
    nr, nc, nt = seis_obs.shape
    dtype = seis_obs.dtype
    windows = build_windows(t, seis_obs, pad=pad)
    un_obs = arctan_transform(seis_obs, windows.u0[..., None],
                              windows.u1[..., None])
    win01 = unit_amplitude_windows(windows)
    flat_w = un_obs.reshape(nr * nc, nt)
    flat_win = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (nr, nc)).reshape(nr * nc), win01)
    cfg_fp = dataclasses.replace(cfg, transform=False)
    targets = jax.vmap(
        lambda w_, wn: build_target(t, w_, wn, cfg_fp, impl=impl)
    )(flat_w, flat_win)
    if medium is None:
        medium = MediumConfig.default(dtype)
    return LocCMTProblem(
        t=t, seis_obs=seis_obs, windows=windows, targets=targets,
        stations=stations, medium=medium,
        mref=jnp.zeros(3, dtype) if mref is None else jnp.asarray(mref),
        mscal=jnp.ones(1, dtype) if mscal is None else jnp.asarray(mscal),
        mxyz_fixed=(jnp.eye(3, dtype=dtype) if mxyz_fixed is None
                    else jnp.asarray(mxyz_fixed)),
        fc=jnp.asarray(fc, dtype))


def _model_to_physics(m, prob: LocCMTProblem, opts: InvOptions):
    """m -> (x, y, z, Mxyz) applying preconditioning, the depth floor and
    the loc/cmt parameter layout (loc_cmt_util.py:194-218)."""
    if opts.precon:
        m = m * prob.mscal
    if opts.loc:
        x, y, z = m[0], m[1], m[2]
    else:
        x, y, z = prob.mref[0], prob.mref[1], prob.mref[2]
    z = _clamp_depth_straight_through(z, opts.zmin)
    if opts.cmt:
        mvals = m[3:] if opts.loc else m
        mxyz = mxyz_from_upper(mvals)
    else:
        mxyz = prob.mxyz_fixed
    return x, y, z, mxyz


def predicted_seismograms(m, prob: LocCMTProblem, opts: InvOptions,
                          forward: Callable | None = None):
    """Forward physics for the current model (pluggable)."""
    x, y, z, mxyz = _model_to_physics(m, prob, opts)
    if forward is not None:
        return forward(x, y, z, mxyz)
    nt = prob.t.shape[0]
    dt = prob.t[1] - prob.t[0]
    _, s = synthetic_seismograms(x, y, z, mxyz, prob.stations, nt=nt,
                                 dt=dt, medium=prob.medium, fc=prob.fc,
                                 t0=prob.t[0])
    return s


def misfit_from_seis(s, prob: LocCMTProblem, opts: InvOptions,
                     cfg: TraceConfig, impl="auto"):
    """Scalar misfit of predicted seismograms ``s`` (nr, 3, nt) against
    the problem's observed targets — the physics-independent tail of
    :func:`loc_cmt_misfit`, exposed so staged forwards
    (:func:`layered_misfit_grid`) can compose with it directly."""
    if opts.mistype == "L2":
        r = s - prob.seis_obs
        return jnp.sum(r * r)
    nr, nc, nt = s.shape
    un = arctan_transform(s, prob.windows.u0[..., None],
                          prob.windows.u1[..., None])
    win01 = unit_amplitude_windows(prob.windows)
    flat_w = un.reshape(nr * nc, nt)
    flat_win = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (nr, nc)).reshape(nr * nc), win01)
    cfg_fp = dataclasses.replace(cfg, transform=False)
    wt, wu = jax.vmap(
        lambda w_, wn, tg: trace_misfit(prob.t, w_, wn, tg, cfg_fp,
                                        impl=impl)
    )(flat_w, flat_win, prob.targets)
    if opts.wopt == "Wt":
        return jnp.sum(wt)
    if opts.wopt == "Wu":
        return jnp.sum(wu)
    return 0.5 * (jnp.sum(wt) + jnp.sum(wu))


def loc_cmt_misfit(m, prob: LocCMTProblem, opts: InvOptions,
                   cfg: TraceConfig, forward: Callable | None = None,
                   impl="auto"):
    """Scalar OT (or L2) misfit summed over all traces
    (loc_cmt_util.py:239-296). Fully differentiable w.r.t. ``m``."""
    s = predicted_seismograms(m, prob, opts, forward=forward)
    return misfit_from_seis(s, prob, opts, cfg, impl=impl)


def loc_cmt_value_and_grad(m, prob: LocCMTProblem, opts: InvOptions,
                           cfg: TraceConfig, forward: Callable | None = None,
                           impl="auto"):
    """(mis, dmis) — the reference optfunc contract (loc_cmt_util.py:306),
    including the preconditioner chain (dmis *= mscal under precon, which
    autodiff applies automatically through _model_to_physics)."""
    return jax.value_and_grad(loc_cmt_misfit)(m, prob, opts, cfg,
                                              forward=forward, impl=impl)


def misfit_grid(ms, prob: LocCMTProblem, opts: InvOptions, cfg: TraceConfig,
                forward: Callable | None = None, impl="auto"):
    """Vectorized misfit surface scan: ``ms`` is (k, nm) model nodes.

    Replaces the reference's triple Python loop over the (z, x, y) grid
    (Figs_9_10_11 cell 64; 1,764 serial objective evaluations —
    SURVEY.md 3.5) with one vmapped, jittable evaluation.
    """
    return jax.vmap(lambda m: loc_cmt_misfit(m, prob, opts, cfg,
                                             forward=forward, impl=impl)
                    )(ms)


def misfit_grid_sharded(ms, prob: LocCMTProblem, opts: InvOptions,
                        cfg: TraceConfig, mesh, axis_name: str = "batch",
                        forward: Callable | None = None, impl="auto"):
    """Multi-chip misfit surface scan: the model-node axis of ``ms`` is
    sharded over ``mesh`` (problem data replicated) and each chip scans its
    shard independently — zero inter-chip traffic. Scaling form of
    :func:`misfit_grid` for large grids (the reference caches this workload
    to pickle because it is "slow", Figs_9_10_11 cell 64).

    ``ms.shape[0]`` must be divisible by the mesh size (pad with any model;
    extra rows cost nothing and can be discarded).
    """
    from waveform_ot_tpu.parallel.mesh import sharded_map

    # prob rides as a replicated ARGUMENT (not a closure capture: committed
    # shardings on captured constants conflict with the Manual mesh axes
    # inside shard_map)
    f = sharded_map(
        lambda m, p: loc_cmt_misfit(m, p, opts, cfg, forward=forward,
                                    impl=impl),
        mesh, axis_name=axis_name)
    return f(ms, prob)


def layered_misfit_grid(zs, xy, prob: LocCMTProblem, opts: InvOptions,
                        cfg: TraceConfig, stages, impl="auto",
                        xy_chunk: int | None = None,
                        z_loop: str = "scan"):
    """Depth-amortized misfit-surface scan through the LAYERED physics:
    value + (x, y, z) gradient at every node of a (z-slices x horizontal
    nodes) grid — the reference's Figs_9_10_11 cell-64 workload (21x21x4
    serial optfunc evaluations, cached to pickle because it is slow;
    SURVEY.md 3.5).

    The layered synthesis splits into a depth-only expensive stage A
    (per-layer interface scans) and a cheap per-source stage B (Bessel
    assembly + OT) — :func:`models.layered.make_layered_stages`. A naive
    ``vmap(value_and_grad)`` over grid nodes re-runs stage A (and its
    z-JVP) at every node; here each depth slice runs stage A ONCE and one
    z-JVP ONCE, shared by all ``xy`` nodes of the slice, whose per-node
    work is stage B forward + one reverse sweep. The per-node z gradient
    is the contraction of that node's stage-A cotangent with the shared
    z-tangent (exactly the structured-VJP identity of
    make_layered_forward, amortized across the slice).

    Args: zs (nz,) depths; xy (nxy, 2) horizontal nodes shared by every
    slice; stages from ``make_layered_stages`` (same nt/dt/nk/... as the
    problem); xy_chunk optionally bounds peak memory by evaluating the
    horizontal nodes in chunks (must divide into nxy after padding).
    CMT stays fixed at ``prob.mxyz_fixed`` (the reference grid scan is
    location-only). Returns (values (nz, nxy), grads (nz, nxy, 3)).

    ``z_loop``: 'scan' (default) iterates depth slices with ``lax.map`` —
    one compiled stage-A body regardless of nz (the TPU production
    choice). 'unroll' loops in Python — nz stage-A copies in the traced
    program, but the only mode that is numerically exact on CPU: the XLA
    CPU fusion emitter perturbs even the plain-FLOAT64 f-k stack when
    its body is wrapped in an outer scan (measured 1.7e-5 of seismogram
    peak at the Fukuoka nk=48 config, restored to 1e-15 by
    ``--xla_disable_hlo_passes=fusion`` — the same barrier-stripping/
    producer-duplication bug class as the ddfloat hazard, CLAUDE.md).
    CPU oracles and parity tests must use 'unroll' (eagerly it never
    compiles anything); TPU honors the fences and runs 'scan' clean.
    """
    if opts.cmt:
        raise ValueError("layered_misfit_grid scans location only "
                         "(cmt=True has no 3-vector gradient contract)")
    from waveform_ot_tpu.models.layered import _moment_coeffs
    from waveform_ot_tpu.ops import ddfloat as _ddf

    stage_a, stage_b = stages
    # Trace this program at 'eft' seal granularity regardless of the
    # backend default: the 'op'-granularity form of THIS program shape
    # (vjp-through-stage-B x vmap x lax.map) builds fusions large enough
    # to crash the remote TPU compiler (SIGSEGV, reproduced at xy_chunk
    # 21 and 63 — round 5). The eft form compiles and runs the full
    # 1,764-node flagship scan in 1.6 s (BASELINE.md).
    _prev_gran = _ddf._SEAL_GRANULARITY_OVERRIDE
    _ddf.set_seal_mode(_ddf._SEAL_MODE_OVERRIDE, "eft")
    try:
        return _layered_misfit_grid_body(zs, xy, prob, opts, cfg, stage_a,
                                         stage_b, _moment_coeffs, impl,
                                         xy_chunk, z_loop)
    finally:
        _ddf._SEAL_GRANULARITY_OVERRIDE = _prev_gran


def _layered_misfit_grid_body(zs, xy, prob, opts, cfg, stage_a, stage_b,
                              _moment_coeffs, impl, xy_chunk, z_loop):
    dtype = jnp.asarray(xy).dtype
    a = _moment_coeffs(prob.mxyz_fixed, dtype)

    def slice_eval(z):
        zc = _clamp_depth_straight_through(z, opts.zmin)
        ops, dops = jax.jvp(lambda zz: stage_a(zz, dtype), (zc,),
                            (jnp.ones_like(zc),))
        z_ng = jax.lax.stop_gradient(zc)

        def node(xy1):
            x_, y_ = xy1[0], xy1[1]

            def f(ops_, xv, yv):
                s = stage_b(ops_, xv, yv, z_ng, a, prob.stations)
                return misfit_from_seis(s, prob, opts, cfg, impl=impl)

            v, vjp = jax.vjp(f, ops, x_, y_)
            g_ops, gx, gy = vjp(jnp.ones_like(v))
            gz = sum(jnp.sum(go * do) for go, do in
                     zip(jax.tree_util.tree_leaves(g_ops),
                         jax.tree_util.tree_leaves(dops)))
            return v, jnp.stack([gx, gy, jnp.asarray(gz, dtype)])

        if xy_chunk is None or xy_chunk >= xy.shape[0]:
            return jax.vmap(node)(xy)
        nxy = xy.shape[0]
        pad = (-nxy) % xy_chunk
        xyp = jnp.concatenate([xy, xy[:pad]], 0) if pad else xy
        vc, gc = jax.lax.map(jax.vmap(node),
                             xyp.reshape(-1, xy_chunk, 2))
        return vc.reshape(-1)[:nxy], gc.reshape(-1, 3)[:nxy]

    zs = jnp.asarray(zs, dtype)
    if z_loop == "unroll":
        out = [slice_eval(zs[i]) for i in range(zs.shape[0])]
        return (jnp.stack([v for v, _ in out]),
                jnp.stack([g for _, g in out]))
    if z_loop != "scan":
        raise ValueError(f"unknown z_loop mode {z_loop!r}")
    return jax.lax.map(slice_eval, zs)
