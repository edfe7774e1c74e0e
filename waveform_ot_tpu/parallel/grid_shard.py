"""Sequence-parallel fingerprints: shard the grid's time axis over a mesh.

SURVEY.md section 2.5 maps the reference's "sequence" axis to the
fingerprint grid's Nt columns (the (Nu, Ntg) field of
FingerprintLib.py:230-272 — the O(Ngrid*Nseg) hot loop). Data-parallel
trace sharding (parallel/mesh.py) is the production scaling axis; this
module is the complementary axis for when a SINGLE fingerprint grid
outgrows one chip (e.g. the 800x600 demo grid of FingerprintLib.py:947,
or denser): columns of the grid are sharded over the mesh, the polyline
(O(nt), tiny) is replicated, and each device computes the exact distance
field of its column block.

No halo is needed: the nearest-segment search is global over the
(replicated) polyline, so column blocks are fully independent — the
communication pattern is

  * all_gather of the time marginal   (O(ntg) floats over ICI),
  * psum of the amplitude marginal    (O(nu) floats),

after which each device holds both full marginals and computes the 1-D
Wasserstein misfits redundantly (replicated output). The backward pass
reverses the collectives (all_gather -> dynamic-slice, psum -> identity)
and runs the fingerprint VJP shard-locally, so gradient traffic is the
same O(ntg + nu).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from waveform_ot_tpu.ops.fingerprint import (
    density_from_distance, distance_field_diff,
)
from waveform_ot_tpu.ops.otpdf import Density1D
from waveform_ot_tpu.ops.wasser import wasserstein_1d

# Varying -> Invariant gather: lets shard_map's static replication checker
# (check_vma=True) prove the misfit outputs are replicated, instead of the
# tests merely asserting it. Public as jax.lax.all_gather_invariant in
# newer JAX; fall back to the internal binding, then to plain all_gather
# (+ check_vma=False) if neither exists.
try:
    from jax.lax import all_gather_invariant as _all_gather_inv
    _CHECK_VMA = True
except ImportError:
    try:
        from jax._src.lax.parallel import (
            all_gather_invariant as _all_gather_inv,
        )
        _CHECK_VMA = True
    except ImportError:  # pragma: no cover - old JAX
        _all_gather_inv = None
        _CHECK_VMA = False


def _gather_tiled(x, axis_name):
    """all_gather(tiled) whose output the vma checker knows is replicated.

    The invariant form also transposes to a dynamic-slice (each device takes
    its own block of the replicated cotangent) rather than a reduce_scatter —
    the exact backward communication pattern the module docstring promises.
    """
    if _all_gather_inv is not None:
        return _all_gather_inv(x, axis_name, tiled=True)
    return jax.lax.all_gather(x, axis_name, tiled=True)


def _to_varying(x, axis_name):
    """Invariant -> Varying cast ahead of the fingerprint custom VJP.

    The envelope-form distance-field VJP computes varying cotangents for
    its replicated primals (verts, ugrid); the vma checker cannot insert
    the restoring psum through a custom_vjp, so we cast the primals to
    varying up front — the cast's transpose IS that psum, which the checker
    can see produces an invariant cotangent. Value/grad are unchanged
    (verified ulp-exact vs the unsharded oracle in test_parallel)."""
    if not _CHECK_VMA:
        return x
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, axis_name, to="varying")
    return jax.lax.pvary(x, axis_name)


def shard_grid_axis(tgrid, mesh: Mesh, axis_name: str | None = None):
    """Place the (ntg,) grid time axis sharded over the mesh (columns of
    the fingerprint field follow it inside the sharded pipeline)."""
    axis_name = axis_name or mesh.axis_names[0]
    return jax.device_put(jnp.asarray(tgrid),
                          NamedSharding(mesh, P(axis_name)))


def _block_marg_misfit(verts, tgrid_blk, ugrid, target_t, target_u, tshift,
                       *, seq_axis, lambdav, q, p, impl):
    """Shared sequence-parallel marginal pipeline for one grid: local
    column-block distance field + density, marginals assembled over
    ``seq_axis`` (all_gather / psum), 1-D Wasserstein on the replicated
    marginals. Used by both the sp-only and the dp x sp entry points."""
    d = distance_field_diff(_to_varying(verts, seq_axis), tgrid_blk,
                            _to_varying(ugrid, seq_axis), impl)  # (nu, blk)
    u2d = density_from_distance(d, lambdav, q=q)
    f_t = _gather_tiled(jnp.sum(u2d, axis=0), seq_axis)
    f_u = jax.lax.psum(jnp.sum(u2d, axis=1), seq_axis)
    tfull = _gather_tiled(tgrid_blk, seq_axis)
    wt = wasserstein_1d(f_t, tfull + tshift, target_t.pdf, target_t.x, p)
    wu = wasserstein_1d(f_u, ugrid, target_u.pdf, target_u.x, p)
    return wt, wu


def grid_sharded_marg_misfit(mesh: Mesh, *, lambdav: float,
                             q: int | None = None, p: int = 2,
                             impl: str = "auto",
                             axis_name: str | None = None) -> Callable:
    """Build the grid-sharded marginal-misfit function over ``mesh``.

    Returns ``f(verts, tgrid, ugrid, target_t, target_u, tshift)
    -> (wt, wu)`` where

      * ``verts`` (nt, 2) polyline, replicated;
      * ``tgrid`` (ntg,) uniform time axis, SHARDED into contiguous
        column blocks (ntg must be divisible by the mesh size; use
        :func:`shard_grid_axis` for placement);
      * ``ugrid`` (nu,) amplitude axis, replicated;
      * ``target_t`` / ``target_u``: observed marginals (Density1D),
        replicated;
      * ``tshift``: rigid time-support shift (scalar) — its gradient is
        the reference's window-origin derivative dwg (OTlib.py:1121).

    (wt, wu) are W_p^p of the time/amplitude marginals, replicated —
    semantically identical to ops.marginal.marg_wasserstein_value on the
    unsharded field (tested to 1e-12 on the virtual CPU mesh), and fully
    differentiable: jax.grad w.r.t. verts/tshift reverses the collectives.
    """
    an = axis_name or mesh.axis_names[0]

    def local(verts, tgrid_blk, ugrid, target_t, target_u, tshift):
        return _block_marg_misfit(verts, tgrid_blk, ugrid, target_t,
                                  target_u, tshift, seq_axis=an,
                                  lambdav=lambdav, q=q, p=p, impl=impl)

    dens_spec = Density1D(amp=P(), pdf=P(), x=P(), cdf=P())
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(an), P(), dens_spec, dens_spec, P()),
        out_specs=(P(), P()),
        # wt/wu replication is statically PROVEN when all_gather_invariant
        # is available: the invariant gather + psum make every 1-D solver
        # input invariant, and _to_varying lets the transpose psum the
        # fingerprint-VJP cotangents back to invariant. On older JAX the
        # plain-gather fallback needs the check off.
        check_vma=_CHECK_VMA,
    )


def grid_sharded_density(mesh: Mesh, *, lambdav: float, q: int | None = None,
                         impl: str = "auto",
                         axis_name: str | None = None) -> Callable:
    """Build ``f(verts, tgrid, ugrid) -> pdf2d`` with the (nu, ntg) field's
    column axis sharded over the mesh (the field itself stays distributed —
    no gather), for workloads that consume the full 2-D density."""
    an = axis_name or mesh.axis_names[0]

    def local(verts, tgrid_blk, ugrid):
        d = distance_field_diff(verts, tgrid_blk, ugrid, impl)
        return density_from_distance(d, lambdav, q=q)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(an), P()),
        out_specs=P(None, an),
    )


def dp_sp_marg_misfit(mesh: Mesh, *, lambdav: float, q: int | None = None,
                      p: int = 2, alpha: float = 0.5, impl: str = "auto",
                      batch_axis: str = "batch",
                      seq_axis: str = "seq") -> Callable:
    """Composed 2-D mesh parallelism: data-parallel traces x
    sequence-parallel grid columns in ONE program.

    Over a ``Mesh(devices.reshape(nb, ns), (batch_axis, seq_axis))``:

      * the trace batch's leading axis is sharded over ``batch_axis``;
      * every fingerprint grid's time axis is sharded over ``seq_axis``
        (each trace's (nu, ntg) field is computed column-block-wise by the
        devices in its batch row, zero halo — see the module docstring);
      * marginal all_gather/psum ride ``seq_axis`` sub-groups, the final
        misfit sum reduces over ``batch_axis`` — both ICI collectives.

    Returns ``f(verts_b, tgrid, ugrid, target_t_b, target_u_b, tshift)
    -> total`` where ``verts_b`` is (ntr, nt, 2), the targets are
    Density1D pytrees with a leading (ntr,) trace axis, ``tshift`` is
    (ntr,), and ``total = sum_traces alpha*wt + (1-alpha)*wu`` (W_p^p),
    replicated. Differentiable end to end. ntr must divide by nb and
    ntg by ns.
    """

    def per_trace(tgrid_blk, ugrid, verts, target_t, target_u, tshift):
        wt, wu = _block_marg_misfit(verts, tgrid_blk, ugrid, target_t,
                                    target_u, tshift, seq_axis=seq_axis,
                                    lambdav=lambdav, q=q, p=p, impl=impl)
        return alpha * wt + (1.0 - alpha) * wu

    def local(verts_b, tgrid_blk, ugrid, target_t_b, target_u_b, tshift_b):
        vals = jax.vmap(
            lambda v, tt, tu, ts: per_trace(tgrid_blk, ugrid, v, tt, tu, ts)
        )(verts_b, target_t_b, target_u_b, tshift_b)
        return jax.lax.psum(jnp.sum(vals), batch_axis)

    dens_b = Density1D(amp=P(batch_axis), pdf=P(batch_axis),
                       x=P(batch_axis), cdf=P(batch_axis))
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(batch_axis), P(seq_axis), P(), dens_b, dens_b,
                  P(batch_axis)),
        out_specs=P(),
        # same note as grid_sharded_marg_misfit: statically checked when
        # the invariant gather exists, asserted by tests otherwise
        check_vma=_CHECK_VMA,
    )


def make_mesh_2d(nb: int, ns: int, batch_axis: str = "batch",
                 seq_axis: str = "seq") -> Mesh:
    """(nb, ns) device mesh for :func:`dp_sp_marg_misfit`."""
    import numpy as _np

    devs = jax.devices()
    if len(devs) < nb * ns:
        raise ValueError(f"need {nb * ns} devices, have {len(devs)}")
    return Mesh(_np.asarray(devs[:nb * ns]).reshape(nb, ns),
                (batch_axis, seq_axis))
