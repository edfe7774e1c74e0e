"""Pallas TPU kernel for the polyline nearest-distance field.

This is the production implementation of the reference's hot loop #1
(``waveformFP.wdist``, FingerprintLib.py:230-272): for every point of the
(nu, ntg) fingerprint grid, the minimum distance to any segment of the
waveform polyline, plus the argmin segment index and clipped projection
parameter needed by the analytic VJP.

Kernel design (see /opt/skills/guides/pallas_guide.md):

  * The grid is flattened and tiled into TPTS-point blocks along the lane
    axis; each program owns one block and loops over segment chunks of SC
    along the sublane axis, so the inner compute is dense (SC, TPTS)
    VPU work entirely in VMEM — the reference's (Ngrid, Nseg) temporary
    (~21M elements at the 80x512 Ricker config, SURVEY.md 3.4) never
    exists in HBM.
  * Segment data (start points, direction vectors, squared lengths) is tiny
    (O(nt)) and lives in VMEM whole, padded to a multiple of SC with
    far-away dummy segments (start at 1e6, zero direction) that can never
    win the argmin.
  * Grid coordinates are synthesized from the program id with
    ``broadcasted_iota`` (grid axes are uniform linspaces), so the kernel
    reads only O(nt) bytes; scalars (axis origins and steps) ride in SMEM.
  * Tie-breaking matches ``np.argmin`` (first minimum): first-tie within a
    chunk via an index-min, strict ``<`` across chunks keeps the earliest.

Distance computation per point p, segment (x0, c, 1/Lsq) — formed as
b = p - x0 directly (the naive |p|^2 - 2 p.x0 + |x0|^2 expansion loses
~3 digits to cancellation near the polyline, exactly where the density is
largest), making the kernel bit-identical to the jnp reference impl:
    lam = clip((b.c)/Lsq, 0, 1) ;  dsq = |b - lam*c|^2

The backward pass reuses the shared envelope-form VJP in ops/fingerprint.py
(O(Ngrid) elementwise + segment scatter), so no backward kernel is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from waveform_ot_tpu.ops import fingerprint as fp_mod

_BIG = 1.0e30
_FAR = 1.0e6


def _kernel(scal_ref, segs_ref, dout_ref, iout_ref, lout_ref, vxout_ref,
            vyout_ref, *,
            tpts: int, sc: int, n_chunks: int, ntg: int, rows: int):
    tile = pl.program_id(0)
    tlo = scal_ref[0, 0]
    dt = scal_ref[0, 1]
    ulo = scal_ref[0, 2]
    du = scal_ref[0, 3]
    ftype = scal_ref.dtype

    def row_body(r, _):
        flat = ((tile * rows + r) * tpts
                + jax.lax.broadcasted_iota(jnp.int32, (1, tpts), 1))
        ntg_c = jnp.int32(ntg)
        it = jax.lax.rem(flat, ntg_c)
        iu = jax.lax.div(flat, ntg_c)
        pt = tlo + it.astype(ftype) * dt
        pu = ulo + iu.astype(ftype) * du

        def chunk(k, carry):
            rmin, ridx, rlam, rvx, rvy = carry
            sl = pl.ds(k * sc, sc)
            x0x = segs_ref[sl, 0:1]
            x0y = segs_ref[sl, 1:2]
            cx = segs_ref[sl, 2:3]
            cy = segs_ref[sl, 3:4]
            il = segs_ref[sl, 5:6]
            # b = p - x0 formed directly: no cancellation near the polyline
            bx = pt - x0x                                   # (sc, tpts)
            by = pu - x0y
            bc = bx * cx + by * cy
            lam = jnp.clip(bc * il, 0.0, 1.0)
            dx = bx - lam * cx
            dy = by - lam * cy
            dsq = dx * dx + dy * dy
            minv = jnp.min(dsq, axis=0, keepdims=True)      # (1, tpts)
            iot = jax.lax.broadcasted_iota(jnp.int32, (sc, tpts), 0)
            cand = jnp.where(dsq == minv, iot, sc + 1)
            amin = jnp.min(cand, axis=0, keepdims=True)     # first tie
            winner = iot == amin
            lsel = jnp.sum(jnp.where(winner, lam, 0.0), axis=0,
                           keepdims=True)
            # offset p - x* of the winner (saves the VJP's re-gather)
            vxsel = jnp.sum(jnp.where(winner, dx, 0.0), axis=0,
                            keepdims=True)
            vysel = jnp.sum(jnp.where(winner, dy, 0.0), axis=0,
                            keepdims=True)
            gidx = k * sc + amin
            better = minv < rmin                    # strict: keep earliest
            return (jnp.where(better, minv, rmin),
                    jnp.where(better, gidx, ridx),
                    jnp.where(better, lsel, rlam),
                    jnp.where(better, vxsel, rvx),
                    jnp.where(better, vysel, rvy))

        init = (jnp.full((1, tpts), _BIG, ftype),
                jnp.zeros((1, tpts), jnp.int32),
                jnp.zeros((1, tpts), ftype),
                jnp.zeros((1, tpts), ftype),
                jnp.zeros((1, tpts), ftype))
        rmin, ridx, rlam, rvx, rvy = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(n_chunks), chunk, init)
        dout_ref[pl.ds(r, 1), :] = jnp.sqrt(jnp.maximum(rmin, 0.0))
        iout_ref[pl.ds(r, 1), :] = ridx
        lout_ref[pl.ds(r, 1), :] = rlam
        vxout_ref[pl.ds(r, 1), :] = rvx
        vyout_ref[pl.ds(r, 1), :] = rvy
        return jnp.int32(0)

    # int32 loop bounds: under jax_enable_x64 a Python-int fori_loop index
    # is int64, and the int64->float convert it feeds recurses forever in
    # the Mosaic convert_element_type lowering (x64 TPU sessions hit this)
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(rows), row_body, jnp.int32(0))


def _pack_segments(verts, s_pad):
    """(s_pad, 6) columns: x0x, x0y, cx, cy, lsq, 1/lsq; dummies are far away
    with zero direction so dsq ~ 1e12 >> any real distance."""
    x0 = verts[:-1]
    c = verts[1:] - verts[:-1]
    lsq = jnp.sum(c * c, axis=1)
    il = 1.0 / lsq
    segs = jnp.stack([x0[:, 0], x0[:, 1], c[:, 0], c[:, 1], lsq, il], axis=1)
    nseg = segs.shape[0]
    pad = jnp.zeros((s_pad - nseg, 6), segs.dtype)
    pad = pad.at[:, 0:2].set(_FAR).at[:, 4].set(1.0).at[:, 5].set(0.0)
    return jnp.concatenate([segs, pad], axis=0)


@functools.partial(jax.jit, static_argnames=("tpts", "sc", "interpret"))
def _distance_field_pallas_impl(verts, tgrid, ugrid, tpts: int, sc: int,
                                interpret: bool):
    nu = ugrid.shape[0]
    ntg = tgrid.shape[0]
    nseg = verts.shape[0] - 1
    n_pts = nu * ntg
    rows = 8  # sublane tiling: each program fills an (8, tpts) output block
    n_rows = -(-n_pts // tpts)
    n_tiles = -(-n_rows // rows)
    s_pad = -(-nseg // sc) * sc
    dtype = verts.dtype

    segs = _pack_segments(verts, s_pad)
    scal = jnp.stack([tgrid[0], tgrid[1] - tgrid[0],
                      ugrid[0], ugrid[1] - ugrid[0]]).reshape(1, 4)

    kernel = functools.partial(_kernel, tpts=tpts, sc=sc,
                               n_chunks=s_pad // sc, ntg=ntg, rows=rows)
    # under shard_map with check_vma=True (parallel/grid_shard.py) pallas
    # outputs must declare how they vary over mesh axes: they vary over
    # the union of the input variances (every output depends on every
    # input); outside shard_map the union is the empty set, a no-op
    vma = frozenset()
    for x in (scal, segs):
        vma = vma | getattr(jax.typeof(x), "vma", frozenset())
    sds = lambda dt: jax.ShapeDtypeStruct((n_tiles * rows, tpts), dt,
                                          vma=vma)
    out_shape = [sds(dtype), sds(jnp.int32), sds(dtype), sds(dtype),
                 sds(dtype)]
    row_spec = pl.BlockSpec((rows, tpts), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    d, iclose, lam, vx, vy = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((s_pad, 6), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[row_spec, row_spec, row_spec, row_spec, row_spec],
        out_shape=out_shape,
        interpret=interpret,
    )(scal, segs)

    shape = (nu, ntg)
    d = d.reshape(-1)[:n_pts].reshape(shape)
    iclose = iclose.reshape(-1)[:n_pts].reshape(shape)
    lam = lam.reshape(-1)[:n_pts].reshape(shape)
    dvec = jnp.stack([vx.reshape(-1)[:n_pts].reshape(shape),
                      vy.reshape(-1)[:n_pts].reshape(shape)], axis=-1)
    return d, iclose, lam, dvec


def distance_field_pallas(verts, tgrid, ugrid, tpts: int | None = None,
                          sc: int = 256,
                          interpret: bool | None = None) -> "fp_mod.DistanceField":
    """Pallas distance field with the same contract as the jnp impl.

    Args:
      verts: (nt, 2) polyline vertices (normalized coords).
      tgrid, ugrid: uniform grid axes (linspace).
      tpts: grid points per program row (lane-axis tile). Default: sized so
            one (8, tpts) block covers the whole grid when it fits in VMEM
            (minimizes padding waste — a 79x61 grid fills 94% of an
            (8, 640) block vs 59% of two (8, 512) blocks), capped at 1024.
      sc:   segments per inner chunk (sublane-axis tile).
      interpret: force interpreter mode (default: auto — interpret off-TPU
                 so CPU tests exercise the same kernel logic).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cdiv = lambda a, b: -(-a // b)
    n_pts = tgrid.shape[0] * ugrid.shape[0]
    if tpts is None:
        tpts = min(1024, max(128, cdiv(cdiv(n_pts, 8), 128) * 128))
    nseg = verts.shape[0] - 1
    sc = min(sc, -(-nseg // 8) * 8) if nseg < sc else sc
    d, iclose, lam, dvec = _distance_field_pallas_impl(
        verts, tgrid, ugrid, tpts=tpts, sc=sc, interpret=bool(interpret))
    return fp_mod.DistanceField(d=d, iclose=iclose, lam=lam, dvec=dvec)
