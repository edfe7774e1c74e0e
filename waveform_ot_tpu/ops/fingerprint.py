"""Waveform fingerprints: nearest-distance fields over time-amplitude windows.

TPU-native rewrite of the reference's ``waveformFP`` class
(reference: libs/FingerprintLib.py:48-385). The mutable class becomes pure
functions over pytrees:

  waveformFP.__init__   -> Window + normalize_vertices + grid_axes
                           (FingerprintLib.py:53-115)
  waveformFP.wdist      -> distance_field      (FingerprintLib.py:230-272)
  waveformFP.wdistderiv -> the custom VJP here (FingerprintLib.py:333-385)
  waveformFP.calcpdf    -> density_from_distance / fingerprint_density
                           (FingerprintLib.py:117-180)
  PDFderiv/PDFderivMarg -> plain jax.grad through this module
                           (FingerprintLib.py:182-228)

Derivative convention. The reference computes d(distance)/d(vertex
amplitude) with an analytic formula whose dlambda/dy terms carry a spurious
addend; that addend is harmless because the optimal-projection residual is
orthogonal to the segment direction (dddx . c = 0 at the minimizing lambda),
so the whole dlambda path drops out. The VJP here therefore uses the exact
envelope form (verified to agree with FingerprintLib.py:333-385 to machine
precision):

    dd/d(vertex i)   = (1 - lam) * (x* - p) / d      (segment start)
    dd/d(vertex i+1) = lam       * (x* - p) / d      (segment end)
    dd/d(grid point) = (p - x*) / d

with the nearest segment index and the clip of lambda to [0, 1] treated as
locally constant — exactly the reference's clip-zeroing convention
(FingerprintLib.py:363-369). Unlike the reference (amplitude only), the VJP
covers both vertex coordinates and the grid axes, so window parameters
(t0, t1, u0, u1) are differentiable end-to-end as well.

Implementations: 'jnp' is the vectorized reference-semantics oracle
(materializes the (Ngrid, Nseg) matrix like FingerprintLib.py:254-263);
'pallas' is the tiled TPU kernel (ops/pallas_distance.py) that never leaves
VMEM. Both sit behind one API and are tested for exact agreement.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from waveform_ot_tpu.ops import errors


# ---------------------------------------------------------------------------
# window geometry
# ---------------------------------------------------------------------------


class Window(NamedTuple):
    """Dynamic time-amplitude window parameters (a pytree of scalars).

    Mirrors the reference grid 6-tuple (t0, t1, u0, u1, Nu, Nt) minus the
    static grid dims, which live in :class:`FingerprintSpec`. ``tantheta``
    is the time/amplitude metric weighting (FingerprintLib.py:77-90).
    """

    t0: jax.Array
    t1: jax.Array
    u0: jax.Array
    u1: jax.Array
    tantheta: jax.Array


def make_window(t0, t1, u0, u1, theta: float | None = None,
                tantheta: float | None = None, dtype=None) -> Window:
    """Build a Window; ``tantheta`` takes precedence over ``theta`` (degrees),
    matching FingerprintLib.py:77-82. Default is 45 degrees (tantheta=1)."""
    if tantheta is None:
        tantheta = 1.0 if theta is None else jnp.tan(jnp.deg2rad(theta))
    arr = lambda v: jnp.asarray(v, dtype=dtype)
    return Window(arr(t0), arr(t1), arr(u0), arr(u1), arr(tantheta))


def window_from_waveform(t, w, pad: float = 0.3) -> Window:
    """Auto window: pad amplitude range by ``pad``*range on both sides.

    Matches loc_cmt_util.buildFingerprintwindows (loc_cmt_util.py:430-446)
    with pad=0.3 and ricker_util.BuildOTobjfromWaveform(norm=True) with
    pad=0.2 (ricker_util.py:233-240).
    """
    du = jnp.max(w) - jnp.min(w)
    return make_window(jnp.min(t), jnp.max(t),
                       jnp.min(w) - pad * du, jnp.max(w) + pad * du)


@dataclasses.dataclass(frozen=True)
class FingerprintSpec:
    """Static fingerprint configuration (hashable; safe as a jit static arg).

    nu, ntg: grid points along the amplitude/time axes of the window
             (reference Nu, Nt, FingerprintLib.py:84-85).
    """

    nu: int
    ntg: int


def normalize_vertices(t, w, win: Window) -> jax.Array:
    """Waveform vertices in non-dimensional window coordinates.

    pn = ((t - t0) / (tantheta*(t1 - t0)), (w - u0) / (u1 - u0)),
    matching FingerprintLib.py:110. Returns (nt, 2).
    """
    delt = win.tantheta * (win.t1 - win.t0)
    return jnp.stack([(t - win.t0) / delt, (w - win.u0) / (win.u1 - win.u0)],
                     axis=-1)


def grid_axes(t, win: Window, spec: FingerprintSpec, fpbox=None):
    """Normalized grid axes (tgrid (ntg,), ugrid (nu,)).

    Default box: time axis spans the *waveform's* normalized time range
    (FingerprintLib.py:91, tlimn uses t[0], t[-1], not t0/t1) and the
    amplitude axis spans (0, 1) (FingerprintLib.py:92). With ``fpbox`` =
    (fp_t0, fp_t1, fp_u0, fp_u1) in physical coordinates, the box is
    re-normalized like FingerprintLib.py:101-106.
    """
    delt = win.tantheta * (win.t1 - win.t0)
    if fpbox is None:
        tlo = (t[0] - win.t0) / delt
        thi = (t[-1] - win.t0) / delt
        ulo = jnp.zeros_like(tlo)
        uhi = jnp.ones_like(tlo)
    else:
        fp_t0, fp_t1, fp_u0, fp_u1 = fpbox
        tlo = (fp_t0 - win.t0) / delt
        thi = (fp_t1 - win.t0) / delt
        ulo = (fp_u0 - win.u0) / (win.u1 - win.u0)
        uhi = (fp_u1 - win.u0) / (win.u1 - win.u0)
    tgrid = jnp.linspace(tlo, thi, spec.ntg)
    ugrid = jnp.linspace(ulo, uhi, spec.nu)
    return tgrid, ugrid


# ---------------------------------------------------------------------------
# distance field
# ---------------------------------------------------------------------------


class DistanceField(NamedTuple):
    """Nearest-distance field and its argmin data.

    d:      (nu, ntg) nearest distance from each grid point to the polyline
    iclose: (nu, ntg) int32 index of the nearest segment (first-min ties)
    lam:    (nu, ntg) clipped projection parameter on that segment
    dvec:   optional (nu, ntg, 2) offset p - x* from the nearest polyline
            point to the grid point (|dvec| == d). When present the
            envelope VJP uses it directly instead of re-gathering the
            winning segment's geometry through a one-hot matmul (which
            costs ~35% of the whole backward at the 192-trace config).
    """

    d: jax.Array
    iclose: jax.Array
    lam: jax.Array
    dvec: jax.Array | None = None


def _distance_field_jnp(verts, tgrid, ugrid) -> DistanceField:
    """Vectorized brute force, reference semantics (FingerprintLib.py:254-263).

    Materializes (Ngrid, Nseg); use the pallas impl for large grids.
    """
    x0 = verts[:-1]                       # (nseg, 2)
    c = verts[1:] - verts[:-1]            # (nseg, 2)
    lsq = jnp.sum(c * c, axis=1)          # (nseg,)
    tt, uu = jnp.meshgrid(tgrid, ugrid)   # (nu, ntg) each
    p = jnp.stack([tt.ravel(), uu.ravel()], axis=1)  # (N, 2)
    b = p[:, None, :] - x0[None, :, :]    # (N, nseg, 2)
    lam = jnp.clip(jnp.sum(b * c[None], axis=2) / lsq[None], 0.0, 1.0)
    ds = b - c[None] * lam[..., None]
    dsq = jnp.sum(ds * ds, axis=2)        # (N, nseg)
    iclose = jnp.argmin(dsq, axis=1)      # first minimum, like np.argmin
    n = p.shape[0]
    lbest = lam[jnp.arange(n), iclose]
    d = jnp.sqrt(dsq[jnp.arange(n), iclose])
    dvec = ds[jnp.arange(n), iclose]      # p - x* at the winner
    shape = (ugrid.shape[0], tgrid.shape[0])
    return DistanceField(d.reshape(shape), iclose.reshape(shape).astype(jnp.int32),
                         lbest.reshape(shape), dvec.reshape(shape + (2,)))


def _distance_field_scan(verts, tgrid, ugrid, chunk: int = 16) -> DistanceField:
    """Memory-bounded XLA implementation: lax.scan over segment chunks with a
    running (min, argmin, lam) — the same chunked algorithm as the Pallas
    kernel, expressed in pure XLA. Peak temporary is (Ngrid, chunk) instead
    of the jnp impl's (Ngrid, Nseg). First-tie argmin semantics preserved
    (within-chunk index-min + strict < across chunks)."""
    nseg = verts.shape[0] - 1
    x0 = verts[:-1]
    c = verts[1:] - verts[:-1]
    il = 1.0 / jnp.sum(c * c, axis=1)
    n_chunks = -(-nseg // chunk)
    pad = n_chunks * chunk - nseg
    big = jnp.asarray(1.0e6, verts.dtype)
    x0p = jnp.concatenate([x0, jnp.full((pad, 2), big, verts.dtype)])
    cp = jnp.concatenate([c, jnp.zeros((pad, 2), verts.dtype)])
    ilp = jnp.concatenate([il, jnp.zeros((pad,), verts.dtype)])
    segs = (x0p.reshape(n_chunks, chunk, 2), cp.reshape(n_chunks, chunk, 2),
            ilp.reshape(n_chunks, chunk),
            (jnp.arange(n_chunks) * chunk).astype(jnp.int32))

    tt, uu = jnp.meshgrid(tgrid, ugrid)
    p = jnp.stack([tt.ravel(), uu.ravel()], axis=1)        # (N, 2)
    n = p.shape[0]

    def body(carry, seg):
        rmin, ridx = carry
        x0k, ck, ilk, base = seg
        b = p[:, None, :] - x0k[None, :, :]                # (N, chunk, 2)
        bc = jnp.sum(b * ck[None], axis=2)
        lam = jnp.clip(bc * ilk[None], 0.0, 1.0)
        ds = b - ck[None] * lam[..., None]
        dsq = jnp.sum(ds * ds, axis=2)                     # (N, chunk)
        minv = jnp.min(dsq, axis=1)
        amin = jnp.argmin(dsq, axis=1).astype(jnp.int32)   # first tie
        better = minv < rmin
        return (jnp.where(better, minv, rmin),
                jnp.where(better, base + amin, ridx)), None

    init = (jnp.full((n,), jnp.asarray(1.0e30, verts.dtype)),
            jnp.zeros((n,), jnp.int32))
    (_, ridx), _ = jax.lax.scan(body, init, segs)
    # Recompute lam and d from the winning segment. Both a per-point
    # gather-by-argmin carried through the scan and a post-scan table
    # gather lower to multi-ms TPU kernels; the one-hot matmul form stays
    # on the MXU (see _segment_one_hot).
    oh = _segment_one_hot(ridx, nseg, verts.dtype)
    table = jnp.concatenate([x0, c, il[:, None]], axis=1)  # (nseg, 5)
    gath = jnp.dot(oh, table, preferred_element_type=verts.dtype,
                   precision=jax.lax.Precision.HIGHEST)
    x0w, cw, ilw = gath[:, 0:2], gath[:, 2:4], gath[:, 4]
    b = p - x0w
    lam = jnp.clip(jnp.sum(b * cw, axis=1) * ilw, 0.0, 1.0)
    ds = b - cw * lam[:, None]
    d = jnp.sqrt(jnp.sum(ds * ds, axis=1))
    shape = (ugrid.shape[0], tgrid.shape[0])
    return DistanceField(d.reshape(shape), ridx.reshape(shape),
                         lam.reshape(shape), ds.reshape(shape + (2,)))


def distance_field(verts, tgrid, ugrid, impl: str = "auto",
                   chunk: int = 16) -> DistanceField:
    """Nearest distance from every grid point to the waveform polyline.

    Args:
      verts: (nt, 2) polyline vertices in normalized coordinates.
      tgrid: (ntg,) grid time axis; ugrid: (nu,) grid amplitude axis.
      impl:  'jnp'    — single vectorized (Ngrid, Nseg) expression
                        (reference semantics oracle, memory-hungry);
             'xla'    — chunked lax.scan, bounded memory, pure XLA;
             'pallas' — the Pallas TPU kernel (ops/pallas_distance.py);
             'auto'   — pallas on TPU, jnp otherwise.
      chunk: segment-chunk size of the 'xla' scan. Measured on v5e (f32,
             single field inside one jit): chunk 16-32 is the plateau for
             both reference workloads — 80x512 grid x 511 segs:
             0.029-0.035 ms (pallas 0.031, jnp 0.039); 79x61 grid x 60
             segs: 0.029 ms at 16 (pallas 0.023, jnp 0.031). Use 'xla'
             when the (Ngrid, Nseg) jnp temporary would blow HBM (it peaks
             at Ngrid*chunk instead); 'pallas' is fastest overall, and the
             jnp oracle remains competitive whenever its temporary fits.
    """
    if impl == "auto":
        if jax.default_backend() == "tpu":
            # under jax_enable_x64, Mosaic cannot lower ANY kernel on this
            # runtime (int64 index converts recurse; even a trivial kernel
            # fails to legalize) — use the chunked-XLA impl, which measures
            # equal to the Pallas kernel (see the chunk note below)
            impl = "xla" if jax.config.jax_enable_x64 else "pallas"
        else:
            impl = "jnp"
    if impl == "jnp":
        return _distance_field_jnp(verts, tgrid, ugrid)
    if impl == "xla":
        return _distance_field_scan(verts, tgrid, ugrid, chunk=chunk)
    if impl == "pallas":
        from waveform_ot_tpu.ops import pallas_distance

        return pallas_distance.distance_field_pallas(verts, tgrid, ugrid)
    raise errors.FingerprintMethodError(impl)


def _segment_one_hot(iclose, nseg, dtype):
    """(N, nseg) one-hot of the winning segment per grid point.

    On TPU, batched gathers from small per-trace tables and scatter-adds
    into them lower to multi-ms kernels (measured 4-9 ms each at the
    192-trace loc/CMT config); expressing both as one-hot matmuls keeps the
    whole VJP on the MXU at sub-ms cost. The one-hot is exact in any float
    dtype, so gather/scatter results are bit-identical.
    """
    seg_ids = jax.lax.broadcasted_iota(jnp.int32, (1, nseg), 1)
    return (iclose.reshape(-1, 1) == seg_ids).astype(dtype)


def _distance_vjp(verts, tgrid, ugrid, fld: DistanceField, gbar):
    """Envelope-form backward pass (see module docstring)."""
    nt = verts.shape[0]
    nseg = nt - 1
    shape = fld.d.shape
    safe_d = jnp.where(fld.d > 0, fld.d, 1.0)
    if fld.dvec is not None:
        # direction of increase of d w.r.t. the closest point x*:
        # (x* - p)/d = -dvec/d, straight from the forward outputs
        gdir = -fld.dvec / safe_d[..., None]              # (nu, ntg, 2)
    else:
        # legacy fields without dvec: re-gather the winning segment's
        # geometry (one-hot matmul) and rebuild x*
        tt, uu = jnp.meshgrid(tgrid, ugrid)
        p = jnp.stack([tt, uu], axis=-1)                  # (nu, ntg, 2)
        x0 = verts[:-1]
        c = verts[1:] - verts[:-1]
        table = jnp.concatenate([x0, c], axis=1)          # (nseg, 4)
        oh_g = _segment_one_hot(fld.iclose, nseg, verts.dtype)
        gath = jnp.dot(oh_g, table, preferred_element_type=verts.dtype,
                       precision=jax.lax.Precision.HIGHEST)   # (N, 4)
        x0w = gath[:, 0:2].reshape(shape + (2,))
        cw = gath[:, 2:4].reshape(shape + (2,))
        xstar = x0w + fld.lam[..., None] * cw
        gdir = (xstar - p) / safe_d[..., None]
    gdir = jnp.where((fld.d > 0)[..., None], gdir, 0.0)
    gv = gbar[..., None] * gdir
    w0 = (1.0 - fld.lam)[..., None] * gv                  # start-vertex share
    w1 = fld.lam[..., None] * gv                          # end-vertex share
    # scatter-to-segments as ONE one-hot^T matmul over [w0 | w1] (the
    # one-hot compare-reduction dominates; fusing both shares halves it),
    # then shift-add the end-vertex shares onto vertex i+1
    oh = _segment_one_hot(fld.iclose, nseg, verts.dtype)  # (N, nseg)
    w01 = jnp.concatenate([w0.reshape(-1, 2), w1.reshape(-1, 2)], axis=1)
    gseg = jnp.dot(oh.T, w01, preferred_element_type=verts.dtype,
                   precision=jax.lax.Precision.HIGHEST)   # (nseg, 4)
    zero = jnp.zeros((1, 2), verts.dtype)
    gverts = (jnp.concatenate([gseg[:, 0:2], zero], axis=0)
              + jnp.concatenate([zero, gseg[:, 2:4]], axis=0))  # (nt, 2)
    gp = -gv                                              # dd/dp = (p - x*)/d
    gtgrid = jnp.sum(gp[..., 0], axis=0)
    gugrid = jnp.sum(gp[..., 1], axis=1)
    return gverts, gtgrid, gugrid


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(3,))
def distance_field_diff(verts, tgrid, ugrid, impl: str = "auto"):
    """Differentiable distance field (d only).

    Forward runs :func:`distance_field` with the chosen implementation;
    backward is the O(Ngrid) analytic envelope rule — never the
    O(Ngrid*Nseg) autodiff graph.
    """
    return distance_field(verts, tgrid, ugrid, impl=impl).d


def _dfd_fwd(verts, tgrid, ugrid, impl):
    fld = distance_field(verts, tgrid, ugrid, impl=impl)
    return fld.d, (verts, tgrid, ugrid, fld)


def _dfd_bwd(impl, res, gbar):
    verts, tgrid, ugrid, fld = res
    return _distance_vjp(verts, tgrid, ugrid, fld, gbar)


distance_field_diff.defvjp(_dfd_fwd, _dfd_bwd)


# ---------------------------------------------------------------------------
# density
# ---------------------------------------------------------------------------


def density_from_distance(d, lambdav, q: int | None = None) -> jax.Array:
    """Fingerprint density from the distance field (FingerprintLib.py:171-177).

    q=None: pdf = exp(-|d|/lambda)    (the loc/CMT configuration)
    q=2:    pdf = exp(-d**2/lambda)   (the Ricker configuration default)
    """
    if q is None or q == 1:
        return jnp.exp(-jnp.abs(d) / lambdav)
    if q == 2:
        return jnp.exp(-(d * d) / lambdav)
    raise errors.FingerprintMethodError(f"q={q}")


def fingerprint_density(t, w, win: Window, spec: FingerprintSpec,
                        lambdav: float = 0.04, q: int | None = None,
                        impl: str = "auto", fpbox=None):
    """Waveform -> 2-D fingerprint density, fully differentiable.

    Composition of normalize_vertices -> distance_field -> exp density,
    mirroring waveformFP.__init__ + calcpdf (FingerprintLib.py:53-180).

    Returns (pdf2d (nu, ntg), (tgrid, ugrid)); the axes are the marginal
    supports in normalized coordinates (= the reference's ``wf.pos`` planes).
    Gradients flow to ``w``, ``t`` and every Window field via the custom VJP.
    """
    verts = normalize_vertices(t, w, win)
    tgrid, ugrid = grid_axes(t, win, spec, fpbox=fpbox)
    d = distance_field_diff(verts, tgrid, ugrid, impl)
    return density_from_distance(d, lambdav, q=q), (tgrid, ugrid)


# ---------------------------------------------------------------------------
# point queries & NN variant (reference parity utilities)
# ---------------------------------------------------------------------------


def point_distance(verts, points) -> jax.Array:
    """Nearest distance from arbitrary points (k, 2) to the polyline.

    Functional equivalent of wavedist/wavedistv (FingerprintLib.py:445-474).
    """
    x0 = verts[:-1]
    c = verts[1:] - verts[:-1]
    lsq = jnp.sum(c * c, axis=1)
    b = points[:, None, :] - x0[None]
    lam = jnp.clip(jnp.sum(b * c[None], axis=2) / lsq[None], 0.0, 1.0)
    ds = b - c[None] * lam[..., None]
    return jnp.sqrt(jnp.min(jnp.sum(ds * ds, axis=2), axis=1))


def distance_field_nn(verts, tgrid, ugrid) -> DistanceField:
    """Vertex-NN accelerated distance field (reference wdistNN semantics,
    FingerprintLib.py:274-331): find the nearest polyline *vertex* per grid
    point, then resolve exactly against only its two adjacent segments.

    On TPU this is an O(Ngrid*Nt) argmin over vertices instead of
    O(Ngrid*Nseg) over segments — same asymptotics, kept for parity and as
    an independent oracle (it can disagree with the exact field only when
    the true nearest segment is not adjacent to the nearest vertex, exactly
    as in the reference).
    """
    nt = verts.shape[0]
    x0 = verts[:-1]
    c = verts[1:] - verts[:-1]
    lsq = jnp.sum(c * c, axis=1)
    tt, uu = jnp.meshgrid(tgrid, ugrid)
    p = jnp.stack([tt.ravel(), uu.ravel()], axis=1)
    dv = p[:, None, :] - verts[None]
    ivert = jnp.argmin(jnp.sum(dv * dv, axis=2), axis=1)
    segp = jnp.clip(ivert, 0, nt - 2)
    segm = jnp.clip(ivert - 1, 0, nt - 2)

    def seg_dist(seg):
        b = p - x0[seg]
        lam = jnp.clip(jnp.sum(b * c[seg], axis=1) / lsq[seg], 0.0, 1.0)
        ds = b - c[seg] * lam[:, None]
        return jnp.sum(ds * ds, axis=1), lam, ds

    dp, lamp, dsp = seg_dist(segp)
    dm, lamm, dsm = seg_dist(segm)
    take_p = dp < dm
    dsq = jnp.where(take_p, dp, dm)
    iclose = jnp.where(take_p, segp, segm)
    lam = jnp.where(take_p, lamp, lamm)
    dvec = jnp.where(take_p[:, None], dsp, dsm)
    shape = (ugrid.shape[0], tgrid.shape[0])
    return DistanceField(jnp.sqrt(dsq).reshape(shape),
                         iclose.reshape(shape).astype(jnp.int32),
                         lam.reshape(shape), dvec.reshape(shape + (2,)))
