"""Exact 1-D Wasserstein distances with analytic gradients.

TPU-native rewrite of the reference's core solver ``wasser``
(reference: libs/OTlib.py:596-741). The algorithm is the merged-CDF
quantile integration:

    cf, cg        : renormalized CDFs of source/target
    a             : concat(cf[:-1], cg)            (m = n_f + n_g - 1, static)
    tk            : sort(a);  tkarg = argsort(a)   (stable, first-tie order)
    indf, indg    : searchsorted(cf|cg, tk, side='left')   (bisect_left)
    dtk           : first differences of tk (dtk[0] = tk[0])
    W_p^p         : sum(|x_f[indf] - x_g[indg]|^p * dtk)

Derivatives w.r.t. the *unnormalized* source amplitudes are the reference's
``Diffdtk`` construction (OTlib.py:681-706), but evaluated in closed O(m)
form instead of materializing the dense (n, m) matrix:

    with e_l = dist_l - dist_{l+1}  (dist_m := 0), scattered back to the
    unsorted merged slots s = scatter(e, tkarg), and s_f = s[:n_f-1]:

        dW/df_i = ( sum_{k>=i} s_f[k]  -  cf[:-1] . s_f ) / amp_f

    (verified to machine precision against the reference's dense form).

Derivatives w.r.t. support positions are per-point subgradients
(the reference only exposes their sum, the rigid-translation derivative
dW/dt, OTlib.py:693-706; sum ours over points to recover it).

The whole computation is wrapped in a ``jax.custom_vjp`` so that
``jax.grad`` of any downstream pipeline reproduces the reference chain rule
exactly while staying O(m) in time and memory. A plain-autodiff variant
(:func:`wasserstein_1d_autodiff`) is kept as a differential-testing oracle.

Like the reference, returned values are W_p^p (the p-th power).
Derivatives are valid only when source and target CDFs share no common
values (OTlib.py:663-666); see :func:`common_cdf_mask`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from waveform_ot_tpu.ops import errors
from waveform_ot_tpu.ops.otpdf import Density1D


# ---------------------------------------------------------------------------
# shared forward machinery
# ---------------------------------------------------------------------------


def _cdf(f: jax.Array) -> tuple[jax.Array, jax.Array]:
    """amp and renormalized CDF of unnormalized amplitudes (OTlib.py:92,112).

    The CDF is pinned with an optimization barrier: the merged-support logic
    compares CDF values exactly (rank counting / bisect semantics), and XLA
    is otherwise free to rematerialize the cumsum with different
    associativity at different use sites — 1-ulp discrepancies between
    copies break the total order and corrupt the merge (observed as
    nondeterministic W under jit+vmap on CPU).
    """
    amp = jnp.sum(f, axis=-1)
    cdf = jnp.cumsum(f, axis=-1) / amp[..., None]
    cdf = cdf / cdf[..., -1:]
    return amp, jax.lax.optimization_barrier(cdf)


def _merge(cf: jax.Array, cg: jax.Array):
    """Merged-support quantities (OTlib.py:668-673). Shapes are static."""
    a = jnp.concatenate([cf[:-1], cg])
    tkarg = jnp.argsort(a, stable=True)
    tk = a[tkarg]
    indf = jnp.searchsorted(cf, tk, side="left")
    indg = jnp.searchsorted(cg, tk, side="left")
    dtk = jnp.diff(tk, prepend=jnp.zeros((1,), tk.dtype))
    return tk, tkarg, indf, indg, dtk


# Size threshold for the O(m^2) ranked merge. On TPU, sorts/searchsorted/
# gathers over small batched arrays lower to ms-scale while-loops and
# scatters; counting ranks with dense compares + one-hot matmuls is ~10x
# faster up to m ~ 1k (profiled on v5e). Above the threshold the sort path
# wins on memory.
_RANKED_MERGE_MAX = 1024


def _stable_ranks(af: jax.Array, cg: jax.Array):
    """Stable-sort ranks of the merged array concat(af, cg) by comparison
    counting: rank(v_k) = #{j: v_j < v_k} + #{j < k: v_j == v_k}, with all
    af slots preceding all cg slots at equal values (= argsort stable=True
    tie order on the concatenated array).

    Also returns per-slot bisect_left indices derived from the SAME
    comparison set (indf_slot = bisect_left(cf, a_k), indg_slot =
    bisect_left(cg, a_k)): re-comparing floats against the sorted merged
    values is not compilation-stable — XLA may rematerialize the cumsum
    CDFs with different rounding at different use sites, and any
    inconsistency between the two comparison rounds corrupts the merge.
    Deriving everything from one comparison set makes the result exact for
    whatever rounding the compiler picks.
    """
    nf1 = af.shape[0]
    lt_ff = jnp.sum(af[:, None] > af[None, :], axis=1)
    lt_fg = jnp.sum(af[:, None] > cg[None, :], axis=1)
    i = jnp.arange(nf1)
    eq_ff = jnp.sum((af[:, None] == af[None, :])
                    & (i[None, :] < i[:, None]), axis=1)
    rank_f = lt_ff + lt_fg + eq_ff

    ng = cg.shape[0]
    lt_gf = jnp.sum(cg[:, None] > af[None, :], axis=1)
    lt_gg = jnp.sum(cg[:, None] > cg[None, :], axis=1)
    j = jnp.arange(ng)
    eq_gf = jnp.sum(cg[:, None] == af[None, :], axis=1)  # af slots precede
    eq_gg = jnp.sum((cg[:, None] == cg[None, :])
                    & (j[None, :] < j[:, None]), axis=1)
    rank_g = lt_gf + lt_gg + eq_gf + eq_gg
    ranks = jnp.concatenate([rank_f, rank_g]).astype(jnp.int32)

    # bisect_left(cf, a_k): f-slot k -> first index of its equal run in af
    # (k - eq_ff; the trailing cf[-1]=1.0 entry always compares >=);
    # g-slot j -> #(af < cg_j) (+0 for cf[-1]=1.0 which is never < cg_j).
    indf_slot = jnp.concatenate([i - eq_ff, lt_gf]).astype(jnp.int32)
    # bisect_left(cg, a_k): f-slot k -> #(cg < af_k); g-slot j -> first
    # index of its equal run in cg.
    indg_slot = jnp.concatenate([lt_fg, j - eq_gg]).astype(jnp.int32)
    return ranks, indf_slot, indg_slot


def _one_hot_dot(idx, n, mat):
    """one_hot(idx, n) @ mat without gathers — exact (HIGHEST precision)."""
    oh = (idx[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :]).astype(
        mat.dtype)
    return jnp.dot(oh, mat, preferred_element_type=mat.dtype,
                   precision=jax.lax.Precision.HIGHEST)


def _merge_ranked(cf: jax.Array, cg: jax.Array):
    """Sort-free equivalent of :func:`_merge` for small merged supports.

    Semantically identical outputs (exact comparisons, one-hot selection);
    replaces argsort/searchsorted/gathers with dense compares and MXU
    matmuls. ``indf``/``indg`` are per-SLOT (unsorted) — transport to
    sorted positions with the returned permutation one-hot ``oh``.
    """
    a = jnp.concatenate([cf[:-1], cg])
    m = a.shape[0]
    ranks, indf_slot, indg_slot = _stable_ranks(cf[:-1], cg)
    # oh[k, l] = 1 iff slot k sits at sorted position l
    oh = (ranks[:, None] == jnp.arange(m, dtype=jnp.int32)[None, :]).astype(
        a.dtype)                                           # (m_slots, m_pos)
    tk = jnp.dot(oh.T, a, preferred_element_type=a.dtype,
                 precision=jax.lax.Precision.HIGHEST)
    dtk = jnp.diff(tk, prepend=jnp.zeros((1,), tk.dtype))
    return tk, ranks, indf_slot, indg_slot, dtk, oh


def _dist(dx: jax.Array, p: int) -> jax.Array:
    if p == 1:
        return jnp.abs(dx)
    if p == 2:
        return dx * dx
    raise errors.UnknownOTDistanceTypeError(p)


def _dist_ddx(dx: jax.Array, p: int) -> jax.Array:
    """d(dist)/d(dx): the reference's translation-derivative integrand
    (sign for W1, 2*dx for W2; OTlib.py:693,703)."""
    if p == 1:
        return jnp.sign(dx)
    return 2.0 * dx


def _amp_grad(e_scat: jax.Array, cdf: jax.Array, amp: jax.Array, last: bool):
    """Closed-form gradient w.r.t. unnormalized amplitudes.

    ``e_scat`` are the merged-slot sensitivities for this density's CDF
    entries (cf[:-1] if ``last`` is False — the source convention — or the
    full cg if True). Returns dW/df of length n.
    """
    # HIGHEST: f32 dots default to bf16 multiplies on TPU, visibly biasing
    # the gradient; these are O(n) vector dots so full precision is free.
    hp = jax.lax.Precision.HIGHEST
    if last:
        s = e_scat  # (n,) slots for cg[0..n-1]
        rev = jnp.cumsum(s[::-1])[::-1]
        c0 = jnp.dot(cdf, s, precision=hp)
        return (rev - c0) / amp
    s = e_scat  # (n-1,) slots for cf[:-1]
    rev = jnp.cumsum(s[::-1])[::-1]
    rev = jnp.concatenate([rev, jnp.zeros((1,), s.dtype)])  # T_{n-1} = 0
    c0 = jnp.dot(cdf[:-1], s, precision=hp)
    return (rev - c0) / amp


# ---------------------------------------------------------------------------
# primal + custom VJP
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def wasserstein_1d(f, xf, g, xg, p: int = 2):
    """W_p^p between two 1-D discrete densities of arbitrary support.

    Args:
      f:  (n_f,) unnormalized non-negative source amplitudes.
      xf: (n_f,) source support locations (must be sorted ascending).
      g:  (n_g,) unnormalized non-negative target amplitudes.
      xg: (n_g,) target support locations (sorted ascending).
      p:  1 or 2 (static).

    Returns:
      scalar W_p^p (reference ``wasser`` value, OTlib.py:690,700).

    Differentiable w.r.t. all four array arguments; gradients match the
    reference's analytic formulas (w.r.t. unnormalized amplitudes and
    support positions) at non-tied configurations.
    """
    w, _ = _wasser_fwd_impl(f, xf, g, xg, p)
    return w


def _use_ranked(nf: int, ng: int) -> bool:
    return (nf + ng - 1) <= _RANKED_MERGE_MAX


def _wasser_fwd_impl(f, xf, g, xg, p):
    ampf, cf = _cdf(f)
    ampg, cg = _cdf(g)
    if _use_ranked(f.shape[0], g.shape[0]):
        # per-slot computation, transported to sorted positions via the
        # permutation one-hot (single comparison set; see _stable_ranks)
        tk, perm, indf, indg, dtk, oh = _merge_ranked(cf, cg)
        xft = _one_hot_dot(indf, xf.shape[0], xf[:, None])[:, 0]
        xgt = _one_hot_dot(indg, xg.shape[0], xg[:, None])[:, 0]
        dx_slot = xft - xgt
        dx = jnp.dot(oh.T, dx_slot, preferred_element_type=dx_slot.dtype,
                     precision=jax.lax.Precision.HIGHEST)  # sorted order
    else:
        tk, perm, indf, indg, dtk = _merge(cf, cg)
        dx = xf[indf] - xg[indg]
    dist = _dist(dx, p)
    # HIGHEST: the W value itself — default f32 dot is bf16 on TPU (~1e-3
    # relative error on the misfit); this O(m) dot is free at full precision
    w = jnp.dot(dist, dtk, precision=jax.lax.Precision.HIGHEST)
    res = (ampf, cf, ampg, cg, perm, indf, indg, dtk, dx)
    return w, res


def _wasser_fwd(f, xf, g, xg, p):
    return _wasser_fwd_impl(f, xf, g, xg, p)


def _wasser_bwd(p, res, wbar):
    ampf, cf, ampg, cg, perm, indf, indg, dtk, dx = res
    nf = cf.shape[0]
    ng = cg.shape[0]
    m = dtk.shape[0]
    dist = _dist(dx, p)
    ranked = _use_ranked(nf, ng)

    # positions: segment-sum of the translation integrand per support point
    # (replaces the reference's implicit sum; OTlib.py:693-706). On the
    # ranked path the scatter-add becomes a one-hot matmul, with the
    # sorted-order integrand first transported back to slots (indf/indg are
    # per-slot there; see _merge_ranked).
    hp = jax.lax.Precision.HIGHEST
    ddx = _dist_ddx(dx, p) * dtk * wbar
    if ranked:
        oh = (perm[:, None] == jnp.arange(m, dtype=jnp.int32)[None, :]
              ).astype(dx.dtype)
        ddx_slot = jnp.dot(oh, ddx, preferred_element_type=ddx.dtype,
                           precision=hp)
        gxf = jnp.dot(
            (indf[:, None] == jnp.arange(nf, dtype=jnp.int32)).astype(
                ddx.dtype).T, ddx_slot,
            preferred_element_type=ddx.dtype, precision=hp)
        gxg = -jnp.dot(
            (indg[:, None] == jnp.arange(ng, dtype=jnp.int32)).astype(
                ddx.dtype).T, ddx_slot,
            preferred_element_type=ddx.dtype, precision=hp)
    else:
        gxf = jnp.zeros(nf, dx.dtype).at[indf].add(ddx)
        gxg = jnp.zeros(ng, dx.dtype).at[indg].add(-ddx)

    # amplitudes: closed-form Diffdtk adjoint (see module docstring).
    e = (dist - jnp.concatenate([dist[1:], jnp.zeros((1,), dist.dtype)])
         ) * wbar
    if ranked:
        # s[k] = e[rank_k]: permutation one-hot matmul instead of a scatter
        s = jnp.dot(oh, e, preferred_element_type=e.dtype, precision=hp)
    else:
        s = jnp.zeros(m, dist.dtype).at[perm].set(e)
    gf = _amp_grad(s[: nf - 1], cf, ampf, last=False)
    gg = _amp_grad(s[nf - 1 :], cg, ampg, last=True)
    return gf, gxf, gg, gxg


wasserstein_1d.defvjp(_wasser_fwd, _wasser_bwd)


def wasserstein_1d_autodiff(f, xf, g, xg, p: int = 2):
    """Plain-autodiff forward (no custom VJP); differential-testing oracle.

    Autodiff through sort/cumsum/gather reproduces the same analytic
    derivatives as the custom VJP (away from ties); this variant exists to
    cross-check the closed-form backward pass.
    """
    _, cf = _cdf(f)
    _, cg = _cdf(g)
    a = jnp.concatenate([cf[:-1], cg])
    tk = jnp.sort(a, stable=True)
    indf = jax.lax.stop_gradient(jnp.searchsorted(cf, tk, side="left"))
    indg = jax.lax.stop_gradient(jnp.searchsorted(cg, tk, side="left"))
    dtk = jnp.diff(tk, prepend=jnp.zeros((1,), tk.dtype))
    dx = xf[indf] - xg[indg]
    return jnp.dot(_dist(dx, p), dtk, precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# reference-style wrappers
# ---------------------------------------------------------------------------


def wasser(source: Density1D, target: Density1D, distfunc="W12",
           derivatives: bool = False):
    """API-parity wrapper mirroring the reference ``wasser`` signature.

    ``distfunc`` accepts, like the reference dispatch (OTlib.py:165-185,
    574-594):
      * 'W1' / 'W2' / 'W12' — closed-form solver(s);
      * an (n_f, n_g) array of precomputed pairwise costs;
      * a callable ``cost(i, j) -> float`` over (source, target) indices
        (the reference's user distance function, OTlib.py:203-214),
        materialized once into the cost array;
      * a tuple whose last element is the cost array (the reference's
        sliced-Wasserstein form, OTlib.py:627-633).

    Returns, like OTlib.py:596-741 (for distfunc in {'W1','W2','W12'}):
      [W1(, dW1/df, dW1/dt)][, W2(, dW2/df, dW2/dt)]
    and for the cost-array/callable forms [Wf(, dWf/df, 0.0)] — the
    reference returns a zero position derivative on this path
    (OTlib.py:716) because p is unknown for a user cost.
    """
    if not isinstance(distfunc, str):
        import numpy as np

        if isinstance(distfunc, tuple):
            distfunc = distfunc[-1]
        if callable(distfunc):
            fn = distfunc
            nf, ng = source.pdf.shape[0], target.pdf.shape[0]
            distfunc = np.array([[fn(i, j) for j in range(ng)]
                                 for i in range(nf)])
        cost = jnp.asarray(distfunc)
        if cost.shape != (source.pdf.shape[0], target.pdf.shape[0]):
            raise errors.DistfuncShapeError(
                f"cost shape {cost.shape} != "
                f"({source.pdf.shape[0]}, {target.pdf.shape[0]})")
        f = source.pdf * source.amp
        g = target.pdf * target.amp
        if derivatives:
            w, dw = jax.value_and_grad(wasserstein_1d_cost)(f, g, cost)
            return [w, dw, 0.0]
        return [wasserstein_1d_cost(f, g, cost)]
    ps: list[int] = []
    if distfunc in ("W1", "W12"):
        ps.append(1)
    if distfunc in ("W2", "W12"):
        ps.append(2)
    if not ps:
        raise errors.UnknownOTDistanceTypeError(distfunc)
    out = []
    for p in ps:
        if derivatives:
            w, grads = jax.value_and_grad(wasserstein_1d, argnums=(0, 1))(
                source.pdf * source.amp, source.x, target.pdf * target.amp,
                target.x, p)
            out += [w, grads[0], jnp.sum(grads[1])]
        else:
            out.append(wasserstein_1d(source.pdf * source.amp, source.x,
                                      target.pdf * target.amp, target.x, p))
    return out


def wasserstein_1d_cost(f, g, cost, indexer=None, gather: str | None = None):
    """W with a user-supplied cost array (reference dfunc path, OTlib.py:708-716).

    ``cost`` is an (n_f, n_g) array of precomputed pairwise costs;
    gradients flow w.r.t. amplitudes only (as in the reference, which
    returns a zero position derivative for this path).

    ``indexer`` optionally remaps (indf, indg) into cost (used by the sliced
    Wasserstein to index an un-projected 2-D cost matrix through per-slice
    sort permutations, reference OTlib.py:574-594).

    ``gather`` selects how the merged-support cost row is read:
      * 'take' — fancy-indexing gather ``cost[indf, indg]``. Cheap on CPU,
        but dynamic 2-D gathers lower to multi-ms scalar kernels on TPU.
      * 'onehot' — two one-hot matmuls on the MXU with precision=HIGHEST
        (bit-exact for 0/1 operands); the fast form on TPU.
      * None (default) — 'onehot' when tracing for a TPU backend, else
        'take'.
    """
    if gather is None:
        gather = "onehot" if jax.default_backend() == "tpu" else "take"

    def value(f, g):
        _, cf = _cdf(f)
        _, cg = _cdf(g)
        a = jnp.concatenate([cf[:-1], cg])
        tk = jnp.sort(a, stable=True)
        indf = jax.lax.stop_gradient(jnp.searchsorted(cf, tk, side="left"))
        indg = jax.lax.stop_gradient(jnp.searchsorted(cg, tk, side="left"))
        dtk = jnp.diff(tk, prepend=jnp.zeros((1,), tk.dtype))
        if indexer is not None:
            indf = indexer[0][indf]
            indg = indexer[1][indg]
        if gather == "onehot":
            hot_f = jax.nn.one_hot(indf, cost.shape[0], dtype=cost.dtype)
            hot_g = jax.nn.one_hot(indg, cost.shape[1], dtype=cost.dtype)
            rows = jnp.matmul(hot_f, cost,
                              precision=jax.lax.Precision.HIGHEST)  # (m, ng)
            dist = jnp.sum(rows * hot_g, axis=1)
        else:
            dist = cost[indf, indg]
        return jnp.dot(dist, dtk, precision=jax.lax.Precision.HIGHEST)

    return value(f, g)


# ---------------------------------------------------------------------------
# transport plan
# ---------------------------------------------------------------------------


def transport_plan_1d(f, xf, g, xg):
    """Optimal 1-D transport plan H (n_f, n_g).

    Replaces the reference's (n, n, m) one-hot materialization — flagged
    "the bottle neck and very time consuming" at OTlib.py:725-727 — with a
    single scatter-add.
    """
    _, cf = _cdf(f)
    _, cg = _cdf(g)
    _, _, indf, indg, dtk = _merge(cf, cg)
    nf, ng = f.shape[0], g.shape[0]
    return jnp.zeros((nf, ng), dtk.dtype).at[indf, indg].add(dtk)


def transport_plan_jacobian(f, xf, g, xg):
    """dH/df: Jacobian of the plan w.r.t. unnormalized source amplitudes.

    Returns (n_f, n_f, n_g) like the reference's dH (OTlib.py:730-740),
    assembled via a dense (n_f, m) Difftk and one segment scatter instead of
    an (n, n, n, m) temporary.
    """
    ampf, cf = _cdf(f)
    _, cg = _cdf(g)
    _, tkarg, indf, indg, dtk = _merge(cf, cg)
    nf, ng = f.shape[0], g.shape[0]
    m = dtk.shape[0]
    # D[i, k] = (1{k >= i} - cf[k]) / amp for merged slot k < nf-1, else 0
    k = jnp.arange(nf - 1)
    i = jnp.arange(nf)[:, None]
    D_f = (jnp.where(k[None, :] >= i, 1.0, 0.0) - cf[None, :-1]) / ampf
    D = jnp.concatenate([D_f, jnp.zeros((nf, ng), cf.dtype)], axis=1)
    difftk = D[:, tkarg]  # (nf, m)
    diffdtk = jnp.concatenate(
        [difftk[:, :1], difftk[:, 1:] - difftk[:, :-1]], axis=1)
    seg = indf * ng + indg
    flat = jax.ops.segment_sum(diffdtk.T, seg, num_segments=nf * ng)  # (nf*ng, nf)
    return jnp.moveaxis(flat.reshape(nf, ng, nf), -1, 0)


# ---------------------------------------------------------------------------
# tie diagnostics
# ---------------------------------------------------------------------------


def common_cdf_mask(f, g) -> jax.Array:
    """Jittable check of the reference's derivative-validity condition.

    True where an entry of the source CDF (excluding the final 1.0) exactly
    equals an entry of the target CDF (OTlib.py:663-666). Any True entry
    means amplitude derivatives are ill-defined at that tie.
    """
    _, cf = _cdf(f)
    _, cg = _cdf(g)
    return (cf[:-1, None] == cg[None, :-1]).any(axis=1)


def check_common_cdf(f, g) -> None:
    """Eager-mode validation; raises TargetSourceCDFError on ties."""
    import numpy as np

    mask = np.asarray(common_cdf_mask(f, g))
    if mask.any():
        _, cf = _cdf(jnp.asarray(f))
        raise errors.TargetSourceCDFError(np.asarray(cf)[:-1][mask])
