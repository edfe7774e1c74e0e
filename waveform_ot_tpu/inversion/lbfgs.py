"""On-device L-BFGS driver and scipy bridge.

The reference runs scipy's L-BFGS-B on the host with the objective
returning (value, jacobian) (Ricker_Figs_3_8 cell 32, Figs_9_10_11
cell 57). The rebuild offers both:

  * :func:`minimize_scipy` — scipy L-BFGS-B over a jitted
    ``value_and_grad`` (host optimizer loop, device objective); drop-in
    match for the reference workflow.
  * :func:`minimize_lbfgs` — a fully on-device L-BFGS (optax.lbfgs with
    zoom linesearch inside ``lax.while_loop``), jittable AND vmappable —
    this is what turns the reference's 64-repeat convergence study
    (source_location_cmt_W2L2_Fig_12 cells 46-47, serial) into a single
    batched device computation (:func:`minimize_multi_start`).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
import optax.tree_utils as otu


class LBFGSResult(NamedTuple):
    x: jax.Array
    fun: jax.Array
    grad_norm: jax.Array
    n_iter: jax.Array
    # batched solver only: lanes frozen because the backtracking linesearch
    # exhausted its trials without an acceptable step (e.g. the objective is
    # non-finite around the iterate) — they did NOT converge to tol. The
    # zoom path never freezes lanes, so it leaves this None.
    ls_failed: jax.Array | None = None


def minimize_lbfgs(fun: Callable, x0, max_iter: int = 200, tol: float = 1e-8,
                   memory_size: int = 10) -> LBFGSResult:
    """Minimize a scalar function on-device. ``fun`` must be jit-traceable.

    Uses optax.lbfgs (two-loop recursion + zoom linesearch); terminates on
    gradient-norm <= tol or max_iter. Safe under jit and vmap.
    """
    opt = optax.lbfgs(memory_size=memory_size)
    value_and_grad = optax.value_and_grad_from_state(fun)

    def step(carry):
        x, state = carry
        value, grad = value_and_grad(x, state=state)
        updates, state = opt.update(grad, state, x, value=value, grad=grad,
                                    value_fn=fun)
        return optax.apply_updates(x, updates), state

    def cond(carry):
        _, state = carry
        count = otu.tree_get(state, "count")
        grad = otu.tree_get(state, "grad")
        return (count == 0) | ((count < max_iter)
                               & (otu.tree_norm(grad) >= tol))

    x, state = jax.lax.while_loop(cond, step, (x0, opt.init(x0)))
    grad = otu.tree_get(state, "grad")
    return LBFGSResult(x=x, fun=fun(x), grad_norm=otu.tree_norm(grad),
                       n_iter=otu.tree_get(state, "count"))


def minimize_multi_start(fun: Callable, x0s, max_iter: int = 200,
                         tol: float = 1e-8,
                         method: str = "batched") -> LBFGSResult:
    """Multi-start minimization: x0s is (k, nm); every field of the result
    carries the leading k axis. One device launch replaces the reference's
    serial 64-start repeat study (Fig_12 cells 46-47).

    method='batched' (default): :func:`minimize_lbfgs_batched` — masked
    early exit + value-only interpolation backtracking; 2.0x faster than
    the vmapped-zoom path on the 64-start bench (946 ms vs 1869 ms,
    BASELINE.md) with the same basins reached.
    method='zoom': vmap of :func:`minimize_lbfgs` (optax zoom linesearch),
    kept as the strong-Wolfe cross-check.
    """
    if method == "batched":
        return minimize_lbfgs_batched(fun, x0s, max_iter=max_iter, tol=tol)
    return jax.vmap(lambda x0: minimize_lbfgs(fun, x0, max_iter=max_iter,
                                              tol=tol))(x0s)


class _BatchLBFGSState(NamedTuple):
    x: jax.Array        # (k, n)
    f: jax.Array        # (k,)
    g: jax.Array        # (k, n)
    S: jax.Array        # (m, k, n) step history (newest last)
    Y: jax.Array        # (m, k, n) gradient-difference history
    rho: jax.Array      # (m, k)    1/(s.y); 0 marks an empty slot
    gamma: jax.Array    # (k,)      initial-Hessian scale
    it: jax.Array       # ()
    n_iter: jax.Array   # (k,)      iterations taken per lane
    active: jax.Array   # (k,) bool
    failed: jax.Array   # (k,) bool — frozen by linesearch failure, not tol
    n_ls: jax.Array     # ()        total linesearch trial rounds (stats)


def _two_loop(g, S, Y, rho, gamma):
    """Vectorized-over-lanes L-BFGS two-loop recursion (static unroll over
    the small memory axis; empty slots have rho=0 and are no-ops)."""
    m = S.shape[0]
    q = g
    alphas = []
    for i in range(m - 1, -1, -1):
        a = rho[i] * jnp.sum(S[i] * q, axis=-1)           # (k,)
        q = q - a[:, None] * Y[i]
        alphas.append(a)
    r = gamma[:, None] * q
    for i in range(m):
        b = rho[i] * jnp.sum(Y[i] * r, axis=-1)
        r = r + (alphas[m - 1 - i] - b)[:, None] * S[i]
    return -r


def minimize_lbfgs_batched(fun: Callable, x0s, max_iter: int = 200,
                           tol: float = 1e-8, memory_size: int = 10,
                           ls_max: int = 20, c1: float = 1e-4) -> LBFGSResult:
    """Batched multi-start L-BFGS with MASKED EARLY EXIT — the production
    form of :func:`minimize_multi_start`.

    ``vmap(while_loop)`` (the optax path) runs every lane until the LAST
    lane's zoom linesearch finishes: each outer iteration costs the max
    zoom depth over all lanes in value+grad evaluations (profiled: ~10
    evals/iteration, 89% of the study wall-clock inside the linesearch
    loop — BASELINE.md). Here ONE while_loop owns the batched state:

      * linesearch trials are VALUE-ONLY batched calls (~2/3 the cost of
        the zoom's value+grad trials), with quadratic-interpolation
        backtracking (the next trial step minimizes the 1-D quadratic
        through f(0), f'(0), f(alpha)) so lanes typically accept in 1-2
        trials;
      * a lane that accepts drops out of the trial mask immediately, a
        converged lane freezes entirely, and the outer loop ends when all
        lanes are done;
      * gradients are computed once per iteration, at accepted points.

    ``fun`` maps (n,) -> scalar; ``x0s`` is (k, n). Curvature-unsafe pairs
    (s.y <= 0, possible without a Wolfe condition) are skipped rather
    than stored, preserving positive-definiteness of the implicit Hessian.

    A lane whose linesearch exhausts ``ls_max`` trials without an Armijo
    acceptance (e.g. the objective is non-finite around the iterate) is
    frozen at its current point and flagged in ``result.ls_failed`` — it
    did NOT converge to tol, unlike the zoom path which keeps iterating
    such lanes.
    """
    x0s = jnp.asarray(x0s)
    k, n = x0s.shape
    m = memory_size
    fbatch = jax.vmap(fun)
    vgbatch = jax.vmap(jax.value_and_grad(fun))

    f0, g0 = vgbatch(x0s)
    gn0 = jnp.linalg.norm(g0, axis=-1)
    # a lane that is non-finite at its start can never accept a step
    # (NaN fails every Armijo comparison): mark it failed immediately
    # instead of letting `gn0 >= tol` (False for NaN) report it converged
    finite0 = jnp.isfinite(f0) & jnp.isfinite(gn0)
    st = _BatchLBFGSState(
        x=x0s, f=f0, g=g0,
        S=jnp.zeros((m, k, n), x0s.dtype),
        Y=jnp.zeros((m, k, n), x0s.dtype),
        rho=jnp.zeros((m, k), x0s.dtype),
        gamma=1.0 / jnp.maximum(gn0, 1.0),
        it=jnp.asarray(0), n_iter=jnp.zeros((k,), jnp.int32),
        active=finite0 & (gn0 >= tol), failed=~finite0,
        n_ls=jnp.asarray(0))

    def body(st: _BatchLBFGSState) -> _BatchLBFGSState:
        d = _two_loop(st.g, st.S, st.Y, st.rho, st.gamma)
        gd = jnp.sum(st.g * d, axis=-1)
        # fall back to steepest descent if the direction is not a descent
        bad = gd >= 0.0
        d = jnp.where(bad[:, None], -st.g, d)
        gd = jnp.where(bad, -jnp.sum(st.g * st.g, axis=-1), gd)

        # backtracking with quadratic interpolation; lanes leave the trial
        # mask on acceptance
        def ls_cond(c):
            alpha, f_last, accepted, f_new, trials = c
            return jnp.any(st.active & ~accepted) & (trials < ls_max)

        def ls_body(c):
            alpha, f_last, accepted, f_new, trials = c
            # next trial: minimizer of the quadratic through f(0)=f,
            # f'(0)=gd, f(alpha)=f_last, clipped to a sane backtrack range
            denom = f_last - st.f - gd * alpha
            a_interp = -0.5 * gd * alpha * alpha / jnp.where(
                denom > 0, denom, 1.0)
            a_next = jnp.where(denom > 0,
                               jnp.clip(a_interp, 0.1 * alpha, 0.7 * alpha),
                               0.5 * alpha)
            a_try = jnp.where(trials == 0, alpha,
                              jnp.where(accepted, alpha, a_next))
            f_try = fbatch(st.x + a_try[:, None] * d)
            ok = f_try <= st.f + c1 * a_try * gd
            take = st.active & ~accepted & ok
            return (jnp.where(accepted, alpha, a_try),
                    jnp.where(accepted, f_last, f_try),
                    accepted | take | ~st.active,
                    jnp.where(take, f_try, f_new),
                    trials + 1)

        alpha0 = jnp.ones((k,), x0s.dtype)
        accepted0 = ~st.active
        alpha, _, accepted, f_new, trials = jax.lax.while_loop(
            ls_cond, ls_body,
            (alpha0, st.f, accepted0, st.f, jnp.asarray(0)))
        moved = st.active & accepted & (f_new < st.f)

        x_new = jnp.where(moved[:, None], st.x + alpha[:, None] * d, st.x)
        f_acc, g_new = vgbatch(x_new)
        f_acc = jnp.where(moved, f_acc, st.f)
        g_new = jnp.where(moved[:, None], g_new, st.g)

        s = x_new - st.x
        y = g_new - st.g
        sy = jnp.sum(s * y, axis=-1)
        yy = jnp.sum(y * y, axis=-1)
        good = moved & (sy > 1e-12 * jnp.sqrt(
            jnp.sum(s * s, axis=-1) * yy))
        S2 = jnp.concatenate([st.S[1:], s[None]], axis=0)
        Y2 = jnp.concatenate([st.Y[1:], y[None]], axis=0)
        rho2 = jnp.concatenate(
            [st.rho[1:], jnp.where(good, 1.0 / jnp.where(good, sy, 1.0),
                                   0.0)[None]], axis=0)
        # lanes with a rejected pair keep their old memory entirely
        S2 = jnp.where(good[None, :, None], S2, st.S)
        Y2 = jnp.where(good[None, :, None], Y2, st.Y)
        rho2 = jnp.where(good[None, :], rho2, st.rho)
        gamma2 = jnp.where(good, sy / jnp.maximum(yy, 1e-30), st.gamma)

        gn = jnp.linalg.norm(g_new, axis=-1)
        converged = moved & jnp.isfinite(gn) & (gn < tol)
        still = st.active & moved & jnp.isfinite(gn) & (gn >= tol)
        # a lane leaving the active set any way other than convergence —
        # linesearch exhausted, or a non-finite gradient at the accepted
        # point — is a failure the caller must be able to see
        return _BatchLBFGSState(
            x=x_new, f=f_acc, g=g_new, S=S2, Y=Y2, rho=rho2, gamma=gamma2,
            it=st.it + 1, n_iter=st.n_iter + st.active.astype(jnp.int32),
            active=still,
            failed=st.failed | (st.active & ~still & ~converged),
            n_ls=st.n_ls + trials)

    st = jax.lax.while_loop(
        lambda s: jnp.any(s.active) & (s.it < max_iter), body, st)
    return LBFGSResult(x=st.x, fun=st.f,
                       grad_norm=jnp.linalg.norm(st.g, axis=-1),
                       n_iter=st.n_iter, ls_failed=st.failed)


import weakref

_HOST_JIT_CACHE = weakref.WeakKeyDictionary()


def minimize_lbfgs_batched_host(fun: Callable, x0s, max_iter: int = 200,
                                tol: float = 1e-8, memory_size: int = 10,
                                ls_max: int = 20, c1: float = 1e-4,
                                eval_chunk: int | None = None) -> LBFGSResult:
    """Host-orchestrated :func:`minimize_lbfgs_batched`: the same masked
    early-exit algorithm (two-loop recursion, value-only interpolation
    backtracking, curvature-guarded memory), but the outer iteration and
    linesearch CONTROL FLOW run in numpy while the only device programs
    are one batched value+grad and one batched value evaluation.

    Why it exists: the all-on-device while_loop form inlines ~3 copies of
    the objective graph into one program; for very large traced
    objectives (the layered f-k dd stack: 5.9 MB MLIR at the Fukuoka
    flagship) that program crashes the remote TPU compiler (SIGSEGV,
    observed round 5). Here the device never sees more than one batched
    evaluation, at the cost of ~(1 + trials) launch overheads per
    iteration — negligible against the layered objective's runtime.

    ``eval_chunk`` evaluates the k lanes in fixed-size chunks (k padded
    up): bounds the device program's working set for memory-heavy
    objectives (the 64-lane layered vag exceeds one v5e's HBM unchunked).
    """
    x0s = jnp.asarray(x0s)
    k, n = x0s.shape
    m = memory_size
    # Memoize the jitted evaluators per objective: re-tracing the
    # objective on every solver call costs MINUTES for large graphs (the
    # layered dd stack re-traces in ~4 min even with the persistent
    # compile cache warm — measured round 5), and callers like the bench
    # invoke the solver repeatedly with one fun.
    try:
        _fb, _vgb = _HOST_JIT_CACHE[fun]
    except (KeyError, TypeError):
        _fb = jax.jit(jax.vmap(fun))
        _vgb = jax.jit(jax.vmap(jax.value_and_grad(fun)))
        try:
            _HOST_JIT_CACHE[fun] = (_fb, _vgb)
        except TypeError:
            pass

    def _chunked(fn, x):
        if eval_chunk is None or eval_chunk >= x.shape[0]:
            return fn(x)
        pad = (-x.shape[0]) % eval_chunk
        xp = jnp.concatenate([x, x[:pad]], 0) if pad else x
        outs = [fn(xp[i:i + eval_chunk])
                for i in range(0, xp.shape[0], eval_chunk)]
        return jax.tree_util.tree_map(
            lambda *cs: jnp.concatenate(cs, 0)[:x.shape[0]], *outs)

    fbatch = lambda x: _chunked(_fb, x)
    vgbatch = lambda x: _chunked(_vgb, x)

    def np_vg(x):
        f, g = vgbatch(jnp.asarray(x, x0s.dtype))
        return np.asarray(f, np.float64), np.asarray(g, np.float64)

    x = np.asarray(x0s, np.float64)
    f, g = np_vg(x)
    gn = np.linalg.norm(g, axis=-1)
    finite0 = np.isfinite(f) & np.isfinite(gn)
    S = np.zeros((m, k, n))
    Y = np.zeros((m, k, n))
    rho = np.zeros((m, k))
    gamma = 1.0 / np.maximum(gn, 1.0)
    active = finite0 & (gn >= tol)
    failed = ~finite0
    n_iter = np.zeros((k,), np.int64)

    for _ in range(max_iter):
        if not active.any():
            break
        # two-loop recursion (numpy mirror of _two_loop)
        q = g.copy()
        alphas = []
        for i in range(m - 1, -1, -1):
            a = rho[i] * np.sum(S[i] * q, axis=-1)
            q -= a[:, None] * Y[i]
            alphas.append(a)
        d = gamma[:, None] * q
        for i in range(m):
            b = rho[i] * np.sum(Y[i] * d, axis=-1)
            d += (alphas[m - 1 - i] - b)[:, None] * S[i]
        d = -d
        gd = np.sum(g * d, axis=-1)
        bad = gd >= 0.0
        d[bad] = -g[bad]
        gd[bad] = -np.sum(g[bad] * g[bad], axis=-1)

        alpha = np.ones((k,))
        f_last = f.copy()
        accepted = ~active
        f_new = f.copy()
        trials = 0
        while (active & ~accepted).any() and trials < ls_max:
            denom = f_last - f - gd * alpha
            with np.errstate(invalid="ignore", divide="ignore"):
                a_interp = -0.5 * gd * alpha * alpha / np.where(
                    denom > 0, denom, 1.0)
            a_next = np.where(denom > 0,
                              np.clip(a_interp, 0.1 * alpha, 0.7 * alpha),
                              0.5 * alpha)
            a_try = alpha if trials == 0 else np.where(accepted, alpha,
                                                       a_next)
            f_try = np.asarray(fbatch(jnp.asarray(
                x + a_try[:, None] * d, x0s.dtype)), np.float64)
            ok = f_try <= f + c1 * a_try * gd
            take = active & ~accepted & ok
            alpha = np.where(accepted, alpha, a_try)
            f_last = np.where(accepted, f_last, f_try)
            f_new = np.where(take, f_try, f_new)
            accepted = accepted | take
            trials += 1
        moved = active & accepted & (f_new < f)

        x_new = np.where(moved[:, None], x + alpha[:, None] * d, x)
        f_acc, g_new = np_vg(x_new)
        f_acc = np.where(moved, f_acc, f)
        g_new = np.where(moved[:, None], g_new, g)

        s = x_new - x
        y = g_new - g
        sy = np.sum(s * y, axis=-1)
        yy = np.sum(y * y, axis=-1)
        good = moved & (sy > 1e-12 * np.sqrt(np.sum(s * s, axis=-1) * yy))
        S = np.concatenate([S[1:], s[None]], axis=0)
        Y = np.concatenate([Y[1:], y[None]], axis=0)
        rho_new = np.where(good, 1.0 / np.where(good, sy, 1.0), 0.0)
        rho = np.concatenate([rho[1:], rho_new[None]], axis=0)
        gamma = np.where(good, sy / np.maximum(yy, 1e-30), gamma)

        gn = np.linalg.norm(g_new, axis=-1)
        converged = moved & np.isfinite(gn) & (gn < tol)
        still = active & moved & np.isfinite(gn) & (gn >= tol)
        failed = failed | (active & ~still & ~converged)
        n_iter += active.astype(np.int64)
        x, f, g, active = x_new, f_acc, g_new, still

    dtype = x0s.dtype
    return LBFGSResult(x=jnp.asarray(x, dtype), fun=jnp.asarray(f, dtype),
                       grad_norm=jnp.asarray(np.linalg.norm(g, axis=-1),
                                             dtype),
                       n_iter=jnp.asarray(n_iter, jnp.int32),
                       ls_failed=jnp.asarray(failed))


def minimize_multi_start_sharded(fun: Callable, x0s, mesh,
                                 axis_name: str = "batch",
                                 max_iter: int = 200,
                                 tol: float = 1e-8) -> LBFGSResult:
    """Multi-chip multi-start: the start axis of ``x0s`` (k, n) is sharded
    over ``mesh`` and each device runs :func:`minimize_lbfgs_batched` on
    its local shard — zero inter-chip traffic, result fields stay sharded
    over the start axis. The scaling form of the Fig-12 repeat study for
    start counts beyond one chip (the mesh size must divide k).

    Per-shard early exit is strictly better than global: a device whose
    lanes all converge finishes its program early instead of waiting on
    the slowest lane of the whole study.
    """
    from jax.sharding import PartitionSpec as P

    local = lambda xs: minimize_lbfgs_batched(fun, xs, max_iter=max_iter,
                                              tol=tol)
    f = jax.shard_map(
        local, mesh=mesh, in_specs=P(axis_name),
        out_specs=LBFGSResult(x=P(axis_name), fun=P(axis_name),
                              grad_norm=P(axis_name), n_iter=P(axis_name),
                              ls_failed=P(axis_name)),
        # the solver's custom-VJP objective defeats the static
        # varying-manual-axes inference (see parallel/grid_shard.py); the
        # outputs are genuinely per-lane (sharded), asserted by tests
        check_vma=False,
    )
    return f(jnp.asarray(x0s))


def minimize_scipy(value_and_grad_fn: Callable, x0, method: str = "L-BFGS-B",
                   callback=None, jit_objective: bool = True, **kwargs):
    """scipy.optimize.minimize over a jitted (value, grad) function —
    the reference's host-loop workflow. Returns the scipy result object.

    Pass ``jit_objective=False`` when the objective has host-side effects
    (e.g. an InversionTrace-wrapped function, which jits internally)."""
    import numpy as np
    from scipy.optimize import minimize

    jitted = jax.jit(value_and_grad_fn) if jit_objective else value_and_grad_fn

    def fun(m):
        v, g = jitted(jnp.asarray(m))
        return float(v), np.asarray(g, dtype=np.float64)

    return minimize(fun, np.asarray(x0, dtype=np.float64), jac=True,
                    method=method, callback=callback, **kwargs)
