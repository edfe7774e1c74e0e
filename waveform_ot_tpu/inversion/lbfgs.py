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
import optax
import optax.tree_utils as otu


class LBFGSResult(NamedTuple):
    x: jax.Array
    fun: jax.Array
    grad_norm: jax.Array
    n_iter: jax.Array


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
                         tol: float = 1e-8) -> LBFGSResult:
    """vmapped multi-start minimization: x0s is (k, nm); every field of the
    result carries the leading k axis. One device launch replaces the
    reference's serial 64-start repeat study (Fig_12 cells 46-47)."""
    return jax.vmap(lambda x0: minimize_lbfgs(fun, x0, max_iter=max_iter,
                                              tol=tol))(x0s)


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
