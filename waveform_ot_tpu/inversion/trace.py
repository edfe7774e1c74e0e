"""Explicit optimization traces.

The reference records optimization history through module-global mutable
"blackboards" appended inside the objective (ricker_util_opt.Wdata,
loc_cmt_util_opt.opt_history_data; SURVEY.md section 5). That pattern is
incompatible with jit/vmap and with reproducibility; the rebuild replaces it
with an explicit :class:`InversionTrace` pytree that callers thread through
host-side optimizer loops, plus a scipy callback adaptor.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List

import numpy as np


@dataclasses.dataclass
class InversionTrace:
    """Host-side record of an optimization run (replaces Wdata/opt_history).

    models[i], misfits[i] record every objective evaluation; iterates[j]
    records accepted optimizer iterations (the reference's ``recordresult``
    callback, ricker_util.py:407-411 / loc_cmt_util.py:338-350).
    """

    models: List[np.ndarray] = dataclasses.field(default_factory=list)
    misfits: List[float] = dataclasses.field(default_factory=list)
    grads: List[np.ndarray] = dataclasses.field(default_factory=list)
    iterates: List[np.ndarray] = dataclasses.field(default_factory=list)
    aux: List[Any] = dataclasses.field(default_factory=list)

    def record_eval(self, m, misfit, grad=None, aux=None) -> None:
        self.models.append(np.asarray(m).copy())
        self.misfits.append(float(misfit))
        if grad is not None:
            self.grads.append(np.asarray(grad).copy())
        if aux is not None:
            self.aux.append(aux)

    def record_iterate(self, m) -> None:
        self.iterates.append(np.asarray(m).copy())

    def wrap_objective(self, value_and_grad_fn: Callable,
                       jit: bool = True) -> Callable:
        """Wrap a (value, grad) objective so every call is recorded —
        functional replacement for the reference's in-objective appends
        (ricker_util.py:403, loc_cmt_util.py:298).

        The inner objective is jitted here (recording happens host-side,
        outside the trace); pass the result to
        ``minimize_scipy(..., jit_objective=False)``.
        """
        import jax

        inner = jax.jit(value_and_grad_fn) if jit else value_and_grad_fn

        def wrapped(m, *args, **kwargs):
            v, g = inner(m, *args, **kwargs)
            self.record_eval(m, v, g)
            return v, g

        return wrapped

    def scipy_callback(self) -> Callable:
        """Callback for scipy.optimize.minimize recording accepted iterates."""

        def cb(xk):
            self.record_iterate(xk)

        return cb

    def misfit_per_iterate(self) -> np.ndarray:
        """Misfit at each accepted iterate (reference findres,
        ricker_util.py:413-426). The evaluation log is indexed once by
        model bytes (first occurrence wins, matching the reference's
        first-match scan), so lookup is O(evals + iterates) rather than the
        reference's O(evals * iterates) rescans."""
        index: dict = {}
        for m, w in zip(self.models, self.misfits):
            index.setdefault((m.shape, m.tobytes()), w)
        out = [index[key] for it in self.iterates
               if (key := (it.shape, it.tobytes())) in index]
        return np.asarray(out)
