"""Exact-EMD / entropic-OT validation bridge (native C++ solver, optional POT).

Reference: wasserPOT / sinkhornPOT (libs/OTlib.py:906-928, 1015-1053) —
import-guarded wrappers around the POT library's exact network-simplex EMD
and Sinkhorn solvers, used purely for cross-validation.

POT is not installable in this environment, so the default backend is the
framework's own exact solver: a C++ successive-shortest-paths min-cost
flow (waveform_ot_tpu/native/src/wotnative.cpp) for the EMD, and a NumPy
Sinkhorn-Knopp loop with POT's update/termination semantics for the
entropic variant. POT is still preferred when present.
:class:`errors.POTLibraryError` is raised only when the requested backend
is unavailable (matching the reference guard at OTlib.py:24-28 for
backend='pot').

Host-side NumPy throughout — these are validation paths; the production
solvers are the jitted closed-form `ops.wasser` / `ops.sinkhorn` modules.
"""

from __future__ import annotations

import numpy as np

from waveform_ot_tpu.ops import errors

try:
    import ot as _pot

    HAVE_POT = True
except ImportError:  # pragma: no cover - environment without POT
    _pot = None
    HAVE_POT = False


def _have_native() -> bool:
    from waveform_ot_tpu import native

    return native.available()


def _resolve_backend(backend: str) -> str:
    if backend == "auto":
        return "pot" if HAVE_POT else "native"
    return backend


def _require(backend: str) -> None:
    if backend == "pot" and not HAVE_POT:
        raise errors.POTLibraryError()
    if backend == "native" and not _have_native():  # pragma: no cover
        raise errors.POTLibraryError()
    if backend not in ("pot", "native"):
        raise ValueError(f"unknown POT-bridge backend {backend!r}")


def _pairwise(a, b, power):
    diff = a[:, None, :] - b[None, :, :]
    d = np.sqrt(np.sum(diff * diff, axis=2))
    return d**power


def _cost(source, target, distfunc):
    if isinstance(distfunc, str):
        if distfunc not in ("W1", "W2"):
            raise errors.UnknownOTDistanceTypeError(distfunc)
        a = np.asarray(source.x, dtype=np.float64).reshape(source.n, -1)
        b = np.asarray(target.x, dtype=np.float64).reshape(target.n, -1)
        if distfunc == "W1":
            # reference metric is cityblock for W1 (OTlib.py:913)
            return np.sum(np.abs(a[:, None, :] - b[None, :, :]), axis=2)
        return _pairwise(a, b, 2)
    d = np.asarray(distfunc)
    if d.ndim != 2:
        raise errors.UnknownOTDistanceTypeError(distfunc)
    return d


def wasser_pot(source, target, distfunc="W2", returnplan=False,
               returndist=False, maxiters: int = 100000,
               backend: str = "auto"):
    """Exact EMD (reference wasserPOT, OTlib.py:906-928).

    backend: 'pot' (the POT wheel; raises POTLibraryError when absent,
    the reference behaviour), 'native' (built-in C++ min-cost flow), or
    'auto' (POT when installed, else native).
    """
    backend = _resolve_backend(backend)
    _require(backend)
    A = _cost(source, target, distfunc)
    M = A / A.max()
    a = np.asarray(source.pdf, dtype=np.float64).ravel()
    b = np.asarray(target.pdf, dtype=np.float64).ravel()
    if backend == "pot":
        G0 = _pot.emd(a, b, M, numItermax=maxiters)
    else:
        from waveform_ot_tpu import native

        _, G0 = native.emd(a, b, M, max_iter=maxiters)
    out = [float(np.sum(G0 * A))]
    if returnplan:
        out.append(G0)
    if returndist:
        out.append(A)
    return out


def _sinkhorn_knopp(a, b, M, reg, num_iter_max=5000, stop_thr=1e-9):
    """Sinkhorn fixed point with POT's (a / Kv, b / K^T u) update order,
    run in the log domain so small regularizations don't underflow
    exp(-M/reg) (POT's method='sinkhorn_log')."""
    from scipy.special import logsumexp

    logK = -M / reg
    la, lb = np.log(a), np.log(b)
    f = np.zeros(a.shape[0])
    g = np.zeros(b.shape[0])
    for it in range(num_iter_max):
        f = la - logsumexp(logK + g[None, :], axis=1)
        g = lb - logsumexp(logK + f[:, None], axis=0)
        if it % 10 == 0:
            plan_rows = np.exp(f[:, None] + logK + g[None, :]).sum(1)
            if np.linalg.norm(plan_rows - a) < stop_thr:
                break
    return np.exp(f[:, None] + logK + g[None, :])


def sinkhorn_pot(source, target, distfunc="W2", returnplan=False,
                 gamma: float = 5e-4, returndist=False,
                 backend: str = "auto"):
    """Entropic OT (reference sinkhornPOT, OTlib.py:1015-1053),
    including its zero-amplitude replacement workaround."""
    backend = _resolve_backend(backend)
    _require(backend)
    a = np.array(source.pdf, dtype=np.float64, copy=True).ravel()
    b = np.array(target.pdf, dtype=np.float64, copy=True).ravel()
    for v in (a, b):
        z = v == 0.0
        if z.any():
            v[z] = v[~z].min()
    A = _cost(source, target, distfunc)
    M = A / A.max()
    if backend == "pot":
        Gs = _pot.sinkhorn(a, b, M, gamma)
    else:
        Gs = _sinkhorn_knopp(a, b, M, gamma)
    out = [float(np.sum(Gs * A))]
    if returnplan:
        out.append(Gs)
    if returndist:
        out.append(A)
    return out
