"""Optional POT (Python Optimal Transport) validation bridge.

Reference: wasserPOT / sinkhornPOT (libs/OTlib.py:906-928, 1015-1053) —
import-guarded wrappers around the POT library's exact network-simplex EMD
and Sinkhorn solvers, used purely for cross-validation. Host-side NumPy;
raises :class:`errors.POTLibraryError` when POT is absent (matching the
reference's guard at OTlib.py:24-28).
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


def _require_pot():
    if not HAVE_POT:
        raise errors.POTLibraryError()


def _cost(source, target, distfunc):
    if isinstance(distfunc, str):
        metric = "sqeuclidean" if distfunc == "W2" else "cityblock"
        a = np.asarray(source.x).reshape(source.n, -1)
        b = np.asarray(target.x).reshape(target.n, -1)
        return _pot.dist(a, b, metric=metric)
    d = np.asarray(distfunc)
    if d.ndim != 2:
        raise errors.UnknownOTDistanceTypeError(distfunc)
    return d


def wasser_pot(source, target, distfunc="W2", returnplan=False,
               returndist=False, maxiters: int = 100000):
    """Exact EMD via POT (reference wasserPOT, OTlib.py:906-928)."""
    _require_pot()
    A = _cost(source, target, distfunc)
    M = A / A.max()
    G0 = _pot.emd(np.asarray(source.pdf).ravel(),
                  np.asarray(target.pdf).ravel(), M, numItermax=maxiters)
    out = [float(np.sum(G0 * A))]
    if returnplan:
        out.append(G0)
    if returndist:
        out.append(A)
    return out


def sinkhorn_pot(source, target, distfunc="W2", returnplan=False,
                 gamma: float = 5e-4, returndist=False):
    """Entropic OT via POT (reference sinkhornPOT, OTlib.py:1015-1053),
    including its zero-amplitude replacement workaround."""
    _require_pot()
    a = np.array(source.pdf, copy=True).ravel()
    b = np.array(target.pdf, copy=True).ravel()
    for v in (a, b):
        z = v == 0.0
        if z.any():
            v[z] = v[~z].min()
    A = _cost(source, target, distfunc)
    M = A / A.max()
    Gs = _pot.sinkhorn(a, b, M, gamma)
    out = [float(np.sum(Gs * A))]
    if returnplan:
        out.append(Gs)
    if returndist:
        out.append(A)
    return out
