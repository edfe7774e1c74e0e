"""Native (C++) validation solvers: exact EMD + fast marching.

The reference reaches native code only through optional wheels — POT's
network-simplex EMD (libs/OTlib.py:906-928, 1015-1053) and scikit-fmm's
fast marching (libs/FingerprintLib.py:139-152) — neither of which is
installable here. This package builds a small self-contained C++ library
(``src/wotnative.cpp``) on demand with g++ and binds it through ctypes
(no pybind11 needed), so the POT/FMM-dependent behaviours of the reference
are live in this framework rather than permanently gated.

Public API:
  emd(a, b, cost)            -> (cost_value, plan)   exact transportation solve
  fmm_distance(phi, dx, ...) -> signed distance to phi's zero contour
  available()                -> bool (toolchain present & library builds)
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

__all__ = ["emd", "fmm_distance", "available", "NativeBuildError"]

_SRC = Path(__file__).parent / "src" / "wotnative.cpp"
_BUILD_DIR = Path(__file__).parent / "_build"

_lib_handle = None
_build_error: Exception | None = None


class NativeBuildError(RuntimeError):
    """The native library could not be compiled or loaded."""


def _compile(src: Path, out: Path) -> None:
    out.parent.mkdir(parents=True, exist_ok=True)
    # Build into a temp name then atomically rename: concurrent test workers
    # may race on the first build.
    with tempfile.NamedTemporaryFile(
            dir=str(out.parent), suffix=".so", delete=False) as tf:
        tmp = Path(tf.name)
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
           str(src), "-o", str(tmp)]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:  # g++ missing/hung
        tmp.unlink(missing_ok=True)
        raise NativeBuildError(f"failed to run g++: {e}") from e
    if proc.returncode != 0:
        tmp.unlink(missing_ok=True)
        raise NativeBuildError(
            f"g++ failed (rc={proc.returncode}):\n{proc.stderr[-4000:]}")
    os.replace(tmp, out)


def _load() -> ctypes.CDLL:
    global _lib_handle, _build_error
    if _lib_handle is not None:
        return _lib_handle
    if _build_error is not None:
        raise NativeBuildError(str(_build_error))
    try:
        tag = hashlib.sha1(_SRC.read_bytes()).hexdigest()[:12]
        so = _BUILD_DIR / f"wotnative-{tag}.so"
        if not so.exists():
            _compile(_SRC, so)
        lib = ctypes.CDLL(str(so))
        lib.wot_emd.restype = ctypes.c_double
        lib.wot_emd.argtypes = [
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_long, ctypes.POINTER(ctypes.c_int),
        ]
        lib.wot_fmm_distance.restype = ctypes.c_int
        lib.wot_fmm_distance.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_double),
            ctypes.c_double, ctypes.c_double, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib_handle = lib
        return lib
    except Exception as e:
        _build_error = e
        raise NativeBuildError(str(e)) from e


def available() -> bool:
    """True when the native library is built (or buildable) and loadable."""
    try:
        _load()
        return True
    except NativeBuildError:
        return False


def _as_c(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float64)


def emd(a, b, cost, max_ratio_check: float = 1e-6,
        max_iter: int | None = None):
    """Exact optimal transport between discrete masses (native solver).

    Solves min <F, cost> s.t. F 1 = a, F^T 1 = b, F >= 0 by successive
    shortest augmenting paths (wotnative.cpp). Equivalent to POT's
    ``ot.emd`` on balanced problems; ``b`` is rescaled to sum(a) within
    ``max_ratio_check`` (mirroring POT's tolerance behaviour).

    Args:
      a: (n,) non-negative source masses.
      b: (m,) non-negative target masses.
      cost: (n, m) pairwise cost matrix.
      max_iter: augmentation cap (like POT's numItermax); None selects the
        solver's internal bound n*m + n + m + 64.

    Returns:
      (value, plan): the optimal cost ``sum(plan * cost)`` and the (n, m)
      optimal transport plan.

    Complexity is ~O((n+m) * n * m) with dense Dijkstra passes — exact
    and dependency-free, sized for validation problems (n, m up to a few
    hundred run in well under a second; 512x512 takes ~10 s). For larger
    production EMDs install POT (``backend='pot'`` in the bridges).
    """
    lib = _load()
    a = _as_c(np.ravel(a))
    b = _as_c(np.ravel(b))
    cost = _as_c(cost)
    n, m = a.shape[0], b.shape[0]
    if cost.shape != (n, m):
        raise ValueError(f"cost shape {cost.shape} != ({n}, {m})")
    sa, sb = float(a.sum()), float(b.sum())
    if sa <= 0 or sb <= 0:
        raise ValueError("masses must have positive total")
    if abs(sa - sb) > max_ratio_check * max(sa, sb):
        raise ValueError(f"unbalanced masses: sum(a)={sa!r}, sum(b)={sb!r}")
    plan = np.zeros((n, m), dtype=np.float64)
    status = ctypes.c_int(0)
    dp = ctypes.POINTER(ctypes.c_double)
    value = lib.wot_emd(
        n, m, a.ctypes.data_as(dp), b.ctypes.data_as(dp),
        cost.ctypes.data_as(dp), plan.ctypes.data_as(dp),
        0 if max_iter is None else int(max_iter), ctypes.byref(status))
    if status.value != 0:
        raise RuntimeError(f"wot_emd failed with status {status.value}")
    return value, plan


def fmm_distance(phi, dx, order: int = 2):
    """Signed distance to the zero contour of ``phi`` by fast marching.

    Same contract as ``skfmm.distance``: ``phi`` is an (nu, nt) level-set
    field (the fingerprint pipeline passes a +/-1 indicator,
    libs/FingerprintLib.py:142-146); ``dx = (du, dt)`` are the grid
    spacings; the result carries the sign of ``phi``. ``order`` selects
    first- or second-order upwind differences (skfmm defaults to 2).
    """
    lib = _load()
    phi = _as_c(phi)
    if phi.ndim != 2:
        raise ValueError("phi must be 2-D")
    du, dt = float(dx[0]), float(dx[1])
    nu, nt = phi.shape
    out = np.empty((nu, nt), dtype=np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    rc = lib.wot_fmm_distance(nu, nt, phi.ctypes.data_as(dp), du, dt,
                              int(order), out.ctypes.data_as(dp))
    if rc == 2:
        raise ValueError("phi has no zero contour")
    if rc != 0:
        raise ValueError(f"wot_fmm_distance failed with rc {rc}")
    return out
