"""Optional fast-marching distance field (scikit-fmm bridge).

Reference: the 'FMM' branch of waveformFP.calcpdf
(libs/FingerprintLib.py:139-152): build a signed indicator (+1 above the
waveform interpolated onto the grid time axis, -1 below), run
skfmm.distance, take |.|. Kept for parity as a host-side path; the
Enumerate/Pallas exact polyline field is the production method. Raises
:class:`errors.FMMLibraryError` when scikit-fmm is absent, like the
reference guard at FingerprintLib.py:139-141.

Note the reference's own comments question its dx handling ("IS
self.delgrid the wrong way around here?", FingerprintLib.py:148); this
implementation reproduces the reference behaviour as-is, including passing
(d_amplitude, d_time) cell sizes.
"""

from __future__ import annotations

import numpy as np

from waveform_ot_tpu.ops import errors

try:
    import skfmm as _skfmm

    HAVE_SKFMM = True
except ImportError:  # pragma: no cover - environment without skfmm
    _skfmm = None
    HAVE_SKFMM = False


def signed_indicator(t, w, tgrid, ugrid):
    """The FMM seed field phi: +1 above the grid-interpolated waveform,
    -1 on/below (FingerprintLib.py:142-146). Pure NumPy — also used by
    viz.plot_phi, so it works without scikit-fmm installed."""
    t = np.asarray(t)
    w = np.asarray(w)
    tgrid = np.asarray(tgrid)
    ugrid = np.asarray(ugrid)
    phi = -np.ones((len(ugrid), len(tgrid)))
    wi = np.interp(tgrid, t, w)
    _, Yn = np.meshgrid(tgrid, ugrid)
    phi[Yn > wi] = 1.0
    return phi


def distance_field_fmm(t, w, tgrid, ugrid):
    """|signed distance| to the waveform's grid-interpolated zero contour.

    Args (NumPy, host-side):
      t, w:   waveform samples.
      tgrid:  (ntg,) grid time axis; ugrid: (nu,) amplitude axis
              (physical or normalized — consistent with t, w).

    Returns (nu, ntg) distances.
    """
    if not HAVE_SKFMM:
        raise errors.FMMLibraryError()
    tgrid = np.asarray(tgrid)
    ugrid = np.asarray(ugrid)
    nu, ntg = len(ugrid), len(tgrid)
    phi = signed_indicator(t, w, tgrid, ugrid)
    du = (ugrid[-1] - ugrid[0]) / nu
    dt = (tgrid[-1] - tgrid[0]) / ntg
    d = _skfmm.distance(phi, dx=np.array([du, dt]))
    return np.abs(d)
