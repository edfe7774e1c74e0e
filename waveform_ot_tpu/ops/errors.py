"""Typed error taxonomy for the OT core.

Mirrors the reference's exception classes (reference: libs/OTlib.py:30-80,
libs/FingerprintLib.py:29-46) so users migrating from the reference find the
same failure modes. Because most of this library runs under ``jax.jit``
(where Python exceptions cannot depend on traced values), these are raised
only by eager-mode validation helpers such as
:func:`waveform_ot_tpu.ops.otpdf.validate_density` and by static
configuration checks; inside jitted code the same conditions are exposed as
boolean arrays (e.g. :func:`waveform_ot_tpu.ops.wasser.common_cdf_mask`).
"""

from __future__ import annotations


class OTError(Exception):
    """Base class for all waveform-ot-tpu OT errors."""


class PDFShapeError(OTError):
    """Amplitude and location arrays of a density have mismatched shapes.

    Reference analog: OTlib.py PDFShapeError (OTlib.py:30).
    """

    def __init__(self, msg: str = "pdf amplitude/location shape mismatch"):
        super().__init__(msg)


class PDFSignError(OTError):
    """A density was constructed with negative amplitudes.

    Reference analog: OTlib.py PDFSignError (OTlib.py:91 check).
    """

    def __init__(self, msg: str = "pdf amplitudes must be non-negative"):
        super().__init__(msg)


class TargetSourceCDFError(OTError):
    """Source and target CDFs share a common value.

    Amplitude derivatives of the 1-D Wasserstein distance are undefined at
    such ties (reference: OTlib.py:663-666). In practice this is avoided by
    adding a small perturbation/noise to one side.
    """

    def __init__(self, common=None):
        self.common = common
        super().__init__(
            "source and target CDFs share common values; derivatives are "
            f"not defined at ties: {common}"
        )


class TargetSource2DShapeError(OTError):
    """A 2-D operation (marginals, slicing) was applied to a 1-D density."""

    def __init__(self, msg: str = "operation requires a 2-D density"):
        super().__init__(msg)


class SlicedWassersteinError(OTError):
    """Invalid parameters passed to a sliced-Wasserstein routine.

    Reference analog: OTlib.py SlicedWassersteinError (OTlib.py:67) —
    declared there for API completeness (the reference never raises it);
    here :func:`waveform_ot_tpu.ops.sliced.projection_angles` raises it
    for a non-positive projection count.
    """


class UnknownOTDistanceTypeError(OTError):
    """Unrecognized distance specification (expected 'W1'|'W2'|'W12'|array)."""

    def __init__(self, distfunc=None):
        super().__init__(f"unknown OT distance specification: {distfunc!r}")


class DistfuncShapeError(OTError):
    """A precomputed cost array does not match (source_n, target_n)."""


class MarginalWassersteinError(OTError):
    """Invalid mode for marginal Wasserstein (e.g. 'W12' not supported)."""

    def __init__(self, mset="W12"):
        super().__init__(f"marginal Wasserstein does not support mode {mset!r}")


class WaveformFPderivError(OTError):
    """Fingerprint derivative requested before the distance field exists.

    Cannot occur in the functional API (derivatives are computed jointly),
    kept for API-parity error handling in the compatibility layer.
    """


class FingerprintMethodError(OTError):
    """Unknown distance-field method (expected 'enumerate'|'pallas'|'nn')."""

    def __init__(self, method=None):
        super().__init__(f"unknown fingerprint method: {method!r}")


class FMMLibraryError(OTError):
    """The optional scikit-fmm dependency is not installed."""

    def __init__(self):
        super().__init__("scikit-fmm is not installed; FMM method unavailable")


class POTLibraryError(OTError):
    """The optional POT (python optimal transport) dependency is missing."""

    def __init__(self):
        super().__init__("POT library is not installed")


# -- reference-spelling aliases ---------------------------------------------
# The reference declares these names with different casing/typos
# (OTlib.py:24 `Error`, OTlib.py:75 `POTlibraryError`,
# FingerprintLib.py:29 `WaveformPFderivError` [sic],
# FingerprintLib.py:41 `FMMlibraryError`). Migrating code catches the
# reference spellings, so both must resolve to the same classes —
# `except fp.WaveformPFderivError` must not raise AttributeError. The
# compat modules re-export the full set; tests/test_compat.py's
# reference-name sweep machine-checks every public reference name.

Error = OTError
POTlibraryError = POTLibraryError
WaveformPFderivError = WaveformFPderivError
FMMlibraryError = FMMLibraryError
