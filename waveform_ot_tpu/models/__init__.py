"""Forward models (reference L3 physics: ricker_util.py, loc_cmt_util.py, myGP.py)."""

from waveform_ot_tpu.models.ricker import (  # noqa: F401
    ricker, ricker_wavelet, ricker_wavelet_with_jacobian,
)
from waveform_ot_tpu.models import gp_noise  # noqa: F401
