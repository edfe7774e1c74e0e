"""Forward models (reference L3 physics: ricker_util.py, loc_cmt_util.py, myGP.py)."""

from waveform_ot_tpu.models.ricker import (  # noqa: F401
    ricker, ricker_wavelet, ricker_wavelet_noisy,
    ricker_wavelet_with_jacobian,
)
from waveform_ot_tpu.models import gp_noise  # noqa: F401
from waveform_ot_tpu.models.seismo import (  # noqa: F401
    MediumConfig, StationSet, moment_tensor_from_sdr, moment_tensor_ls,
    mxyz_from_upper, synthetic_seismograms, upper_from_mxyz,
)
from waveform_ot_tpu.models import pyprop8_bridge  # noqa: F401
