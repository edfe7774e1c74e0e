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
from waveform_ot_tpu.models.layered import (  # noqa: F401
    LayeredModel, fukuoka_model, layered_model_from_table,
    layered_seismograms, make_layered_forward, make_layered_stages,
    uniform_model, wholespace_seismograms,
)
