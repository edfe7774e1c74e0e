"""Core numerics: optimal transport + waveform fingerprints (reference L2)."""

from waveform_ot_tpu.ops import errors  # noqa: F401
from waveform_ot_tpu.ops.otpdf import (  # noqa: F401
    Density1D, Density2D, make_density, make_density_1d, make_density_2d,
    marginals, marginals_raw, validate_density,
)
from waveform_ot_tpu.ops.wasser import (  # noqa: F401
    wasserstein_1d, wasserstein_1d_autodiff, wasserstein_1d_cost, wasser,
    transport_plan_1d, transport_plan_jacobian, common_cdf_mask,
    check_common_cdf,
)
from waveform_ot_tpu.ops.marginal import (  # noqa: F401
    marg_wasserstein, marg_wasserstein_value,
)
from waveform_ot_tpu.ops.fingerprint import (  # noqa: F401
    Window, make_window, window_from_waveform, FingerprintSpec,
    normalize_vertices, grid_axes, DistanceField, distance_field,
    distance_field_diff, distance_field_nn, density_from_distance,
    fingerprint_density, point_distance,
)
from waveform_ot_tpu.ops.transforms import arctan_transform  # noqa: F401
from waveform_ot_tpu.ops.sliced import (  # noqa: F401
    SlicedProjections, project_sliced, sliced_wasserstein,
    sliced_wasserstein_plan_cost, sliced_wasserstein_value,
)
from waveform_ot_tpu.ops.sinkhorn import (  # noqa: F401
    gaussian_filter, sinkhorn_dense, sinkhorn_gaussian, sinkhorn_log,
)
from waveform_ot_tpu.ops.barycenter import (  # noqa: F401
    barycenter_continuous, barycenter_pointmass,
)
from waveform_ot_tpu.ops.sliced import sliced_plan_jacobian  # noqa: F401
from waveform_ot_tpu.ops import fmm, pot_bridge  # noqa: F401
