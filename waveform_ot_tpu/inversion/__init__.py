"""Inversion layer: objectives, pipelines, optimizers, traces (reference L3)."""

from waveform_ot_tpu.inversion.pipeline import (  # noqa: F401
    Targets, TraceConfig, apply_transform, build_fingerprint, build_target,
    calc_wasser_waveform, dg_scale, grid6_to_window, trace_misfit,
)
from waveform_ot_tpu.inversion.objective import (  # noqa: F401
    RickerProblem, make_ricker_problem, ricker_misfit, ricker_objective,
    ricker_value_and_grad,
)
