"""Utilities: IO/checkpointing, profiling, explicit config records."""

from waveform_ot_tpu.utils.io import (  # noqa: F401
    read_json, read_pickle, restore_checkpoint, save_checkpoint, write_json,
    write_pickle,
)
from waveform_ot_tpu.utils.profiling import (  # noqa: F401
    StageTimer, benchmark, top_device_ops,
)
