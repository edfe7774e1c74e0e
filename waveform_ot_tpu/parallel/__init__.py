"""Mesh/sharding utilities (no reference analog — SURVEY.md section 2.5)."""

from waveform_ot_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, pjit_batched_misfit, replicate, shard_leading_axis,
    sharded_map, sharded_sum,
)

from waveform_ot_tpu.parallel.grid_shard import (  # noqa: F401
    dp_sp_marg_misfit, grid_sharded_density, grid_sharded_marg_misfit,
    make_mesh_2d, shard_grid_axis,
)
