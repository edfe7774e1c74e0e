"""Sequence-parallel fingerprint demo: one grid sharded over a device mesh.

The data-parallel axis (examples/scaling_study.py) scales the TRACE batch;
this demo scales a SINGLE fingerprint: the (nu, ntg) grid's time columns
are sharded over the mesh (parallel/grid_shard.py), the polyline is
replicated, and only the marginals cross the interconnect (all_gather +
psum). Value and gradient are verified against the single-device pipeline.

Runs anywhere: on a multi-chip TPU slice the mesh spans real chips; here
it runs on a virtual 8-device CPU mesh (forced below), which executes the
identical sharded program.

Run: python examples/seq_parallel_fingerprint.py
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize pins the TPU plugin

import jax.numpy as jnp


def main() -> None:
    from waveform_ot_tpu.ops import make_density_1d
    from waveform_ot_tpu.ops.fingerprint import (
        density_from_distance, distance_field_diff,
    )
    from waveform_ot_tpu.ops.marginal import marg_wasserstein_value
    from waveform_ot_tpu.parallel import (
        grid_sharded_marg_misfit, make_mesh, shard_grid_axis,
    )

    n_dev = len(jax.devices())
    mesh = make_mesh(axis_name="seq")
    print(f"mesh: {n_dev} x {jax.devices()[0].platform} devices")

    # the FingerprintLib __main__ demo scale: 626-sample waveform, 800x600
    nt, nu, ntg = 626, 800, 600
    t = jnp.linspace(0.0, 1.0, nt)
    w = (2 * jnp.sin(t * 6 * np.pi)
         - 3 * jnp.cos((2 * t + 0.30) * 2 * np.pi)) / 6.0 + 0.5
    verts = jnp.stack([t, w], axis=1)
    tgrid = jnp.linspace(0.0, 1.0, ntg)
    ugrid = jnp.linspace(0.0, 1.0, nu)
    rng = np.random.default_rng(0)
    target_t = make_density_1d(jnp.asarray(rng.random(ntg) + 0.1), tgrid)
    target_u = make_density_1d(jnp.asarray(rng.random(nu) + 0.1), ugrid)

    # single-device oracle
    def ref_obj(v, ts):
        u2d = density_from_distance(
            distance_field_diff(v, tgrid, ugrid, "xla"), 0.04, q=None)
        wt, wu = marg_wasserstein_value(u2d, tgrid, ugrid, target_t,
                                        target_u, p=2, tshift=ts)
        return 0.5 * wt + 0.5 * wu

    # grid-sharded: each device owns ntg/n_dev columns
    fn = grid_sharded_marg_misfit(mesh, lambdav=0.04, q=None, p=2,
                                  impl="xla")
    tg_sh = shard_grid_axis(tgrid, mesh)

    def sharded_obj(v, ts):
        wt, wu = fn(v, tg_sh, ugrid, target_t, target_u, ts)
        return 0.5 * wt + 0.5 * wu

    ts0 = jnp.asarray(0.0)
    ref_vg = jax.jit(jax.value_and_grad(ref_obj))
    sh_vg = jax.jit(jax.value_and_grad(sharded_obj))

    v0, g0 = ref_vg(verts, ts0)
    v1, g1 = sh_vg(verts, ts0)
    jax.block_until_ready((v0, v1))
    dv = abs(float(v1) - float(v0)) / abs(float(v0))
    dg = float(jnp.max(jnp.abs(g1 - g0)) / jnp.max(jnp.abs(g0)))
    print(f"misfit   single={float(v0):.10e}  sharded={float(v1):.10e}  "
          f"rel diff {dv:.2e}")
    print(f"gradient max rel diff {dg:.2e}")
    # f32 production dtype: the psum/all_gather reduction order differs
    # from the single-device sum, so agreement is at f32 round-off
    # (~1e-7); exact 1e-12 parity is proven in x64 by
    # tests/test_parallel.py::TestGridSharded.
    assert dv < 1e-6 and dg < 1e-5

    # NOTE: on this VIRTUAL mesh all 8 "devices" share the same CPU cores,
    # so the sharded program cannot be faster than the (already
    # multi-threaded) single-device run — the timing below only shows the
    # sharded program executes; real speedup needs real chips, where each
    # mesh device brings its own compute and HBM.
    for name, f in [("single-device", ref_vg), ("grid-sharded", sh_vg)]:
        f(verts, ts0)  # warm
        t0 = time.perf_counter()
        for _ in range(3):
            out = f(verts, ts0)
        jax.block_until_ready(out)
        print(f"{name:14s}: {(time.perf_counter() - t0) / 3 * 1e3:8.2f} "
              f"ms per value+grad ({nu}x{ntg} grid, {nt - 1} segments, "
              f"virtual shared-core mesh)")


if __name__ == "__main__":
    main()
