"""Throughput scaling study on one TPU chip.

Measures the batched W2 misfit+gradient objective at increasing station
counts, and complete on-device multi-start inversions (vmapped LBFGS) —
the production-deployment numbers behind README.md's performance table.

Run: python examples/scaling_study.py [--quick]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import numpy as np

import jax
import jax.numpy as jnp


def main(quick: bool = False) -> None:
    from __graft_entry__ import _build_problem
    from waveform_ot_tpu.inversion import (
        InvOptions, loc_cmt_misfit, loc_cmt_value_and_grad,
        minimize_multi_start,
    )
    from waveform_ot_tpu.utils.profiling import benchmark

    impl = "auto" if jax.default_backend() == "tpu" else "jnp"
    opts = InvOptions(loc=True, cmt=False, mistype="OT")

    print(f"backend: {jax.default_backend()}  impl: {impl}\n")
    print("batched W2 misfit + gradient (61-sample traces, 79x61 grids):")
    sizes = [64, 256] if quick else [64, 256, 1024]
    for nr in sizes:
        loc, cfg, prob = _build_problem(nr=nr, impl=impl,
                                        dtype=jnp.float32)
        m = loc + jnp.asarray([4.0, -3.0, 2.0], jnp.float32)
        fn = jax.jit(lambda mm, pp: loc_cmt_value_and_grad(
            mm, pp, opts, cfg, impl=impl))
        dt = benchmark(fn, m, prob, n_iter=30)
        ntr = nr * 3
        print(f"  {nr:5d} stations ({ntr:5d} traces): "
              f"{dt*1e3:8.3f} ms/call  = {ntr/dt:10.0f} traces/s")

    # on-device LBFGS uses the XLA-scan fingerprint: deeply nested
    # vmap(while(pallas)) programs can fault this runtime's Mosaic path,
    # and f32 misfits (~1e-3) warrant a realistic grad tolerance
    print("\ncomplete on-device inversions (vmapped LBFGS, 50 iters max):")
    loc, cfg, prob = _build_problem(nr=16, impl="xla", dtype=jnp.float32)
    fn = lambda m: loc_cmt_misfit(m, prob, opts, cfg, impl="xla")
    for k in ([16] if quick else [16, 32]):
        rng = np.random.default_rng(0)
        starts = jnp.asarray(
            np.asarray(loc)[None, :]
            + 20.0 * rng.standard_normal((k, 3)), jnp.float32)
        run = jax.jit(lambda xs: minimize_multi_start(fn, xs, max_iter=50,
                                                      tol=1e-6))
        try:
            res = run(starts)
            jax.block_until_ready(res.x)
            t0 = time.perf_counter()
            res = run(starts)
            jax.block_until_ready(res.x)
            dt = time.perf_counter() - t0
        except Exception as e:  # very large vmapped-while programs can
            # exhaust this runtime; report rather than abort the study
            print(f"  {k:3d} simultaneous inversions: runtime limit "
                  f"({type(e).__name__})")
            continue
        err = np.linalg.norm(np.asarray(res.x) - np.asarray(loc), axis=1)
        print(f"  {k:3d} simultaneous inversions: {dt:7.2f} s "
              f"({dt/k*1e3:7.1f} ms/inversion), "
              f"{np.mean(err < 2.0)*100:3.0f}% converged, "
              f"median iters {int(np.median(np.asarray(res.n_iter)))}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    main(**vars(ap.parse_args()))
