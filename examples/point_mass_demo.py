"""Point-mass 1-D optimal transport demo (reference Point_mass_demo_Fig_5).

Computes W1 and W2 between two sets of point masses via the exact
CDF/quantile solver, shows the transport plan, the barycentric path, and
cross-validates against the numerical-integration and LP oracles.

Run: python examples/point_mass_demo.py [--plot]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import numpy as np

import jax
import jax.numpy as jnp


def main(plot: bool = False) -> None:
    jax.config.update("jax_enable_x64", True)
    from waveform_ot_tpu.ops import (
        make_density_1d, transport_plan_1d, wasserstein_1d,
    )
    from waveform_ot_tpu.ops.barycenter import barycenter_pointmass
    from waveform_ot_tpu.ops.validate import (
        wasserstein_linprog, wasserstein_numint,
    )

    # the exact Fig-5 configuration (Point_mass_demo_Fig_5.ipynb cells
    # 3-13): expected W1 = 4.11, W2^2 = 18.09
    fx = jnp.linspace(3.0, 14.0, 6)
    gx = jnp.linspace(7.0, 18.0, 6)
    f = jnp.array([0.2, 0.01, 0.18, 0.21, 0.2, 0.2])
    g = jnp.array([0.18, 0.07, 0.2, 0.05, 0.27, 0.23])

    w1 = float(wasserstein_1d(f, fx, g, gx, 1))
    w2 = float(wasserstein_1d(f, fx, g, gx, 2))
    print(f"W1          = {w1:.10f}   (Fig 5: 4.11)")
    print(f"W2^2        = {w2:.10f}   (Fig 5: 18.09)")

    w1n, w2n = wasserstein_numint(np.array(f), np.array(fx),
                                  np.array(g), np.array(gx))
    print(f"numint      : W1={w1n:.6f} W2^2={w2n:.6f}")
    print(f"linprog W2^2= {wasserstein_linprog(np.array(f), np.array(fx), np.array(g), np.array(gx), p=2):.10f}")

    H = transport_plan_1d(f, fx, g, gx)
    print("plan row sums == f:", np.allclose(H.sum(1), f / f.sum()))

    src = make_density_1d(f, fx)
    tgt = make_density_1d(g, gx)
    pos, mass = barycenter_pointmass(src, tgt, jnp.linspace(0, 1, 5))
    print("barycenter path shape:", pos.shape)

    if plot:
        from waveform_ot_tpu import viz

        viz.plot_wasser_panels(src, tgt, filename="pointmass_panels.png")
        viz.plot_transport_plan(H, filename="pointmass_plan.png")
        print("wrote pointmass_panels.png, pointmass_plan.png")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--plot", action="store_true")
    main(**vars(ap.parse_args()))
