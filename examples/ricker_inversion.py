"""Double-Ricker 3-parameter inversion (reference Ricker_Figs_3_8).

Fits (t0, amplitude, frequency) by L-BFGS-B on the weighted marginal-W2
misfit, with gradients from one jax.value_and_grad through the whole
fingerprint->marginal->OT pipeline. Recovers mtrue = [0, 1.6, 1].

Run: python examples/ricker_inversion.py [--device] [--plot]
  --device: use the fully on-device optax LBFGS instead of scipy.
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import numpy as np

import jax
import jax.numpy as jnp


def main(device: bool = False, plot: bool = False) -> None:
    from waveform_ot_tpu.inversion import (
        InversionTrace, TraceConfig, build_target, make_ricker_problem,
        minimize_lbfgs, minimize_scipy, ricker_value_and_grad,
    )
    from waveform_ot_tpu.inversion.pipeline import grid6_to_window
    from waveform_ot_tpu.models import ricker_wavelet

    mtrue = np.array([0.0, 1.6, 1.0])
    trange = (-2.0, 7.0)
    tobs, wobs = ricker_wavelet(*mtrue, trange=trange)
    rng = np.random.default_rng(42)
    wobs = wobs + 0.005 * float(jnp.max(jnp.abs(wobs))) * jnp.asarray(
        rng.standard_normal(wobs.shape), wobs.dtype)

    grid6 = (-2.0, 7.0, -2.0, 2.6, 80, 512)
    win, spec = grid6_to_window(grid6)
    cfg = TraceConfig(nu=80, ntg=512, lambdav=0.03, q=None, p=2,
                      transform=True)
    targets = build_target(tobs, wobs, win, cfg)
    prob, _ = make_ricker_problem(targets, grid6, trange=trange, alpha=0.5,
                                  lambdav=0.03)

    m0 = jnp.array([0.7, 1.1, 1.3])
    print("start:", np.asarray(m0), " true:", mtrue)

    if device:
        fn = lambda m: ricker_value_and_grad(m, prob, cfg)[0]
        res = jax.jit(lambda x0: minimize_lbfgs(fn, x0, max_iter=100))(m0)
        sol = np.asarray(res.x)
        print(f"on-device LBFGS: {int(res.n_iter)} iters, "
              f"final w2={float(res.fun):.3e}")
    else:
        trace = InversionTrace()
        vg = trace.wrap_objective(
            lambda m: ricker_value_and_grad(m, prob, cfg))
        res = minimize_scipy(vg, m0, callback=trace.scipy_callback(),
                             jit_objective=False)
        sol = res.x
        print(f"scipy L-BFGS-B: {res.nit} iters, {res.nfev} evals, "
              f"final w2={res.fun:.3e}")
        if plot:
            from waveform_ot_tpu import viz

            viz.plot_misfit_trace(trace.misfits,
                                  filename="ricker_convergence.png")
            print("wrote ricker_convergence.png")

    print("recovered:", sol)
    err = np.abs(sol - mtrue)
    print("abs error:", err)
    assert err.max() < 0.05, "inversion failed to recover the truth"
    print("OK")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", action="store_true")
    ap.add_argument("--plot", action="store_true")
    main(**vars(ap.parse_args()))
