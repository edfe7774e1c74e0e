"""Benchmark: batched W2 misfit + gradient, 64 stations x 3 components.

The BASELINE.md metric: wall-clock for one full objective evaluation
(misfit + gradient w.r.t. source parameters) over 192 traces at the
loc/CMT configuration (61-sample traces, 79x61 fingerprint grids,
lambda=0.04, W2 marginals) on one TPU chip, vs the measured single-core
reference timing (bench_baseline.json, captured from the actual reference
library: per-trace Python loops over waveformFP + calcpdf(deriv=True) +
MargWasserstein + PDFderiv chain — 3.059 s/call on this host's CPU).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from waveform_ot_tpu.inversion import InvOptions, loc_cmt_value_and_grad

    from __graft_entry__ import _build_problem

    on_tpu = jax.default_backend() == "tpu"
    impl = "auto" if on_tpu else "jnp"
    loc, cfg, prob = _build_problem(nr=64, impl=impl, dtype=jnp.float32)
    opts = InvOptions(loc=True, cmt=False, mistype="OT")
    m = loc + jnp.asarray([4.0, -3.0, 2.0], jnp.float32)

    fn = jax.jit(lambda mm, pp: loc_cmt_value_and_grad(mm, pp, opts, cfg,
                                                       impl=impl))
    v, g = fn(m, prob)
    jax.block_until_ready((v, g))  # compile + warm
    assert np.isfinite(float(v)) and np.all(np.isfinite(np.asarray(g)))

    n_iter = 50 if on_tpu else 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        v, g = fn(m, prob)
    jax.block_until_ready((v, g))
    per_call = (time.perf_counter() - t0) / n_iter

    baseline_path = Path(__file__).parent / "bench_baseline.json"
    ref_s = json.loads(baseline_path.read_text())["ref_batch_64x3_s"]

    print(json.dumps({
        "metric": "batched W2 misfit+grad, 64 stations x 3 comps",
        "value": round(per_call * 1e3, 4),
        "unit": "ms",
        "vs_baseline": round(ref_s / per_call, 2),
    }))


if __name__ == "__main__":
    main()
