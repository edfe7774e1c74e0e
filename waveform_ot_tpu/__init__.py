"""waveform-ot-tpu: TPU-native optimal-transport waveform misfits in JAX.

A from-scratch, TPU-first rebuild of the capabilities of
msambridge/waveform-ot (Sambridge, Jackson & Valentine, GJI 2022):
Wasserstein (W1/W2) misfits between 1-D oscillatory time series via 2-D
time-amplitude "fingerprint" densities, with end-to-end analytic gradients
for waveform inversion.

Design (see SURVEY.md section 7):
  * functional core - every reference class (``OTpdf``, ``waveformFP``)
    becomes an immutable pytree produced by pure functions;
  * the reference's hand-written chain rule collapses into ``jax.grad`` of
    a pure forward pipeline, with ``jax.custom_vjp`` rules on the two hot
    kernels (polyline distance field, CDF-merge 1-D Wasserstein) that
    encode the reference's tie-breaking / clipping conventions exactly;
  * batching over (station, component) via ``jax.vmap``; multi-chip via
    ``jax.sharding.Mesh`` + ``shard_map`` (see ``waveform_ot_tpu.parallel``);
  * the fingerprint distance field is a Pallas TPU kernel
    (``waveform_ot_tpu.ops.pallas_distance``).

Layer map (mirrors reference layers, reference files cited per module):
  ops/        L2 numerics: 1-D OT solver, marginals, sliced/sinkhorn,
              fingerprints, transforms     (OTlib.py, FingerprintLib.py)
  models/     forward models: Ricker, GP noise, synthetic seismograms,
              pyprop8 host bridge          (ricker_util.py, loc_cmt_util.py)
  inversion/  objectives, windows, LBFGS, traces  (…_util.py, …_opt.py)
  parallel/   mesh/sharding utilities      (absent in reference; SURVEY 2.5)
  native/     C++ validation solvers: exact EMD, fast marching
              (replaces the optional POT / scikit-fmm native wheels)
  utils/      config, IO/checkpointing, profiling
"""

__version__ = "0.1.0"

from waveform_ot_tpu import ops, models, inversion, parallel, utils  # noqa: F401
