"""Layered-medium seismogram forward: validation chain.

The layered f-k forward (models/layered.py) replaces the reference's
pyprop8 propagator (loc_cmt_util.py:28-58). Its correctness chain:

  scipy Bessel  ==  bessel_j0123                      (values + JVP)
  synthetic_seismograms  ~far-field~  wholespace oracle
  wholespace oracle  ==  layered(uniform, no free surface)   [quadrature tol]
  layered(half-space)  ==  layered(half-space split into N)  [machine eps]
  d(seis)/d(x,y,z)  ==  central differences
  seis linear in M                                     [machine eps]
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveform_ot_tpu.models import layered as L
from waveform_ot_tpu.models.seismo import StationSet, synthetic_seismograms

STATIONS = StationSet(x=jnp.array([30.0, -20.0, 5.0]),
                      y=jnp.array([10.0, 25.0, -40.0]))
M_GEN = jnp.array([[0.3, 0.5, 1.0],
                   [0.5, -0.2, 0.7],
                   [1.0, 0.7, -0.1]])
KW = dict(nk=1024, kmax=2.5, stf=("clp_step", 0.05, 0.2))


class TestBessel:
    def test_values_vs_scipy(self):
        from scipy.special import jv

        x = jnp.asarray(np.linspace(0.0, 120.0, 1201))
        ours = np.asarray(L.bessel_j0123(x))
        for m in range(4):
            np.testing.assert_allclose(ours[m], jv(m, np.asarray(x)),
                                       atol=5e-11)

    def test_values_vs_scipy_f32(self):
        """float32 path: the dtype-tuned crossover (8.0) keeps the series'
        cancellation inside f32 headroom — ~7e-6 absolute worst-case
        (the f64-tuned crossover at 14.0 cost ~2e-3 near x~14)."""
        from scipy.special import jv

        x64 = np.linspace(0.0, 1500.0, 15001)
        ours = np.asarray(L.bessel_j0123(jnp.asarray(x64, jnp.float32)))
        assert ours.dtype == np.float32
        for m in range(4):
            np.testing.assert_allclose(ours[m], jv(m, x64), atol=2e-5)

    def test_jvp_recurrence(self):
        from scipy.special import jvp as scipy_jvp

        x = jnp.asarray(np.linspace(0.1, 60.0, 301))
        # jacfwd of the x-summed values recovers the elementwise J'_m(x_i)
        jac = jax.jacfwd(lambda t: L.bessel_j0123(t).sum(-1))(x)
        for m in range(4):
            np.testing.assert_allclose(np.asarray(jac)[m],
                                       scipy_jvp(m, np.asarray(x)),
                                       atol=5e-11)


class TestWholespaceOracle:
    def test_far_field_matches_synthetic(self):
        """The oracle's far field reproduces synthetic_seismograms
        (models/seismo.py) — same conventions. The residual is the genuine
        near/intermediate-field term: O(lambda/r) ~ 3% at fc=0.3 Hz,
        r ~ 600 km, and halves when r doubles (verified); dt=0.5 keeps the
        Gaussian spectrum below Nyquist."""
        st = StationSet(x=jnp.array([500.0, -350.0]),
                        y=jnp.array([300.0, 450.0]))
        kw = dict(nt=320, dt=0.5, t0=75.0)
        t1, u1 = synthetic_seismograms(1.0, 1.0, 12.0, M_GEN, st, fc=0.3,
                                       **kw)
        t2, u2 = L.wholespace_seismograms(1.0, 1.0, 12.0, M_GEN, st,
                                          stf=("gauss", 0.3),
                                          alpha_damp=0.01, **kw)
        scale = float(jnp.max(jnp.abs(u1)))
        assert float(jnp.max(jnp.abs(u1 - u2))) / scale < 0.04


class TestWholespaceParity:
    """layered(uniform model, free_surface=False) == analytic whole-space
    oracle, per azimuthal channel and for a generic moment tensor."""

    CASES = {
        "m0": jnp.eye(3),                                    # a0 + a0z
        "m1": jnp.array([[0.0, 0.0, 1.0],
                         [0.0, 0.0, 0.5],
                         [1.0, 0.5, 0.0]]),                  # Mxz + Myz
        "m2": jnp.array([[1.0, 0.7, 0.0],
                         [0.7, -1.0, 0.0],
                         [0.0, 0.0, 0.0]]),                  # (Mxx-Myy), Mxy
        "generic": M_GEN,
    }

    @pytest.mark.parametrize("name", list(CASES))
    def test_channel(self, name):
        m = self.CASES[name]
        _, uo = L.wholespace_seismograms(1.0, 1.0, 20.0, m, STATIONS,
                                         stf=("gauss", 0.08))
        _, ul = L.layered_seismograms(1.0, 1.0, 20.0, m, STATIONS,
                                      model=L.uniform_model(),
                                      free_surface=False,
                                      stf=("gauss", 0.08), nk=1024, kmax=2.5)
        err = float(jnp.max(jnp.abs(ul - uo)) / jnp.max(jnp.abs(uo)))
        assert err < 5e-4, f"channel {name}: {err}"


class TestLayeredInvariants:
    def test_layer_splitting(self):
        """Splitting a half-space into identical welded layers is a no-op
        — validates interface R/T, phase composition, and the masked
        source-layer selection (source in layer 2 of the split)."""
        _, u1 = L.layered_seismograms(1.0, 1.0, 17.0, M_GEN, STATIONS,
                                      model=L.uniform_model(nlayers=1), **KW)
        _, u4 = L.layered_seismograms(1.0, 1.0, 17.0, M_GEN, STATIONS,
                                      model=L.uniform_model(nlayers=4,
                                                            thickness=6.0),
                                      **KW)
        assert float(jnp.max(jnp.abs(u1 - u4)) /
                     jnp.max(jnp.abs(u1))) < 1e-10

    def test_moment_linearity(self):
        _, ua = L.layered_seismograms(1.0, 1.0, 17.0, 2.5 * M_GEN, STATIONS,
                                      model=L.fukuoka_model(), **KW)
        _, ub = L.layered_seismograms(1.0, 1.0, 17.0, M_GEN, STATIONS,
                                      model=L.fukuoka_model(), **KW)
        assert float(jnp.max(jnp.abs(ua - 2.5 * ub)) /
                     jnp.max(jnp.abs(ua))) < 1e-10

    def test_free_surface_amplifies(self):
        """Free-surface receivers see roughly doubled motion vs buried
        whole-space receivers (receiver-function factor ~2) — catches a
        wrong-sign R_F, which cancels instead."""
        _, ufs = L.layered_seismograms(1.0, 1.0, 15.0, M_GEN, STATIONS,
                                       model=L.uniform_model(),
                                       free_surface=True, **KW)
        _, uws = L.layered_seismograms(1.0, 1.0, 15.0, M_GEN, STATIONS,
                                       model=L.uniform_model(),
                                       free_surface=False, **KW)
        ratio = float(jnp.max(jnp.abs(ufs)) / jnp.max(jnp.abs(uws)))
        assert 1.4 < ratio < 4.0


class TestLayeredGradients:
    @pytest.fixture(scope="class")
    def fj(self):
        mod = L.fukuoka_model()

        def f(p, m6):
            from waveform_ot_tpu.models.seismo import mxyz_from_upper
            _, u = L.layered_seismograms(p[0], p[1], p[2],
                                         mxyz_from_upper(m6), STATIONS,
                                         model=mod, nk=512, kmax=2.0,
                                         stf=("clp_step", 0.05, 0.2))
            return jnp.sum(u * u) * 1e9

        return jax.jit(f), jax.jit(jax.grad(f, argnums=(0, 1)))

    def test_fd_xyz_and_m(self, fj):
        f, g = fj
        p0 = jnp.array([1.0, 1.0, 17.0])
        m6 = jnp.array([0.3, 0.5, 1.0, -0.2, 0.7, -0.1])
        gp, gm = g(p0, m6)
        eps = 1e-5
        for i in range(3):
            fd = (f(p0.at[i].add(eps), m6) - f(p0.at[i].add(-eps), m6)) / (2 * eps)
            assert abs(float(gp[i] - fd)) / max(abs(float(fd)), 1e-12) < 1e-3, \
                f"xyz[{i}]: ad={float(gp[i])} fd={float(fd)}"
        for i in range(6):
            fd = (f(p0, m6.at[i].add(eps)) - f(p0, m6.at[i].add(-eps))) / (2 * eps)
            assert abs(float(gm[i] - fd)) / max(abs(float(fd)), 1e-12) < 1e-6, \
                f"m6[{i}]: ad={float(gm[i])} fd={float(fd)}"

    def test_depth_grad_across_layers(self, fj):
        """d/dz is finite and FD-consistent with the source in different
        layers of the Fukuoka model (masked-stack machinery). Richardson-
        extrapolated central differences; the shallow source gets a loose
        tolerance because the misfit there carries ~1e-5 relative rounding
        noise (large cancelling free-surface reverberation terms at high k)
        that FD amplifies — at z >= 3.5 AD matches to <=3e-4 and at
        z >= 10 to ~1e-7, which bounds the AD construction itself."""
        f, g = fj
        m6 = jnp.array([0.3, 0.5, 1.0, -0.2, 0.7, -0.1])
        tols = {1.2: 5e-2, 3.5: 3e-3, 10.0: 1e-4, 25.0: 1e-4}
        for z, tol in tols.items():           # layers 1, 2, 3, 4
            p0 = jnp.array([1.0, 1.0, z])
            (gp, _) = g(p0, m6)
            assert jnp.isfinite(gp[2])

            def fd(eps):
                return float((f(p0.at[2].add(eps), m6)
                              - f(p0.at[2].add(-eps), m6)) / (2 * eps))

            rich = (9.0 * fd(1e-3) - fd(3e-3)) / 8.0
            assert abs(float(gp[2]) - rich) / max(abs(rich), 1e-9) < tol, \
                f"z={z}: ad={float(gp[2])} fd={rich}"


class TestFukuokaForward:
    def test_smoke_and_vmap(self):
        """The Figs 9-11 configuration: 11 stations, 6-layer model — runs
        under jit and vmaps over source candidates."""
        st = StationSet(
            x=jnp.array([10., 30., 50., -15., 8., 25., -25., 55., 80., 75., -70.]),
            y=jnp.array([-75., -77., -70., -50., -46., -42., -25., -26., -23., -5., 30.]))
        mod = L.fukuoka_model()

        @jax.jit
        def fwd(p):
            return L.layered_seismograms(p[0], p[1], p[2], M_GEN, st,
                                         model=mod, nk=512, kmax=2.0)[1]

        u = fwd(jnp.array([1.0, 1.0, 20.0]))
        assert u.shape == (11, 3, 61)
        assert bool(jnp.all(jnp.isfinite(u))) and float(jnp.max(jnp.abs(u))) > 0
        us = jax.vmap(fwd)(jnp.array([[1.0, 1.0, 20.0], [5.0, -3.0, 10.0]]))
        assert us.shape == (2, 11, 3, 61)
        np.testing.assert_allclose(np.asarray(us[0]), np.asarray(u),
                                   rtol=1e-11)


class TestMixedPrecisionStack:
    """float32 inputs run the stack algebra entirely on double-float32
    pairs (the TPU production path — no f64 in the program at all); the
    result must track the float64 oracle to the dd error budget.

    Measured on the Fukuoka config (nk=512): end-to-end ~2e-5 of peak
    eager on CPU and 5.6e-6 on the TPU chip — dominated by the f32
    Bessel assembly, with the dd stack contributing ~1e-4 relative only
    at the degenerate omega=0 lane. (An earlier revision split the band
    at hp_below=0.4 with a plain-f32 stack above and sat at ~1.3e-2 of
    peak, blamed on the quadrature; the true causes were the omega=0
    extrapolation workaround and XLA fusion breaking the compiled dd
    compensation — see ops/ddfloat._seal. The split mode is kept as an
    explicit hp_below option and is both slower and less accurate.)
    The tolerances below leave ~50x margin over the measured floor."""

    ST32 = StationSet(x=jnp.asarray([10., 30., -15., 55.], jnp.float32),
                      y=jnp.asarray([-75., -77., -50., -26.], jnp.float32))

    def _run(self, dtype, **kw_extra):
        mod = L.fukuoka_model()
        st = StationSet(x=self.ST32.x.astype(dtype),
                        y=self.ST32.y.astype(dtype))
        args = (jnp.asarray(2.0, dtype), jnp.asarray(-1.5, dtype),
                jnp.asarray(12.0, dtype), M_GEN.astype(dtype), st)
        kw = dict(model=mod, nt=61, dt=1.0, nk=512, kmax=2.5)
        kw.update(kw_extra)
        return np.asarray(L.layered_seismograms(*args, **kw)[1], np.float64)

    def test_f32_dd_path_matches_f64_oracle(self):
        s32 = self._run(jnp.float32)
        s64 = self._run(jnp.float64)
        assert np.isfinite(s32).all()
        assert np.abs(s32 - s64).max() <= 1e-3 * np.abs(s64).max()

    def test_all_dd_stack_matches_f64_oracle(self):
        """hp_below=inf (also the default) runs EVERY lane's stack
        algebra on dd32 — spelled out explicitly here so the contract
        survives any future default change."""
        import math

        s_dd = self._run(jnp.float32, hp_below=math.inf)
        s64 = self._run(jnp.float64)
        assert np.isfinite(s_dd).all()
        assert np.abs(s_dd - s64).max() <= 1e-3 * np.abs(s64).max()

    def test_f64_inputs_keep_full_f64_stack(self):
        """float64 inputs default to the all-f64 parity path: explicitly
        forcing a huge band threshold must be a no-op."""
        st = StationSet(x=jnp.asarray([10., -15.]), y=jnp.asarray([-75., 30.]))
        mod = L.fukuoka_model()
        args = (2.0, -1.5, 12.0, M_GEN, st)
        kw = dict(model=mod, nt=33, dt=1.0, nk=128, kmax=1.5)
        _, s_default = L.layered_seismograms(*args, **kw)
        _, s_forced = L.layered_seismograms(*args, hp_below=1e9, **kw)
        np.testing.assert_allclose(np.asarray(s_default),
                                   np.asarray(s_forced), rtol=0, atol=0)

    def test_mixed_gradient_finite_and_consistent(self):
        """The f32-path gradient is the EXACT gradient of the (noisy-at-
        the-quadrature-floor) f32 objective, not of the f64 one, so
        elementwise comparison against the f64 gradient is the wrong
        contract — where the objective differs by ~1e-2 relative, so do
        the gradients. What optimization needs is that the f32 gradient
        is finite and points the same way: assert direction cosine and
        magnitude agreement against the f64 oracle gradient."""
        st = StationSet(x=jnp.asarray([10., 30.], jnp.float32),
                        y=jnp.asarray([-75., -50.], jnp.float32))
        # a three-layer crust: the mixed-precision contract is
        # model-agnostic and the full Fukuoka stack doubles the eager
        # scan cost. Production gradient path (structured VJP) — its
        # equality with plain AD is pinned separately by
        # TestStructuredVJP::test_matches_plain_autodiff; reverse-mode
        # through the raw dd scans here cost ~900 s of suite time.
        mod = L.layered_model_from_table([(2.0, 5.15, 2.85, 2.5),
                                          (16.0, 6.0, 3.46, 2.7),
                                          (0.0, 7.7, 4.3, 3.3)])
        fwd = L.make_layered_forward(model=mod, nt=33, dt=1.0, nk=64,
                                     kmax=1.5)

        def f(p, dtype):
            s = fwd(p[0], p[1], p[2], M_GEN.astype(dtype),
                    StationSet(x=st.x.astype(dtype), y=st.y.astype(dtype)))
            return jnp.sum(s * s)

        g32 = np.asarray(jax.grad(lambda p: f(p, jnp.float32))(
            jnp.asarray([2.0, -1.5, 12.0], jnp.float32)), np.float64)
        g64 = np.asarray(jax.grad(lambda p: f(p, jnp.float64))(
            jnp.asarray([2.0, -1.5, 12.0], jnp.float64)))
        assert np.isfinite(g32).all()
        cos = g32 @ g64 / (np.linalg.norm(g32) * np.linalg.norm(g64))
        assert cos > 0.97, f"gradient direction cosine {cos}"
        ratio = np.linalg.norm(g32) / np.linalg.norm(g64)
        assert 0.5 < ratio < 2.0, f"gradient magnitude ratio {ratio}"


class TestStructuredVJP:
    """make_layered_forward's default custom VJP (reverse only through the
    cheap response/assembly stage; z by forward-mode through the operator
    stage) must agree with plain autodiff through the whole synthesis."""

    def _grads(self, structured):
        st = StationSet(x=jnp.asarray([10., 30., -15.]),
                        y=jnp.asarray([-75., -50., 30.]))
        fwd = L.make_layered_forward(st, model=L.fukuoka_model(), nt=33,
                                     dt=1.0, nk=128, kmax=1.5,
                                     structured_vjp=structured)
        w = jnp.cos(0.01 * jnp.arange(3 * 3 * 33, dtype=jnp.float64)
                    ).reshape(3, 3, 33)

        def loss(p, mm):
            return jnp.sum(fwd(p[0], p[1], p[2], mm) * w)

        p0 = jnp.asarray([2.0, -1.5, 12.0])
        v, (gp, gm) = jax.value_and_grad(loss, argnums=(0, 1))(p0, M_GEN)
        return v, gp, gm

    def test_matches_plain_autodiff(self):
        v_s, gp_s, gm_s = self._grads(True)
        v_p, gp_p, gm_p = self._grads(False)
        np.testing.assert_allclose(float(v_s), float(v_p), rtol=0, atol=0)
        # rtol alone is too strict for a gradient component that is ~500x
        # smaller than the others (roundoff-level abs difference): anchor
        # the atol to the gradient scale
        gp_scale = float(np.max(np.abs(gp_p)))
        np.testing.assert_allclose(np.asarray(gp_s), np.asarray(gp_p),
                                   rtol=1e-6, atol=1e-8 * gp_scale)
        np.testing.assert_allclose(np.asarray(gm_s), np.asarray(gm_p),
                                   rtol=1e-10)

    def test_vmappable(self):
        st = StationSet(x=jnp.asarray([10., -15.]),
                        y=jnp.asarray([-75., 30.]))
        fwd = L.make_layered_forward(st, model=L.fukuoka_model(), nt=33,
                                     dt=1.0, nk=96, kmax=1.2)

        def loss(p):
            s = fwd(p[0], p[1], p[2], M_GEN)
            return jnp.sum(s * s)

        ps = jnp.asarray([[2.0, -1.5, 12.0], [1.0, 3.0, 8.0]])
        v, g = jax.vmap(jax.value_and_grad(loss))(ps)
        assert np.isfinite(np.asarray(v)).all()
        assert np.isfinite(np.asarray(g)).all()
        v0, g0 = jax.value_and_grad(loss)(ps[0])
        np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g0),
                                   rtol=1e-9)


class TestCompiledCpuDDWarning:
    """The one configuration with a known accuracy hazard — the f32 dd
    stack JITTED on CPU (XLA CPU strips the seal barriers; ~1e-4 residue
    at the omega=0 lane) — must warn at the public API; eager CPU (the
    clean path) must not."""

    def _run(self):
        model = L.uniform_model(nlayers=1, dtype=jnp.float32)
        st = StationSet(x=jnp.asarray([5.0], jnp.float32),
                        y=jnp.asarray([3.0], jnp.float32))
        return L.layered_seismograms(
            jnp.float32(1.0), jnp.float32(0.0), jnp.float32(2.0),
            jnp.eye(3, dtype=jnp.float32), st, model=model, nt=8, dt=1.0,
            nk=8, kmax=1.0)[1]

    def test_cpu_jit_f32_warns_eager_does_not(self, monkeypatch):
        import warnings

        assert jax.default_backend() == "cpu"
        monkeypatch.setattr(L, "_warned_compiled_cpu_dd", False)
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            # concrete (non-Tracer) argument = the eager path: no warning
            L._warn_if_compiled_cpu_dd(jnp.float32(1.0))
        assert not [w for w in rec if "omega=0" in str(w.message)]
        monkeypatch.setattr(L, "_warned_compiled_cpu_dd", False)
        # the guard fires at TRACE time (x is a Tracer), so eval_shape —
        # which traces without compiling or running — is the cheap probe
        with pytest.warns(UserWarning, match="omega=0"):
            jax.eval_shape(self._run)

    def test_f64_inputs_do_not_warn_under_jit(self, monkeypatch):
        monkeypatch.setattr(L, "_warned_compiled_cpu_dd", False)
        import warnings

        model = L.uniform_model(nlayers=1, dtype=jnp.float64)
        st = StationSet(x=jnp.asarray([5.0], jnp.float64),
                        y=jnp.asarray([3.0], jnp.float64))
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            jax.eval_shape(lambda: L.layered_seismograms(
                jnp.float64(1.0), jnp.float64(0.0), jnp.float64(2.0),
                jnp.eye(3, dtype=jnp.float64), st, model=model, nt=8,
                dt=1.0, nk=8, kmax=1.0)[1])
        assert not [w for w in rec if "omega=0" in str(w.message)]
