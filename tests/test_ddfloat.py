"""Double-float32 arithmetic (ops/ddfloat.py) vs the float64 oracle.

The DD path IS the TPU production path for the layered stack algebra's
low-frequency band (models/layered.py), so its precision contract
(~1.8e-15 relative per arithmetic op, ~1e-13 transcendentals) is
load-bearing: these tests pin it on CPU, and tests/test_tpu_x64.py adds
an on-hardware spot check (XLA rewrites that broke the error-free
transformations — FMA contraction, reassociation — would be invisible
from CPU otherwise).
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from waveform_ot_tpu.ops import ddfloat as dd


def _rand(rng, n, lo=-4.0, hi=4.0):
    """float64 values with mantissas exercising both words."""
    return 10.0 ** rng.uniform(lo, hi, n) * np.where(
        rng.random(n) < 0.5, -1.0, 1.0) * (1.0 + rng.random(n))


def _to64(d):
    return np.asarray(d.hi, np.float64) + np.asarray(d.lo, np.float64)


def _rel(a, b):
    return np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-300))


class TestArithmetic:
    def setup_method(self, _):
        rng = np.random.default_rng(7)
        self.a64 = _rand(rng, 512)
        self.b64 = _rand(rng, 512)
        self.a = dd.from_float64(self.a64)
        self.b = dd.from_float64(self.b64)

    def test_split_is_exact(self):
        # f64 -> (f32, f32) keeps 48 bits: rel err <= 2^-48
        assert _rel(_to64(self.a), self.a64) < 2.0 ** -47

    def test_add_sub_mul_div(self):
        # reference from the ACTUAL split inputs (comparing against the
        # pre-split f64 values would charge the 2^-48 representation error
        # to the op, which cancellation amplifies unboundedly)
        av, bv = _to64(self.a), _to64(self.b)
        for op, ref in (("add", av + bv), ("sub", av - bv),
                        ("mul", av * bv), ("truediv", av / bv)):
            got = _to64(getattr(self.a, f"__{op}__")(self.b))
            denom = {"add": np.abs(av) + np.abs(bv),
                     "sub": np.abs(av) + np.abs(bv),
                     "mul": np.abs(ref), "truediv": np.abs(ref)}[op]
            err = np.max(np.abs(got - ref) / denom)
            assert err < 1e-14, op

    def test_catastrophic_cancellation(self):
        # (a + eps) - a recovers eps to dd precision — the property plain
        # f32 loses entirely and the layered DC-lane algebra relies on
        eps = 3e-7 * np.abs(self.a64)
        s = self.a + dd.from_float64(eps)
        diff = _to64(s - self.a)
        assert _rel(diff, eps) < 1e-6  # eps itself ~2^-22 of a: 27 bits left

    def test_mixed_operands(self):
        got = _to64(2.0 * self.a + np.float32(1.5) - self.a / 4.0)
        hi32 = np.asarray(self.a.hi, np.float64)  # noqa: F841
        ref = 2.0 * _to64(self.a) + 1.5 - _to64(self.a) / 4.0
        assert _rel(got, ref) < 1e-13

    def test_comparisons(self):
        m = self.a > self.b
        np.testing.assert_array_equal(np.asarray(m), _to64(self.a)
                                      > _to64(self.b))
        # second-word ties: a vs a + tiny
        tiny = dd.DD(self.a.hi, self.a.lo + np.float32(1e-30))
        assert bool(np.all(np.asarray(tiny > self.a)
                           == (np.asarray(self.a.lo) + 1e-30
                               > np.asarray(self.a.lo))))

    def test_where_stack_take(self):
        m = self.a64 > 0
        w = dd.where(jnp.asarray(m), self.a, self.b)
        np.testing.assert_allclose(_to64(w), np.where(m, _to64(self.a),
                                                      _to64(self.b)))
        st = dd.stack([self.a, self.b])
        assert st.shape == (2, 512)
        tk = dd.take(st, jnp.asarray([1, 0]), axis=0)
        np.testing.assert_allclose(_to64(tk)[0], _to64(self.b))

    def test_astype_collapse(self):
        f32 = self.a.astype(jnp.float32)
        assert _rel(np.asarray(f32, np.float64), self.a64) < 1e-7
        f64 = self.a.astype(jnp.float64)
        assert _rel(np.asarray(f64), self.a64) < 2.0 ** -47


class TestTranscendentals:
    def setup_method(self, _):
        self.rng = np.random.default_rng(11)

    def test_sqrt(self):
        x64 = 10.0 ** self.rng.uniform(-8, 8, 512)
        got = _to64(dd.sqrt(dd.from_float64(x64)))
        assert _rel(got, np.sqrt(x64)) < 1e-13
        z = dd.sqrt(dd.from_float64(np.zeros(4)))
        np.testing.assert_array_equal(_to64(z), 0.0)

    def test_exp(self):
        # full dd accuracy while the result's lo word stays out of f32
        # denormals (result >= ~3e-24, i.e. x >= ~-54)
        # bound: the 2^-48 input-split error scales the result by |x| —
        # rel err <= ~|x| * 3.6e-15 (measured 1.3e-13 worst at x = -36)
        x64 = self.rng.uniform(-50.0, 1.0, 512)
        got = _to64(dd.exp(dd.from_float64(x64)))
        assert _rel(got, np.exp(x64)) < 1e-12

    def test_exp_graceful_degradation(self):
        # below the dd-precision floor the value stays f32-accurate all
        # the way down to base-dtype underflow (0, never NaN/garbage)
        x64 = self.rng.uniform(-85.0, -50.0, 256)
        got = _to64(dd.exp(dd.from_float64(x64)))
        assert _rel(got, np.exp(x64)) < 1e-6
        deep = _to64(dd.exp(dd.from_float64(np.asarray([-150.0, -500.0]))))
        np.testing.assert_array_equal(deep, 0.0)

    def test_sincos(self):
        x64 = self.rng.uniform(-300.0, 300.0, 1024)
        s, c = dd.sincos(dd.from_float64(x64))
        assert np.max(np.abs(_to64(s) - np.sin(x64))) < 1e-12
        assert np.max(np.abs(_to64(c) - np.cos(x64))) < 1e-12

    def test_hypot(self):
        a64 = _rand(self.rng, 256)
        b64 = _rand(self.rng, 256)
        got = _to64(dd.hypot(dd.from_float64(a64), dd.from_float64(b64)))
        assert _rel(got, np.hypot(a64, b64)) < 1e-13


class TestTransforms:
    """jit / vmap / grad compose with DD values."""

    def test_jit_vmap(self):
        x64 = np.linspace(0.1, 40.0, 64)

        def f(d):
            s, c = dd.sincos(d)
            return (s * s + c * c).astype(jnp.float32)

        ones = jax.jit(jax.vmap(f))(dd.from_float64(x64))
        np.testing.assert_allclose(np.asarray(ones), 1.0, atol=2e-7)

    def test_grad_matches_f64(self):
        # d/dx [exp(-x) * sin(3x) / sqrt(x)] via DD vs float64 autodiff
        def f_dd(x32):
            d = dd.DD(x32, jnp.zeros_like(x32))
            s, _ = dd.sincos(3.0 * d)
            val = dd.exp(-d) * s / dd.sqrt(d)
            return jnp.sum(val.astype(jnp.float32))

        def f_64(x):
            return jnp.sum(jnp.exp(-x) * jnp.sin(3.0 * x) / jnp.sqrt(x))

        x = np.linspace(0.3, 5.0, 16)
        g_dd = jax.grad(f_dd)(jnp.asarray(x, jnp.float32))
        g_64 = jax.grad(f_64)(jnp.asarray(x, jnp.float64))
        np.testing.assert_allclose(np.asarray(g_dd, np.float64),
                                   np.asarray(g_64), rtol=3e-6)

    def test_scan_carry(self):
        # compensated running sum of 1e5 * tiny increments: plain f32
        # stalls at ~2^24 ulp growth, DD does not
        inc = dd.from_float64(np.float64(0.1))

        def step(carry, _):
            return carry + inc, None

        n = 100_000
        out, _ = jax.lax.scan(step, dd.from_float64(np.float64(0.0)),
                              None, length=n)
        got = float(_to64(out))
        assert abs(got - 0.1 * n) / (0.1 * n) < 1e-10
        # the plain f32 control: visibly wrong (documents why DD exists)
        f32 = jax.lax.scan(lambda c, _: (c + np.float32(0.1), None),
                           jnp.float32(0.0), None, length=n)[0]
        assert abs(float(f32) - 0.1 * n) / (0.1 * n) > 1e-5
