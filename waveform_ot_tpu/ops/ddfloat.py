"""Double-word float arithmetic (``DD``): ~2x-precision numbers as
unevaluated (hi, lo) pairs of the base dtype, with error-free transforms.

Why this exists: the layered-medium f-k stack algebra
(models/layered.py) needs ~12 significant digits at its lowest
frequencies (the P-SV eigenbasis degenerates as omega -> 0), but the TPU
runtime has no native float64 — XLA *emulates* f64 there, at ~1000x the
op cost, with multi-minute compile times, and (measured on the axon v5e
runtime) miscompiles the emulation for this module's fused batched
program, producing NaN where the identical HLO is finite on CPU.
Double-float32 sidesteps all of it: every operation is a short sequence
of ordinary IEEE float32 ops (Dekker/Knuth error-free transformations,
the same algorithms as Bailey's QD / the classic double-double
libraries), giving ~49 bits of significand at float32's exponent range.
The same code path runs on every backend, so the CPU test suite
validates exactly what the TPU executes — unlike f64 emulation, whose
correctness was unobservable from CPU.

Precision contract: |error| <= O(2^-2p) relative per operation with
p = base significand bits (f32: p=24, unit ~1.8e-15; transcendentals
~1e-13 over the argument ranges documented on each function). Dynamic
range is the BASE dtype's (f32: ~1e+-38) — users must keep magnitudes
inside it (the layered stack algebra lives in [1e-8, 1e6], verified by
tests/test_layered.py's magnitude probe history).

Autodiff: every DD op is plain differentiable float code; JAX tangents
of a (hi, lo) pair represent d(hi) + d(lo) and the compensated
algorithms propagate them with the same accuracy structure as the
primal (tested against float64 autodiff).

DD is a pytree, so vmap/scan/jit/where over DD values work leaf-wise.

No reference counterpart: the reference gets float64 from numpy
(SURVEY.md section 1 L1); this is the TPU-native substrate replacing it
where the hardware has no f64.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "DD", "from_float", "from_float64", "to_float", "const",
    "zeros_like", "ones_like", "full_like", "where", "stack",
    "concatenate", "take", "broadcast_to", "sqrt", "exp", "sincos",
    "hypot", "dd_abs", "set_seal_mode",
]

# Dekker split constants (2^ceil(p/2) + 1): split a p-bit significand into
# two halves whose products are exact in the base dtype.
_SPLIT_F32 = 4097.0          # float32: p=24 -> 2^12 + 1
_SPLIT_F64 = 134217729.0     # float64: p=53 -> 2^27 + 1


_SEAL_MODE_OVERRIDE: str | None = None  # None = per-backend auto
_SEAL_GRANULARITY_OVERRIDE: str | None = None  # None = per-backend auto


def set_seal_mode(mode: str | None, granularity: str | None = None) -> None:
    """Force the seal strategy: 'stack', 'tuple', 'none', or None (auto:
    'tuple' on TPU, 'stack' elsewhere), and optionally the granularity:
    'eft' (every error-free transform seals its pair — the only safe
    choice on CPU) or 'op' (seal only at DD operation exits — each +,*,
    /,sqrt,... compiles to ONE fusion instead of 2-4, cutting the
    HBM-materialization count; TPU-validated, see BASELINE.md). Takes
    effect at TRACE time — call before building/jitting any DD program
    (already-traced programs keep the mode they were traced with).
    Exposed for the seal experiments recorded in BASELINE.md; production
    code should leave the auto selection alone."""
    global _SEAL_MODE_OVERRIDE, _SEAL_GRANULARITY_OVERRIDE
    if mode not in (None, "stack", "tuple", "none"):
        raise ValueError(f"unknown seal mode {mode!r}")
    if granularity not in (None, "eft", "op"):
        raise ValueError(f"unknown seal granularity {granularity!r}")
    _SEAL_MODE_OVERRIDE = mode
    _SEAL_GRANULARITY_OVERRIDE = granularity


def _seal_mode() -> str:
    if _SEAL_MODE_OVERRIDE is not None:
        return _SEAL_MODE_OVERRIDE
    return "tuple" if jax.default_backend() == "tpu" else "stack"


def _seal_granularity() -> str:
    if _SEAL_GRANULARITY_OVERRIDE is not None:
        return _SEAL_GRANULARITY_OVERRIDE
    # TPU: 'op' measured BIT-IDENTICAL to 'eft' on the layered flagship
    # (seismogram/grad deviations equal to every digit vs the f64 oracle)
    # at 6.2x the forward / 2.2x the value_and_grad throughput — each DD
    # op compiles to one fusion instead of 2-4, so 3-4x fewer HBM
    # materializations (BASELINE.md round-5 seal table). CPU keeps 'eft':
    # its pipeline strips barriers, and only the per-EFT stacked-tensor
    # seal protects the compensation there.
    return "op" if jax.default_backend() == "tpu" else "eft"


def _seal(hi, lo):
    """Fuse an (hi, lo) result pair into one compiler-opaque unit.

    XLA's CPU fusion emitter splits a two-output compensated kernel into
    several fusions and re-evaluates the shared subexpressions in each;
    the duplicated evaluations can round differently, which silently
    destroys the error-free invariant (measured: a single jitted DD
    multiply loses its entire compensation, ~1e-8 relative instead of
    ~2e-15, while the identical op-by-op eager program is bit-exact;
    `--xla_disable_hlo_passes=fusion` also restores bit-exactness).
    Stacking hi and lo forces ONE single-output fused kernel for the
    whole pair, and the optimization barrier keeps the following slices
    from being folded back through the stack. Every DD-producing public
    op seals its result, so compiled (jit/scan/vmap) DD programs are
    bit-identical to the eager reference on every backend.

    Backend selection (see set_seal_mode): the CPU pipeline STRIPS
    optimization barriers, so only the materialized stack protects it —
    but the stack is pure overhead on TPU, where barriers are honored
    and each stack lowers to a real layout copy (measured: ~20 ms of
    the 40 ms layered-flagship device time, BASELINE.md round-4
    profile). On TPU the pair is therefore sealed as a two-operand
    barrier with NO materialization ('tuple' mode): the barrier keeps
    (hi, lo) one fusion unit without moving any bytes. Measured
    equivalent to 'stack' on the chip (layered Fukuoka nk=512 forward
    vs the f64 CPU oracle — see BASELINE.md seal-mode table) and ~2x
    faster end-to-end. 'none' (no seal at all) corrupts on BOTH
    backends and exists only as the experiment control."""
    mode = _seal_mode()
    if mode == "tuple":
        return jax.lax.optimization_barrier((hi, lo))
    if mode == "none":
        return hi, lo
    packed = jax.lax.optimization_barrier(jnp.stack([hi, lo]))
    return packed[0], packed[1]


def _seal_eft(hi, lo):
    """Seal INSIDE an error-free transform — skipped in 'op' granularity,
    where the enclosing DD operation seals its final pair instead (one
    fusion per DD op instead of one per EFT; see set_seal_mode)."""
    if _seal_granularity() == "op":
        return hi, lo
    return _seal(hi, lo)


def _seal_result(d: "DD") -> "DD":
    """Seal at a DD operation's exit — active only in 'op' granularity."""
    if _seal_granularity() == "op":
        return DD(*_seal(d.hi, d.lo))
    return d


def _pin(x):
    """Pin a plain-float seed value to ONE evaluation (see _seal): an
    optimization barrier stops XLA from duplicating its computation into
    several fusions whose copies could be rewritten or rounded
    differently — any such inconsistency between uses breaks the
    compensated algorithms consuming the seed."""
    return jax.lax.optimization_barrier(x)


def _two_sum(a, b):
    """Knuth TwoSum: s + err == a + b exactly (any magnitudes)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return _seal_eft(s, err)


def _quick_two_sum(a, b):
    """Dekker FastTwoSum: requires |a| >= |b| (or a == 0)."""
    s = a + b
    err = b - (s - a)
    return _seal_eft(s, err)


def _two_prod(a, b):
    """Dekker TwoProd: p + err == a * b exactly (FMA-free split form).

    The split constant is chosen per base dtype — a DD over float64
    components (e.g. ``from_float(x, dtype=jnp.float64)`` on the CPU
    oracle path) keeps the error-free contract instead of silently
    running the 12-bit f32 split on 53-bit significands."""
    _SPLIT = (_SPLIT_F64 if jnp.asarray(a).dtype == jnp.float64
              else _SPLIT_F32)
    p = a * b
    t = _SPLIT * a
    ah = t - (t - a)
    al = a - ah
    t = _SPLIT * b
    bh = t - (t - b)
    bl = b - bh
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return _seal_eft(p, err)


class DD:
    """Double-word number: value == hi + lo, |lo| <~ ulp(hi)/2.

    Supports +, -, *, /, unary -, comparisons, indexing, and mixed
    operands (python scalars / jnp arrays promote to (x, 0)). Registered
    as a pytree; hi/lo may be arrays of any shape.
    """

    __slots__ = ("hi", "lo")

    def __init__(self, hi, lo=None):
        self.hi = hi
        self.lo = jnp.zeros_like(hi) if lo is None else lo

    # -- pytree ---------------------------------------------------------
    def tree_flatten(self):
        return (self.hi, self.lo), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.hi, obj.lo = children
        return obj

    # -- shape surface ----------------------------------------------------
    @property
    def shape(self):
        return jnp.shape(self.hi)

    @property
    def dtype(self):
        return jnp.asarray(self.hi).dtype

    def __getitem__(self, idx):
        return DD(self.hi[idx], self.lo[idx])

    def reshape(self, *shape):
        return DD(self.hi.reshape(*shape), self.lo.reshape(*shape))

    def astype(self, dtype):
        """Collapse to a plain array of ``dtype`` (hi + lo, summed at the
        wider of the two precisions)."""
        if jnp.dtype(dtype).itemsize > jnp.asarray(self.hi).dtype.itemsize:
            return self.hi.astype(dtype) + self.lo.astype(dtype)
        return (self.hi + self.lo).astype(dtype)

    # -- arithmetic -------------------------------------------------------
    def __add__(self, o):
        o = _promote(o, self)
        if o is NotImplemented:
            return NotImplemented
        s1, s2 = _two_sum(self.hi, o.hi)
        t1, t2 = _two_sum(self.lo, o.lo)
        s2 = s2 + t1
        s1, s2 = _quick_two_sum(s1, s2)
        s2 = s2 + t2
        return _seal_result(DD(*_quick_two_sum(s1, s2)))

    __radd__ = __add__

    def __sub__(self, o):
        o = _promote(o, self)
        if o is NotImplemented:
            return NotImplemented
        return self + (-o)

    def __rsub__(self, o):
        o = _promote(o, self)
        if o is NotImplemented:
            return NotImplemented
        return o + (-self)

    def __mul__(self, o):
        o = _promote(o, self)
        if o is NotImplemented:
            return NotImplemented
        p1, p2 = _two_prod(self.hi, o.hi)
        p2 = p2 + (self.hi * o.lo + self.lo * o.hi)
        return _seal_result(DD(*_quick_two_sum(p1, p2)))

    __rmul__ = __mul__

    def __truediv__(self, o):
        o = _promote(o, self)
        if o is NotImplemented:
            return NotImplemented
        # long division with two refinement steps (full dd accuracy);
        # quotient seeds pinned — see sqrt's _pin note
        q1 = _pin(self.hi / o.hi)
        r = self - o * q1
        q2 = _pin(r.hi / o.hi)
        r = r - o * q2
        q3 = _pin(r.hi / o.hi)
        s, e = _quick_two_sum(q1, q2)
        return DD(s, e) + q3

    def __rtruediv__(self, o):
        o = _promote(o, self)
        if o is NotImplemented:
            return NotImplemented
        return o / self

    def __neg__(self):
        return DD(-self.hi, -self.lo)

    def __pow__(self, n):
        if not isinstance(n, int) or n < 1:
            return NotImplemented
        out = self
        for _ in range(n - 1):
            out = out * self
        return out

    # -- comparisons (against DD / scalar / array) ------------------------
    def _cmp_diff(self, o):
        d = self - _promote_strict(o, self)
        return d.hi + d.lo

    def __lt__(self, o):
        return self._cmp_diff(o) < 0

    def __le__(self, o):
        return self._cmp_diff(o) <= 0

    def __gt__(self, o):
        return self._cmp_diff(o) > 0

    def __ge__(self, o):
        return self._cmp_diff(o) >= 0

    def __eq__(self, o):  # noqa: D105 — elementwise, like jnp arrays
        return self._cmp_diff(o) == 0

    def __ne__(self, o):
        return self._cmp_diff(o) != 0

    __hash__ = None


jax.tree_util.register_pytree_node(
    DD, lambda d: d.tree_flatten(), DD.tree_unflatten)


def _promote(o, like: DD):
    """Promote a python scalar / jnp array to DD(o, 0); NotImplemented for
    foreign types (so e.g. the CZ complex wrapper gets its __r*__ turn)."""
    if isinstance(o, DD):
        return o
    if isinstance(o, (int, float)) or isinstance(o, (jnp.ndarray, np.ndarray,
                                                     jax.Array)):
        x = jnp.asarray(o, jnp.asarray(like.hi).dtype)
        return DD(x, jnp.zeros_like(x))
    return NotImplemented


def _promote_strict(o, like: DD):
    p = _promote(o, like)
    if p is NotImplemented:
        raise TypeError(f"cannot promote {type(o)} to DD")
    return p


# -- construction / conversion ---------------------------------------------


def from_float(x, dtype=jnp.float32) -> DD:
    """Exact promotion of a base-dtype array (lo = 0)."""
    x = jnp.asarray(x, dtype)
    return DD(x, jnp.zeros_like(x))


def from_float64(x, dtype=jnp.float32) -> DD:
    """Split a float64 array into an (hi, lo) pair, exact to ~2p bits.

    Accepts numpy or jnp input. For STATIC values prefer numpy input —
    the split then happens at trace time and no f64 op enters the
    compiled program (the whole point on TPU)."""
    if isinstance(x, (np.ndarray, float, int)) or np.isscalar(x):
        x64 = np.asarray(x, np.float64)
        hi = x64.astype(dtype)
        lo = (x64 - hi.astype(np.float64)).astype(dtype)
        return DD(jnp.asarray(hi), jnp.asarray(lo))
    x = jnp.asarray(x)
    hi = x.astype(dtype)
    lo = (x - hi.astype(x.dtype)).astype(dtype)
    return DD(hi, lo)


def const(v: float, like=None, dtype=jnp.float32) -> DD:
    """DD constant from a python float, split via numpy (trace-time)."""
    d = from_float64(float(v), dtype=dtype)
    if like is not None:
        ref = like.hi if isinstance(like, DD) else like
        d = DD(jnp.broadcast_to(d.hi, jnp.shape(ref)),
               jnp.broadcast_to(d.lo, jnp.shape(ref)))
    return d


def to_float(d: DD, dtype=jnp.float64):
    return d.astype(dtype)


# -- structural ops ----------------------------------------------------------


def zeros_like(d: DD) -> DD:
    return DD(jnp.zeros_like(d.hi), jnp.zeros_like(d.lo))


def ones_like(d: DD) -> DD:
    return DD(jnp.ones_like(d.hi), jnp.zeros_like(d.lo))


def full_like(d: DD, v: float) -> DD:
    c = from_float64(float(v), dtype=jnp.asarray(d.hi).dtype)
    return DD(jnp.full_like(d.hi, c.hi), jnp.full_like(d.lo, c.lo))


def where(mask, a, b) -> DD:
    like = a if isinstance(a, DD) else b
    a = _promote_strict(a, like)
    b = _promote_strict(b, like)
    return DD(jnp.where(mask, a.hi, b.hi), jnp.where(mask, a.lo, b.lo))


def stack(ds, axis=0) -> DD:
    return DD(jnp.stack([d.hi for d in ds], axis),
              jnp.stack([d.lo for d in ds], axis))


def concatenate(ds, axis=0) -> DD:
    return DD(jnp.concatenate([d.hi for d in ds], axis),
              jnp.concatenate([d.lo for d in ds], axis))


def take(d: DD, idx, axis=0) -> DD:
    return DD(jnp.take(d.hi, idx, axis=axis), jnp.take(d.lo, idx, axis=axis))


def broadcast_to(d: DD, shape) -> DD:
    return DD(jnp.broadcast_to(d.hi, shape), jnp.broadcast_to(d.lo, shape))


def dd_abs(d: DD) -> DD:
    neg = (d.hi + d.lo) < 0
    return DD(jnp.where(neg, -d.hi, d.hi), jnp.where(neg, -d.lo, d.lo))


# -- transcendentals ---------------------------------------------------------
#
# Range reductions use dd constants split from numpy float64 at trace
# time; reduction keeps ~(49 - log2|m|) bits, ample for the |arg| <~ 1e3
# ranges of the f-k synthesis (documented per function).


def sqrt(d: DD) -> DD:
    """sqrt for d >= 0 (negative clamps to 0, matching a domain error on
    exactly-0 inputs' gradients being avoided by the caller). Karp's
    method: one refined f32 rsqrt seed + one dd correction — full dd
    accuracy."""
    hi_safe = jnp.where(d.hi > 0, d.hi, 1.0)
    # lax.rsqrt, NOT 1.0/jnp.sqrt: XLA duplicates this seed into several
    # fusions and rewrites 1/sqrt -> rsqrt in only SOME copies; the copies
    # then round differently and the downstream compensation silently
    # breaks (measured: ga/gb lost full dd accuracy under jit, 1.6e-7 vs
    # eager; optimization_barrier does not help — the CPU pipeline strips
    # every barrier, 8 -> 0 in the optimized HLO). Writing rsqrt
    # explicitly makes every duplicated copy the same computation; the
    # Newton correction below absorbs the seed's own error either way.
    x = jax.lax.rsqrt(hi_safe)
    ax = hi_safe * x                                  # ~sqrt(d), f32
    e = d - DD(*_two_prod(ax, ax))                    # d - ax^2, dd-exact
    r = DD(*_quick_two_sum(ax, e.hi * (x * 0.5)))
    zero = (d.hi + d.lo) <= 0
    return _seal_result(DD(jnp.where(zero, 0.0, r.hi),
                           jnp.where(zero, 0.0, r.lo)))


_EXP_TERMS = 13          # e^r Taylor terms, |r| <= ln2/2: rem < 2^-52
_TRIG_TERMS = 8          # sin/cos r^2-Horner terms, |r| <= pi/4: < 2^-50


def _dd_horner(r: DD, coeffs_np):
    """sum_k coeffs[k] r^k via a lax.scan Horner loop (highest first).

    A scan, not an unrolled Python loop: each unrolled dd fused
    multiply-add is ~35 f32 HLO ops, and the transcendental loops below
    sit inside the layered-physics layer scans, where every line is
    multiplied into XLA's optimization-pass cost (measured: minutes of
    compile time at production configs). coeffs_np is STATIC float64
    numpy — split exactly at trace time."""
    cs = np.asarray(coeffs_np, np.float64)
    hi = cs.astype(np.float32)
    lo = (cs - hi.astype(np.float64)).astype(np.float32)
    acc0 = DD(jnp.broadcast_to(jnp.asarray(hi[0]), r.shape),
              jnp.broadcast_to(jnp.asarray(lo[0]), r.shape))

    def step(acc, c):
        return acc * r + DD(c[0], c[1]), None

    acc, _ = jax.lax.scan(step, acc0,
                          (jnp.asarray(hi[1:]), jnp.asarray(lo[1:])))
    return acc


def _pow2_exact(m):
    """Exact 2^m for integer-valued float m in [-126, 127], by exponent-
    bit construction (jnp.exp2 is an APPROXIMATION — ~2e-6 off even at
    integer arguments — which would cap exp() at f32 accuracy)."""
    mi = jnp.clip(m, -126.0, 127.0).astype(jnp.int32)
    return jax.lax.bitcast_convert_type((mi + 127) << 23, jnp.float32)


def _scale_exp2(d: DD, m):
    """d * 2^m for integer-valued float m, two exact half-scalings so
    |half| <= 127 stays in exponent range (m in [-252, 254] covered;
    lower underflows through f32 denormals to 0, as IEEE would)."""
    m1 = jnp.trunc(m * 0.5)
    s1 = _pow2_exact(m1)
    s2 = _pow2_exact(m - m1)
    return _seal_result(DD(d.hi * s1 * s2, d.lo * s1 * s2))


def exp(d: DD) -> DD:
    """e^d. Full dd accuracy (~1e-14 relative) while the result stays
    above ~3e-24 (below that the lo word crosses into f32 denormals and
    precision degrades gracefully to f32-relative ~6e-8, reaching 0 at
    ~1e-38 — fine for decaying phase factors, which are numerically zero
    against O(1) terms long before 1e-24)."""
    ln2 = from_float64(math.log(2.0))
    inv_ln2 = 1.0 / math.log(2.0)
    m = _pin(jnp.round(d.hi * inv_ln2))
    r = d - ln2 * m                                   # |r| <= ln2/2
    # Horner: sum_{k<=N} r^k / k!
    acc = _dd_horner(r, [1.0 / math.factorial(kk)
                         for kk in range(_EXP_TERMS, -1, -1)])
    return _scale_exp2(acc, m)


def sincos(d: DD):
    """(sin d, cos d), one shared pi/2 range reduction. Accurate to
    ~1e-13 absolute for |d| <= ~1e3 (reduction loses log2|m| of the 49
    bits; the layered phase arguments are <= a few hundred)."""
    pio2 = from_float64(math.pi / 2.0)
    m = _pin(jnp.round(d.hi * (2.0 / math.pi)))
    r = d - pio2 * m                                  # |r| <= pi/4
    r2 = r * r
    # sin r = r * S(r^2), cos r = C(r^2)
    s_acc = _dd_horner(r2, [(-1.0) ** kk / math.factorial(2 * kk + 1)
                            for kk in range(_TRIG_TERMS, -1, -1)])
    c_acc = _dd_horner(r2, [(-1.0) ** kk / math.factorial(2 * kk)
                            for kk in range(_TRIG_TERMS, -1, -1)])
    sin_r = r * s_acc
    cos_r = c_acc
    q = jnp.mod(m, 4.0)                               # exact for |m|<2^24
    sin_d = where(q == 0, sin_r,
                  where(q == 1, cos_r,
                        where(q == 2, -sin_r, -cos_r)))
    cos_d = where(q == 0, cos_r,
                  where(q == 1, -sin_r,
                        where(q == 2, -cos_r, sin_r)))
    return sin_d, cos_d


def hypot(a: DD, b: DD) -> DD:
    """sqrt(a^2 + b^2) — NO overflow guard beyond dd's base-dtype range:
    callers keep |a|, |b| <= ~1e17 (f32 pairs), which the f-k stack
    algebra satisfies by orders of magnitude."""
    return sqrt(a * a + b * b)
