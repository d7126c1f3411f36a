"""Quantization math core (pure JAX).

JAX re-design of the reference math core
(``/root/reference/models/quantization_utils/quant_utils.py``):

* straight-through estimators as ``jax.custom_vjp`` (ref ``floor_ste``/
  ``round_ste``/``SymmetricQuantFunction``, quant_utils.py:73-148),
* symmetric scale computation (quant_utils.py:52-70),
* the dyadic fixed-point requantizer (ref ``fixedpoint_mul``,
  quant_utils.py:178-261) in its fake-quant (QAT) formulation.

Everything here operates on *fake-quantized floats*: tensors whose value is
exactly ``int * scale``.  The integer-only deployment engine lives in
``ivit_tpu.engine`` and shares the dyadic decomposition of
``ivit_tpu.ops.dyadic``.

Design notes (TPU-first):

* The reference recomputes the dyadic pair with a host round-trip on every
  forward; here ``jnp.frexp`` keeps the whole requant on-device and jit-fusable.
* The reference evaluates ``round(z*m/2**e)`` in float64.  TPUs have no fast
  f64; we evaluate in float32 which is exact for every 8/16-bit requant site
  of the scheme (|out| <= 2**15, relative f32 error ~2**-23 -> absolute error
  << 0.5 ulp of the rounded integer except at exact ties).  Tests quantify
  the residual vs the float64 host reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

F32_EPS = float(jnp.finfo(jnp.float32).eps)


_PIN = float.fromhex("0x1p-126")  # smallest normal f32

# Trace-time switch: ops/pallas._kernel_trace sets this False while tracing
# a kernel body for real Mosaic compilation — Mosaic has no lowering rule
# for lax.optimization_barrier, and none of the XLA HLO rewrites the
# barriers defend against run inside Mosaic.  The barrier-free forms are
# value-identical (the pin is an exact identity; the divisor copies carry
# the same value).
_BARRIERS = True


def _pin(v):
    """Materialize ``v``'s rounded value against FMA contraction.

    If ``v`` is an unmaterialized product expression (``v = x*y``), the
    backend may contract a downstream ``v - z`` into ``fma(x, y, -z)`` —
    substituting the infinitely-precise product for the rounded value that
    every other use of ``v`` sees (measured on XLA:CPU: ``x*y - p`` under
    jit returns the exact product error).  ``(v - c) + c`` cannot be folded
    away without float reassociation (which XLA/LLVM never do outside
    fast-math) and is value-exact for v == 0 and every |v| >= 2**-102:
    ``c`` vanishes below 0.5 ulp in the subtraction and restores exactly.
    Two flops; breaks the (mul, add) pattern because the consumer now sees
    an add node.

    ``c`` itself hides behind an optimization_barrier: with a visible
    constant, XLA's algebraic simplifier reassociates ``(v - c) + c`` away
    at the HLO level (verified in optimized HLO dumps).  The barrier is
    deleted only after all algebraic passes, and LLVM cannot reassociate
    floats without fast-math, so the pin survives to machine code.
    """
    c = (jax.lax.optimization_barrier(jnp.float32(_PIN))
         if _BARRIERS else jnp.float32(_PIN))
    return (v - c) + c


def mul_add_2r(a, b, c):
    """Two-rounding ``fl(fl(a*b) + c)``, deterministic in every context.

    The reference evaluates its polynomial Horner steps as separate f32
    multiply and add (torch eager), so parity requires the TWO-rounding
    value — but a bare ``a*b + c`` contracts into a one-rounding FMA under
    jit whenever the product is inexact.  Pinning the product forces the
    add to see the rounded value everywhere.
    """
    return _pin(a * b) + c


def ema_update(old, new, m: float):
    """Context-stable EMA ``old*m + new*(1-m)`` for activation ranges.

    A bare ``old*m + new*(1-m)`` leaves both products exposed to FMA
    contraction, so the stored range — and hence every downstream scale —
    shifted by an ulp between compilation contexts (measured: unrolled vs
    lax.scan calibration on CPU; even ``_pin``-wrapped products tie-break
    differently, because the pin's own ``v - c`` can contract into
    ``fma(x, y, -c)``).  :func:`exact_fma` is the only mul+add form here
    that is deterministic everywhere, so the EMA is DEFINED as
    ``fl(old*m + fl(new*(1-m)))`` built from two exact_fma calls — one
    fixed, reproducible value on every backend in every context (within
    <=1 ulp of the reference's torch-eager three-rounding form,
    quant_modules.py:351-360; stats are statistics, determinism is the
    invariant that matters).
    """
    return exact_fma(old, m, exact_fma(new, 1.0 - m, 0.0))


def _two_sum(x, y):
    """Knuth TwoSum: s = fl(x+y) and its exact error, add/sub ops only."""
    s = x + y
    yy = s - x
    e = (x - (s - yy)) + (y - yy)
    return s, e


def _split(x):
    """Bitmask split: x == hi + lo, hi keeping the top 12 mantissa bits.

    A bit operation instead of the classic Veltkamp multiply
    (``t = 4097x; hi = t - (t - x)``): the multiply form's ``t - x`` is a
    (mul, sub) pair that LLVM/XLA may contract into an FMA inside fused
    loops — which evaluates ``4096x`` exactly, collapses the split to
    ``hi == x, lo == 0``, and silently corrupts every downstream error
    term, *context-dependently* (measured as eager-vs-jit requant-tie flips
    in Swin-T).  Bit ops cannot be contracted or algebraically rewritten.
    ``lo = x - hi`` is exact (same binade, 12-bit tail).
    """
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    hi = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(bits, jnp.int32(-4096)), jnp.float32)
    return hi, x - hi


def _two_product_err(x, y, p):
    """Exact error e of p = fl(x*y), i.e. x*y == p + e.

    Every partial product is exact (12x12-bit operands), so each
    multiply-add here is FMA-contraction-immune: ``fl(xh*yh) == xh*yh``
    exactly, hence ``fma(xh, yh, -p) == fl(xh*yh) - p`` bit-for-bit.
    Combined with the bitmask :func:`_split`, the whole error computation
    is identical in every compilation context.
    """
    xh, xl = _split(x)
    yh, yl = _split(y)
    return ((xh * yh - p) + xh * yl + xl * yh) + xl * yl


def rdiv(a, b):
    """Correctly-rounded f32 division, bit-stable in every compilation context.

    Use for every division that feeds a floor/round.  Hazards this
    construction defeats (each one measured, not hypothesized — see git
    history and the round-2 commit messages):

    * TPU XLA lowers f32 division as a reciprocal-multiply that is ~1 ulp
      sloppy (35% of integer-ratio quotients differ from correctly
      rounded), flipping the scheme's floor/round constructs at boundaries.
      The one-Newton-step correction with an EXACT residual repairs any
      1-2-ulp quotient.
    * XLA's HLO shared-divisor rewrite turns ``x/b, y/b`` into
      ``recip = 1/b; x*recip, y*recip`` — and rdiv always contains its own
      trigger (two divides by ``b``).  Structurally distinct
      optimization_barrier copies of ``b`` prevent the pattern match (198
      requant ties flipped eager-vs-jit in one Swin-T block through this).
    * LLVM FMA contraction (which survives barrier deletion at codegen)
      eats (mul, add/sub) pairs: the classic Veltkamp split and the
      ``a - fl(q*b)`` residual both break under it.  Hence the bitmask
      :func:`_split` and a residual built ONLY from exact 12x12-bit partial
      products (Dekker's long-division residual — contraction of an exact
      product is value-neutral), plus :func:`_pin` on both operands so
      caller-side product expressions cannot contract into the residual.

    Operands are coerced to f32 (a Python-float operand would evaluate in
    host f64) and lifted to >=2-D (Mosaic lowers only vector bitcasts).
    """
    # _pin both operands: a caller-side product expression would otherwise
    # contract into the residual subtractions / the split's ``lo = b - bh``
    # (fma substituting the infinitely-precise product for the rounded
    # value that the division consumed).  Operands are lifted to >=2-D
    # first: the bitmask split bitcasts, and Mosaic (Pallas TPU, whose
    # kernels share this function) only lowers vector bitcasts.
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    out_shape = jnp.broadcast_shapes(jnp.shape(a), jnp.shape(b))
    a = _pin(a.reshape((1,) * max(0, 2 - a.ndim) + a.shape))
    b = _pin(b.reshape((1,) * max(0, 2 - b.ndim) + b.shape))
    # Structurally distinct divisor copies: XLA's HLO-level shared-divisor
    # rewrite (x/b, y/b -> recip = 1/b; x*recip, y*recip) would replace
    # both correctly-rounded divisions with 1-ulp reciprocal multiplies.
    # (The barrier is deleted before codegen, but the algebraic simplifier
    # runs while it is still in place, which is where that rewrite lives;
    # it also forecloses constant-divisor strength reduction.)
    if _BARRIERS:
        b1, b2 = jax.lax.optimization_barrier((b, b))
    else:
        b1 = b2 = b
    q = a / b1
    # Residual a - q*b built ONLY from exact partial products (12x12-bit
    # splits): each subtraction's mul operand is exactly representable, so
    # FMA contraction is value-neutral at every step.  This is Dekker's
    # long-division residual; each step is exact in round-to-nearest.
    qh, ql = _split(q)
    bh, bl = _split(b1)
    r = (((a - qh * bh) - qh * bl) - ql * bh) - ql * bl
    return (q + r / b2).reshape(out_shape)


def floor_div_int(x, b):
    """Exact ``floor(x / b)`` for f32-held integers — no rounded divide needed.

    The cheap replacement for ``floor(rdiv(x, b))`` on the engine's hot
    per-element exp chains (ivit ``int_exp_shift``, ibert ``int_exp``):
    ~6 VPU ops and ZERO divides vs rdiv's ~20 ops + 2 divides.  Semantics:
    the TRUE integer floor quotient, which equals ``floor(rdiv(x, b))``
    whenever the divisor passes :func:`exp_fastdiv_ok` (the correctly-
    rounded quotient can only cross an integer when the true quotient is
    within half an f32 ulp of it, and integer-ratio quotients keep a gap of
    at least ``1/|b|``).

    Preconditions (caller-guaranteed; see the gate):
    * ``x``, ``b`` integer-valued f32 with ``|x|``, ``|b|``, every candidate
      product ``q*b`` and remainder inside the f32-exact 2**24 envelope;
    * ``|x / b|`` small enough (< ~2**20) that the sloppy seed quotient is
      within +-1 of the truth — one correction step then lands it exactly.

    Context hazards (ops/quant.py catalogue) are all value-neutral here, so
    no pins or barriers are needed: the seed ``x * (1/b)`` may be strength-
    reduced or 1-ulp sloppy (the correction absorbs any error < 1); the
    remainder's ``q * b`` is exactly representable, so LLVM FMA contraction
    substitutes an equal value; the final boolean adjustments are exact
    small-integer arithmetic in any association order.
    """
    b = jnp.asarray(b, jnp.float32)
    q = jnp.floor(x * (1.0 / b))
    r = x - q * b                       # exact: q*b and x are f32-exact ints
    rs = r * jnp.sign(b)
    q = q - (rs < 0).astype(jnp.float32) + (rs >= jnp.abs(b)).astype(jnp.float32)
    return q


def exp_fastdiv_ok(x0, n: int) -> bool:
    """Host-side freeze gate: may ``floor_div_int`` replace
    ``floor(rdiv(x, x0))`` for every ``x`` in ``[n*x0, 0]``?

    ``floor(crdiv(x, x0))`` differs from the true floor only when the true
    quotient ``t = x/x0`` lies within half an ulp below an integer ``k <= n``
    (the correctly rounded quotient then lands ON ``k``).  Integer ratios
    keep ``|t - k| >= 1/|x0|`` when not exact, so the divergence is
    impossible while ``1/|x0| > ulp(n)/2 = 2**(floor(log2 n) - 24)``.  The
    gate enforces that with a 2x safety margin; it also bounds every value
    in :func:`floor_div_int`'s arithmetic (``|x| <= n*|x0| < 2**24``) and
    the seed-quotient error (``<= n * 2**-22 << 1``).  Fails only for
    degenerate scales (``s < ~2e-6``); the engine then keeps the rdiv path.
    """
    import math
    x0 = float(x0)
    if not (x0 < 0 and math.isfinite(x0)):
        return False
    return -x0 <= 2.0 ** (23 - int(math.floor(math.log2(n))))


def pack_rows(fn, *cols, pad: float = 1.0):
    """Run an elementwise chain over ``[..., 1]`` row-stat tensors in a dense
    ``[rows/128, 128]`` layout.

    The per-row scalar chains of the scheme — LayerNorm's mean round, its
    Newton-sqrt + factor divides, softmax's reciprocal factor — operate on
    keepdims ``[..., 1]`` tensors.  On TPU the trailing length-1 axis maps to
    a single lane, so every VPU op in those chains pays 128x its useful work
    (measured: the 10-step Newton chain alone is ~260us/call in the DeiT-T
    attention path, runs/ln_diag_tiny_r4.log).  Flattening the row axis onto
    lanes before the chain and restoring the shape afterwards is a pure
    relayout: ``fn`` sees the same f32 values and applies the same ops in the
    same order, so the result is bit-identical by construction — no gate, no
    proof obligation (unlike every rewrite catalogued above, nothing about
    the *values* changes).

    ``cols``: one or more same-shaped ``[..., 1]`` operands for ``fn``.
    ``pad``: fill for the alignment tail (chosen nonzero so padded lanes
    cannot divide by zero; their results are sliced away).
    """
    shape = cols[0].shape
    for c in cols[1:]:
        # all operands are flattened against shape below; a mismatched
        # operand would be silently mis-reshaped/mis-sliced (ADVICE r4)
        assert c.shape == shape, \
            f"pack_rows operands must share a shape: {c.shape} vs {shape}"
    n = 1
    for d in shape:
        n *= int(d)
    m = ((n + 127) // 128) * 128
    packed = []
    for c in cols:
        flat = jnp.reshape(c, (-1,))
        if m != n:
            flat = jnp.concatenate(
                [flat, jnp.full((m - n,), pad, dtype=flat.dtype)])
        packed.append(flat.reshape(m // 128, 128))
    out = fn(*packed)
    return jnp.reshape(jnp.reshape(out, (-1,))[:n], shape)


# ---------------------------------------------------------------------------
# Straight-through estimators
# ---------------------------------------------------------------------------

@jax.custom_vjp
def floor_ste(x):
    """floor with identity gradient (ref quant_utils.py:123-134)."""
    return jnp.floor(x)


def _floor_fwd(x):
    return jnp.floor(x), None


def _floor_bwd(_, g):
    return (g,)


floor_ste.defvjp(_floor_fwd, _floor_bwd)


@jax.custom_jvp
def pow2(k):
    """Exact 2**k for integer-valued float ``k`` in [-126, 127].

    XLA lowers ``exp2`` as a transcendental approximation (e.g.
    ``exp2(23) -> 8388604.5`` on CPU), which silently corrupts the integer
    shift arithmetic ``floor(x * 2**(n-q))`` used throughout the I-ViT/I-BERT
    kernels.  This constructs the float32 bit pattern directly instead.

    The gradient matches torch's ``2**k`` autodiff (ln2 * 2**k), so the QAT
    graphs keep the reference's gradient flow through data-dependent shifts.
    """
    ki = jnp.clip(k, -126, 127).astype(jnp.int32)
    bits = (ki + 127) << 23
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


@pow2.defjvp
def _pow2_jvp(primals, tangents):
    (k,), (dk,) = primals, tangents
    y = pow2(k)
    return y, 0.6931471805599453 * y * dk


@jax.custom_vjp
def round_ste(x):
    """round-half-to-even with identity gradient (ref quant_utils.py:137-148)."""
    return jnp.round(x)


def _round_fwd(x):
    return jnp.round(x), None


def _round_bwd(_, g):
    return (g,)


round_ste.defvjp(_round_fwd, _round_bwd)


# ---------------------------------------------------------------------------
# Scale computation
# ---------------------------------------------------------------------------

def symmetric_quant_params(num_bits: int, x_min, x_max):
    """Symmetric scale ``max(|min|, max) / (2**(b-1)-1)`` clamped at f32 eps.

    Mirrors ref ``symmetric_linear_quantization_params`` (quant_utils.py:52-70).
    No gradient flows through the scale.
    """
    n = 2 ** (num_bits - 1) - 1
    mag = jnp.maximum(-x_min, x_max)
    # rdiv, not plain `/`: under jit XLA strength-reduces division by a
    # constant into a reciprocal multiply (even on CPU), which is 1 ulp off
    # for ~30/768 typical weight columns — enough to flip w_int ties and
    # make the sim's weights compilation-context-dependent.
    scale = jnp.maximum(rdiv(mag, jnp.float32(n)), F32_EPS)
    return jax.lax.stop_gradient(scale)


# ---------------------------------------------------------------------------
# Fake quantization (the model-input / weight quantizer)
# ---------------------------------------------------------------------------

def quantize_int(x, num_bits: int, scale):
    """clamp(round(x/scale), -2**(b-1), 2**(b-1)-1) with STE grad ``g/scale``.

    Returns the *integer-valued float* tensor.  Composite semantics match ref
    ``SymmetricQuantFunction`` (quant_utils.py:73-120): forward quantize with
    zero-point 0, backward straight-through scaled by ``1/scale`` (so that
    ``quantize_int(x) * scale`` has an overall identity STE).
    ``scale`` must already broadcast against ``x``.
    """
    n = 2 ** (num_bits - 1) - 1
    scale = jax.lax.stop_gradient(scale)
    x_int = round_ste(rdiv(x, scale))
    return jnp.clip(x_int, -n - 1, n)


def exact_fma(a, b, c):
    """Correctly-rounded ``a*b + c`` in every compilation context.

    A plain ``a * b + c`` is contraction-dependent: XLA emits an FMA under
    jit but rounds the product first in eager dispatch, so when ``a*b``
    exceeds 2**24 (the I-BERT erf/exp polynomial constants reach ~2**28 at
    small calibrated scales) the two contexts differ by an ulp and flip the
    scheme's floor() constructs.  This emulates the FMA exactly: the Dekker
    two-product gives the product's rounding error, TwoSum the addition's,
    and both corrections are applied in one final rounding.  Every partial
    product is exact (12x12-bit splits), so the value is identical with or
    without hardware FMA contraction.  Autodiff sees a linear composition
    and yields the exact algebraic gradients (b*g, a*g, g).

    Operands are coerced to f32 first (see :func:`rdiv` — a Python-float
    operand would be split in host f64, corrupting the error term).
    """
    # _pin all operands (see rdiv) and build the result purely from exact
    # partial products + TwoSum chains: ``fl(a*b) + c`` as written would
    # itself be a contraction candidate (fma(a, b, c) — fused where the
    # semantics require two roundings... except we WANT the fused value,
    # but only deterministically).  The EFT below computes the correctly
    # rounded a*b + c from pieces whose every (mul, add) pair is
    # value-neutral under contraction.
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    c = jnp.asarray(c, jnp.float32)
    out_shape = jnp.broadcast_shapes(jnp.shape(a), jnp.shape(b),
                                     jnp.shape(c))
    a = _pin(a.reshape((1,) * max(0, 2 - a.ndim) + a.shape))
    b = _pin(b.reshape((1,) * max(0, 2 - b.ndim) + b.shape))
    c = _pin(c.reshape((1,) * max(0, 2 - c.ndim) + c.shape))
    ah, al = _split(a)
    bh, bl = _split(b)
    s, e1 = _two_sum(c, ah * bh)
    s, e2 = _two_sum(s, ah * bl)
    s, e3 = _two_sum(s, al * bh)
    s, e4 = _two_sum(s, al * bl)
    return (s + ((e1 + e2) + (e3 + e4))).reshape(out_shape)


@jax.custom_vjp
def exact_int_sum(x):
    """Order-independent last-axis sum of integer-valued f32 (keepdims).

    An f32 reduction whose partial sums cross 2**24 is reduction-order — and
    therefore compilation-context — dependent (measured: the Shiftmax exp
    sum, elements up to ~2**22 over 200 columns, flipped the downstream
    ``floor(INT32_MAX/sum)`` between eager and jit and broke sim↔engine
    parity at img=224).  Summing in int32 is exact for any order whenever the
    true sum fits int32 (every scheme site is bounded well below 2**31 — the
    envelope audit asserts it), and the final f32 cast rounds once,
    deterministically.

    Gradient: same as ``jnp.sum`` (broadcast), matching the reference's
    autograd through ``exp_int.sum()`` (ivit_modules.py:173).

    Two-limb scheme (a single int32 sum would *wrap* on the Shiftmax exp
    rows, whose true sums approach 2**31): split ``x = 2**8 h + l`` exactly,
    sum each limb in int32 (``sum(h) <= N * 2**23 < 2**31`` for every
    in-envelope element, ``sum(l) < N * 2**8``), recombine with a fixed
    two-rounding f32 sequence.  Exact whenever the true sum fits 2**24;
    deterministic always.
    """
    x = jnp.clip(x, -(2.0**31), 2.0**31)   # keep h within int32 after summing
    h = jnp.floor(x * (2.0**-8))
    l = x - h * (2.0**8)
    s_h = jnp.sum(h.astype(jnp.int32), axis=-1, keepdims=True)
    s_l = jnp.sum(l.astype(jnp.int32), axis=-1, keepdims=True)
    return s_h.astype(jnp.float32) * 2.0**8 + s_l.astype(jnp.float32)


def _eis_fwd(x):
    return exact_int_sum(x), x.shape


def _eis_bwd(shape, g):
    return (jnp.broadcast_to(g, shape),)


exact_int_sum.defvjp(_eis_fwd, _eis_bwd)


@jax.custom_vjp
def exact_sq_sum(y):
    """Order-independent last-axis sum of squares of integer-valued f32.

    The LayerNorm variance: for 16-bit activations ``y = x - mean`` reaches
    ±2**16, so ``y*y`` (up to 2**32) is not even representable in f32 or
    int32, and a plain f32 reduction is reduction-order nondeterministic —
    the source of the round-1 ~1e-3 sim↔engine gap on 16-bit LN configs.

    Exact two-limb scheme: split ``y = 2**8 a + b`` (both exact), so
    ``sum(y^2) = 2**16 S_aa + 2**9 S_ab + S_bb`` with each partial sum an
    exact int32 (|a| <= 257, b < 256, C <= 4096 keeps every S below 2**31).
    The recombination rounds to f32 in a fixed two-add sequence —
    deterministic in every compilation context, identical in the QAT sim,
    the unfused engine, and the Pallas kernels.

    Gradient: ``2 y g`` (same as ``jnp.sum(y*y)``).
    """
    a = jnp.floor(y * (2.0**-8))
    b = y - a * (2.0**8)
    s_aa = jnp.sum((a * a).astype(jnp.int32), axis=-1, keepdims=True)
    s_ab = jnp.sum((a * b).astype(jnp.int32), axis=-1, keepdims=True)
    s_bb = jnp.sum((b * b).astype(jnp.int32), axis=-1, keepdims=True)
    return (s_aa.astype(jnp.float32) * 2.0**16
            + (s_ab.astype(jnp.float32) * 2.0**9
               + s_bb.astype(jnp.float32)))


def _ess_fwd(y):
    return exact_sq_sum(y), y


def _ess_bwd(y, g):
    return (2.0 * y * g,)


exact_sq_sum.defvjp(_ess_fwd, _ess_bwd)


def fake_quantize(x, num_bits: int, scale):
    """x -> clamp(round(x/s)) * s ; overall straight-through gradient."""
    scale = jax.lax.stop_gradient(scale)
    return quantize_int(x, num_bits, scale) * scale


# ---------------------------------------------------------------------------
# Dyadic fixed-point requantization (fake-quant formulation)
# ---------------------------------------------------------------------------

def _requant_value(num_bits, x, pre_scale, out_scale, identity, identity_scale):
    """``round(z * M)`` with ``M = fl32(pre_scale / out_scale)``.

    The correctly-rounded f32 ratio IS a dyadic multiplier: its 24-bit
    mantissa is losslessly representable on the reference's 31-bit
    ``frexp31`` grid (quant_utils.py:151-175), so this is the reference's
    ``round(z * m / 2**e)`` with an f32-quantized ``m`` — within 2**-24
    relative of the float64 pair, i.e. identical except at exact ties.
    Evaluating the requant as ONE f32 multiply (not ``z*m`` then ``*2**-e``)
    is what the frozen engine does with the same host-computed multiplier
    (``engine/freeze.py::requant_multiplier``), which keeps the QAT sim and
    the integer engine bit-identical — the scheme's central invariant
    (tests/test_engine.py).  ``rdiv`` makes both divisions correctly rounded
    on TPU, so the multiplier matches the host bit-for-bit.
    """
    n = 2 ** (num_bits - 1) - 1
    z = jnp.round(rdiv(x, pre_scale))
    out = jnp.round(z * rdiv(pre_scale, out_scale))
    if identity is not None:
        zi = jnp.round(rdiv(identity, identity_scale))
        out = out + jnp.round(zi * rdiv(identity_scale, out_scale))
    if num_bits in (4, 8, 16, 32):
        out = jnp.clip(out, -n - 1, n)
    return out * out_scale


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _requant(num_bits, x, pre_scale, out_scale):
    return _requant_value(num_bits, x, pre_scale, out_scale, None, None)


def _requant_fwd(num_bits, x, pre_scale, out_scale):
    out = _requant_value(num_bits, x, pre_scale, out_scale, None, None)
    return out, (pre_scale, out_scale)


def _requant_bwd(num_bits, res, g):
    pre_scale, out_scale = res
    return (g, jnp.zeros_like(pre_scale), jnp.zeros_like(out_scale))


_requant.defvjp(_requant_fwd, _requant_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _requant_id(num_bits, x, pre_scale, out_scale, identity, identity_scale):
    return _requant_value(num_bits, x, pre_scale, out_scale, identity,
                          identity_scale)


def _requant_id_fwd(num_bits, x, pre_scale, out_scale, identity, identity_scale):
    out = _requant_value(num_bits, x, pre_scale, out_scale, identity,
                         identity_scale)
    return out, (pre_scale, out_scale, identity_scale)


def _requant_id_bwd(num_bits, res, g):
    pre_scale, out_scale, identity_scale = res
    return (g, jnp.zeros_like(pre_scale), jnp.zeros_like(out_scale), g,
            jnp.zeros_like(identity_scale))


_requant_id.defvjp(_requant_id_fwd, _requant_id_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _requant_exact(num_bits, x, z_int, pre_scale, out_scale):
    """Requant from the producer's EXACT integer (LN edges).

    LayerNorm outputs are ~2**30 integers — beyond f32-exact — so the
    generic recovery ``z = round(rdiv(x, pre_scale))`` is a LOSSY roundtrip
    of the fake-quant product ``fl(y*s)`` there (z lands on the 24-bit f32
    grid, one grid-ulp from the true int).  Round 2 replicated that lossy
    chain in the engine/kernels (a correctly-rounded divide PER ELEMENT —
    ~40% of DeiT-T engine time).  Instead the LN wrappers now hand their
    exact integer through, and every path computes ``round(z_int * M)``
    directly: sim == engine == kernels by construction, all-exact ops, no
    divides.  Deviation vs the torch reference (quant_utils.py:178-261,
    float64 requant of the f32 product): ~1 element in 4e7 flips one quant
    step — inside the quantization-noise tolerance of
    tests/test_torch_parity.py.
    """
    del x
    n = 2 ** (num_bits - 1) - 1
    z = jax.lax.stop_gradient(z_int)
    out = jnp.round(z * rdiv(pre_scale, out_scale))
    if num_bits in (4, 8, 16, 32):
        out = jnp.clip(out, -n - 1, n)
    return out * out_scale


def _requant_exact_fwd(num_bits, x, z_int, pre_scale, out_scale):
    out = _requant_exact(num_bits, x, z_int, pre_scale, out_scale)
    return out, (z_int, pre_scale, out_scale)


def _requant_exact_bwd(num_bits, res, g):
    z_int, pre_scale, out_scale = res
    return (g, jnp.zeros_like(z_int), jnp.zeros_like(pre_scale),
            jnp.zeros_like(out_scale))


_requant_exact.defvjp(_requant_exact_fwd, _requant_exact_bwd)


def fixedpoint_requant(
    x,
    pre_scale,
    num_bits: int,
    out_scale,
    identity=None,
    identity_scale=None,
    exact_int=None,
):
    """Fake-quant dyadic requantization with optional fused residual add.

    Mirrors ref ``fixedpoint_mul`` (quant_utils.py:178-261) composed with the
    ``* out_scale`` that QuantAct applies (quant_modules.py:385-387):

        z   = round(x / pre_scale)                 # recover the int
        M   = fl32(pre_scale / out_scale)          # f32 dyadic multiplier
        out = round(z * M)                         # dyadic requant
        (+ same for the identity/residual branch, added in integer domain)
        out = clamp(out) * out_scale

    (See ``_requant_value`` for why the f32 ratio is a valid dyadic
    multiplier and how this keeps sim == engine bit-identical.)

    Gradient: straight-through identity to both ``x`` and ``identity`` (the
    reference's ``g/out_scale`` composed with the external ``* out_scale``);
    no gradient to the scales.

    Scales may be scalars or per-channel vectors already shaped to broadcast
    against ``x`` (the caller reshapes, as ref does via its ``reshape`` lambda).
    """
    pre_scale = jax.lax.stop_gradient(pre_scale)
    out_scale = jax.lax.stop_gradient(out_scale)
    if exact_int is not None:
        if identity is not None:
            raise ValueError("exact_int requant has no identity branch "
                             "(LN edges carry no residual)")
        return _requant_exact(num_bits, x, exact_int, pre_scale, out_scale)
    if identity is None:
        return _requant(num_bits, x, pre_scale, out_scale)
    identity_scale = jax.lax.stop_gradient(identity_scale)
    return _requant_id(num_bits, x, pre_scale, out_scale, identity,
                       identity_scale)
