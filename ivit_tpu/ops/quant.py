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


def rdiv(a, b):
    """Division with one Newton correction step.

    TPU XLA lowers f32 division as reciprocal-multiply that is ~1 ulp sloppy
    (measured: 35% of integer-ratio quotients differ from the correctly
    rounded result), which flips the scheme's floor/round constructs at
    boundaries — e.g. ~1e-5 of on-device weight quantizations differed
    between TPU and CPU.  The correction ``q + (a - q*b)/b`` cancels the
    first-order quotient error (the residual subtraction is exact by
    Sterbenz), leaving results platform-deterministic at every rounding
    boundary the scheme can hit.  Use for every division that feeds a
    floor/round.
    """
    q = a / b
    return q + (a - q * b) / b


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
    scale = jnp.maximum(mag / n, F32_EPS)
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


def fake_quantize(x, num_bits: int, scale):
    """x -> clamp(round(x/s)) * s ; overall straight-through gradient."""
    scale = jax.lax.stop_gradient(scale)
    return quantize_int(x, num_bits, scale) * scale


# ---------------------------------------------------------------------------
# Dyadic fixed-point requantization (fake-quant formulation)
# ---------------------------------------------------------------------------

def _dyadic_pair(scale_ratio):
    """On-device (m, e) decomposition of a positive multiplier.

    float32 analogue of ``ivit_tpu.ops.dyadic.batch_frexp``: mantissa is
    round-half-up of ``frexp(M).mantissa * 2**31``.  Used in the QAT graph
    where the pair must be recomputed as ranges move; the frozen engine uses
    the exact float64 host decomposition instead.
    """
    m_f, exp = jnp.frexp(scale_ratio)
    m = jnp.floor(m_f * (2.0**31) + 0.5)
    e = 31.0 - exp.astype(m_f.dtype)
    return m, e


def _requant_value(num_bits, x, pre_scale, out_scale, identity, identity_scale):
    n = 2 ** (num_bits - 1) - 1
    z = jnp.round(rdiv(x, pre_scale))
    m, e = _dyadic_pair((pre_scale / out_scale).astype(jnp.float32))
    out = jnp.round(z * m * pow2(-e))
    if identity is not None:
        zi = jnp.round(rdiv(identity, identity_scale))
        mi, ei = _dyadic_pair((identity_scale / out_scale).astype(jnp.float32))
        out = out + jnp.round(zi * mi * pow2(-ei))
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


def fixedpoint_requant(
    x,
    pre_scale,
    num_bits: int,
    out_scale,
    identity=None,
    identity_scale=None,
):
    """Fake-quant dyadic requantization with optional fused residual add.

    Mirrors ref ``fixedpoint_mul`` (quant_utils.py:178-261) composed with the
    ``* out_scale`` that QuantAct applies (quant_modules.py:385-387):

        z   = round(x / pre_scale)                 # recover the int
        m,e = frexp31(pre_scale / out_scale)
        out = round(z * m / 2**e)                  # dyadic requant
        (+ same for the identity/residual branch, added in integer domain)
        out = clamp(out) * out_scale

    Gradient: straight-through identity to both ``x`` and ``identity`` (the
    reference's ``g/out_scale`` composed with the external ``* out_scale``);
    no gradient to the scales.

    Scales may be scalars or per-channel vectors already shaped to broadcast
    against ``x`` (the caller reshapes, as ref does via its ``reshape`` lambda).
    """
    pre_scale = jax.lax.stop_gradient(pre_scale)
    out_scale = jax.lax.stop_gradient(out_scale)
    if identity is None:
        return _requant(num_bits, x, pre_scale, out_scale)
    identity_scale = jax.lax.stop_gradient(identity_scale)
    return _requant_id(num_bits, x, pre_scale, out_scale, identity,
                       identity_scale)
