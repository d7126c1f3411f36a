"""I-BERT integer nonlinearities: polynomial exp/erf GELU, softmax, LayerNorm.

Functional JAX re-implementations of
``/root/reference/models/quantization_utils/ibert_modules.py`` (I-BERT,
ICML'21 kernels as extended by the fork).  Same fake-quant conventions as
``ivit_tpu.ops.ivit``.

Notable fork-specific behaviors preserved:
* LayerNorm eps semantics (1e-5) and the *dynamic overflow shift*: during
  training, if the int variance would exceed 2**32 the per-layer ``shift``
  is raised and variance recomputed (ibert_modules.py:69-83,137-140).  In
  JAX this is branchless: the candidate shift is computed unconditionally and
  applied via ``where``; callers persist the returned shift in their state.
* Optional 4-iteration bit-length-seeded integer Newton sqrt
  (``use_int_sqrt``, ibert_modules.py:85-109) vs float sqrt default.
* Softmax quantizes the exp output through an *internal 16-bit QuantAct*
  (ibert_modules.py:262,310-311); that stateful stage lives in the layer
  wrapper (models/layers.py), and :func:`ibert_softmax_core` exposes the two
  halves around it.
* GELU's erf scale is negative (coeff a = -0.2888), so intermediate "scales"
  here are signed (ibert_modules.py:203-218).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quant import (exact_fma, exact_int_sum, exact_sq_sum, floor_div_int,
                    floor_ste, pack_rows, pow2, rdiv, round_ste)

# --- GELU (int_erf) constants, ibert_modules.py:192-195 ---
GELU_K = 1.4142
GELU_N = 6
GELU_A = -0.2888
GELU_B = -1.769
GELU_C = 1.0 / GELU_A

# --- Softmax (int_exp) constants, ibert_modules.py:263-267 ---
EXP_X0 = -0.6931  # -ln 2
EXP_N = 30
EXP_A = 0.35815147
EXP_B = 0.96963238 / EXP_A
EXP_C = 1.0 / EXP_A


def int_polynomial(x_int, scaling_factor, fast_poly: bool = False):
    """2nd-order polynomial a(x+b)x + c in integer domain (ibert:275-283).

    ``fast_poly`` (engine-only, freeze-gated by
    ``freeze._poly_fast_gate``): every operand, product and sum is inside
    the f32-exact 2**24 envelope, so the plain mul-add computes the same
    exact integer as ``exact_fma`` in every compilation context (FMA
    contraction of an exact product is value-neutral) at ~1/8 the VPU ops.
    """
    b_int = jax.lax.stop_gradient(jnp.floor(rdiv(EXP_B, scaling_factor)))
    c_int = jax.lax.stop_gradient(jnp.floor(rdiv(EXP_C, scaling_factor**2)))
    if fast_poly:
        z = x_int * (x_int + b_int) + c_int
    else:
        # exact_fma: the plain mul-add is FMA-contraction-dependent once the
        # product passes 2**24 (small calibrated scales) — see ops/quant.py
        z = exact_fma(x_int, x_int + b_int, c_int)
    return z, EXP_A * scaling_factor**2


def int_exp(x_int, scaling_factor, n: int = EXP_N, fast_q: bool = False,
            fast_poly: bool = False):
    """I-BERT integer exp via range reduction by -ln2 (ibert:285-295).

    ``fast_q``: engine-only divide-free exact quotient (freeze-gated by
    ``quant.exp_fastdiv_ok``; identical values — see ops/ivit.int_exp_shift).
    """
    x0_int = jax.lax.stop_gradient(jnp.floor(rdiv(EXP_X0, scaling_factor)))
    x_int = jnp.maximum(x_int, n * x0_int)

    if fast_q:
        q = floor_div_int(x_int, x0_int)
    else:
        q = floor_ste(rdiv(x_int, x0_int))
    r = x_int - x0_int * q
    exp_int, exp_scale = int_polynomial(r, scaling_factor, fast_poly)
    exp_int = jnp.clip(floor_ste(exp_int * pow2(n - q)), 0, None)
    return exp_int, exp_scale / 2**n


def int_erf(x_int, scaling_factor, fast_poly: bool = False):
    """sign(x) * (a*(clamp(|x|,-b)+b)**2 + c) integer erf (ibert:203-218).

    ``fast_poly``: see :func:`int_polynomial` — freeze-gated exact plain
    form (t**2 and t**2 + c both inside the f32-exact envelope)."""
    b_int = jax.lax.stop_gradient(jnp.floor(rdiv(GELU_B, scaling_factor)))
    c_int = jax.lax.stop_gradient(jnp.floor(rdiv(GELU_C, scaling_factor**2)))

    sign = jax.lax.stop_gradient(jnp.sign(x_int))
    abs_int = jnp.minimum(jnp.abs(x_int), -b_int)
    t = abs_int + b_int
    y_int = sign * (t * t + c_int) if fast_poly else sign * exact_fma(t, t, c_int)
    scaling_factor = scaling_factor**2 * GELU_A
    y_int = floor_ste(y_int / 2**GELU_N)
    return y_int, scaling_factor * 2**GELU_N


def ibert_gelu_int(x_int, scaling_factor, fast_poly: bool = False):
    """I-BERT GELU core on integer tensors (ibert:220-235).

    Returns ``(y_int, out_scale)``; ``y_int = x_int * (erf_int + shift)``.
    """
    x_int = round_ste(x_int)  # snap fake-quant float noise to the true int
    # rdiv: the scale chain must be correctly rounded so the freeze-time f32
    # restatement (engine/freeze.py) reproduces it bit-for-bit on TPU
    sigmoid_int, sigmoid_scale = int_erf(x_int, rdiv(scaling_factor, GELU_K),
                                         fast_poly)
    shift_int = jax.lax.stop_gradient(jnp.floor(rdiv(1.0, sigmoid_scale)))
    y_int = x_int * (sigmoid_int + shift_int)
    out_scale = scaling_factor * sigmoid_scale / 2
    return y_int, out_scale


def ibert_gelu(x, scaling_factor):
    """I-BERT GELU on fake-quant floats; see :func:`ibert_gelu_int`."""
    y_int, out_scale = ibert_gelu_int(rdiv(x, scaling_factor), scaling_factor)
    return y_int * out_scale, out_scale


def ibert_softmax_exp_int(x_int, scaling_factor, n_valid=None,
                          fast_q: bool = False, fast_poly: bool = False):
    """First half of I-BERT softmax on integer tensors (ibert:304-309).

    ``n_valid``: padded columns (token-aligned engine layout) are excluded
    from the max and produce exactly zero exp."""
    x_int = round_ste(x_int)  # snap fake-quant float noise to the true int
    mask = None
    if n_valid is not None and n_valid != x_int.shape[-1]:
        col = jax.lax.broadcasted_iota(jnp.int32, x_int.shape, x_int.ndim - 1)
        mask = col < n_valid
        x_int = jnp.where(mask, x_int, -(2.0**23))
    x_int_max = jnp.max(x_int, axis=-1, keepdims=True)
    x_int = x_int - x_int_max
    exp_int, exp_scale = int_exp(x_int, scaling_factor, fast_q=fast_q,
                                 fast_poly=fast_poly)
    if mask is not None:
        exp_int = jnp.where(mask, exp_int, 0.0)
    return exp_int, exp_scale


def ibert_softmax_exp(x, scaling_factor):
    """First half of I-BERT softmax (ibert:304-309): shifted integer exp.

    Returns ``(exp_int, exp_scale)``; the caller requantizes through a 16-bit
    QuantAct and finishes with :func:`ibert_softmax_normalize`.
    """
    return ibert_softmax_exp_int(rdiv(x, scaling_factor), scaling_factor)


def ibert_softmax_normalize(exp_int, output_bit: int, dtype=jnp.float32):
    """Second half of I-BERT softmax (ibert:312-319): 2**32 reciprocal trick."""
    exp_int_sum = exact_int_sum(exp_int)
    # pack_rows: per-row reciprocal chain, lane-packed (bit-identical
    # relayout; see ops/quant.pack_rows)
    factor = pack_rows(lambda s: floor_ste(rdiv(2.0**32, s)), exp_int_sum)
    out_int = floor_ste(exp_int * factor / 2 ** (32 - output_bit + 1))
    out_scale = jnp.asarray([2.0 / 2**output_bit], dtype=dtype)
    return out_int * out_scale, out_scale


def int_bitlength_sqrt(n, iters: int = 4):
    """Vectorized integer sqrt, bit-length seed + Newton (ibert:85-109)."""
    mask = n > 0
    n = jnp.clip(n, 0, None)
    bits = jnp.floor(jnp.log2(jnp.clip(n, 1, None))) + 1
    x = pow2(jnp.ceil(bits / 2))
    for _ in range(iters):
        inv = floor_ste(rdiv(n, jnp.clip(x, 1, None)))
        x = floor_ste((x + inv) / 2)
    return jnp.where(mask, x, jnp.zeros_like(x))


def ibert_layernorm_int(x_int, weight, bias, shift,
                        overflow_handling: bool = True,
                        use_int_sqrt: bool = False):
    """I-BERT LayerNorm core on integer tensors (ibert:112-158).

    ``shift`` is the persisted overflow shift (scalar array, power-of-two
    exponent).  Returns ``(y_int, out_scale, new_shift)``; callers write
    ``new_shift`` back to their state when training with overflow handling.
    """
    dim = x_int.shape[-1]
    dim_sqrt = jnp.sqrt(jnp.asarray(dim, dtype=jnp.float32))

    x_int = round_ste(x_int)  # snap fake-quant float noise to the true int
    # rdiv, not jnp.mean: XLA strength-reduces the mean's divide-by-C into a
    # 1-ulp-sloppy reciprocal multiply under jit, flipping round() ties.
    # pack_rows: per-row scalar chain, lane-packed (bit-identical relayout)
    mean_int = pack_rows(
        lambda s: round_ste(rdiv(s, jnp.float32(dim))), exact_int_sum(x_int))
    y_int = x_int - mean_int

    def _var(s):
        y_shifted = floor_ste(y_int / pow2(s))
        return exact_sq_sum(y_shifted)

    var_int = _var(shift)
    if overflow_handling:
        # branchless re-derivation of set_shift (ibert:69-76): needed shift so
        # that var/2**(2*shift) < 2**32, taken as a max over the batch.
        raw_var = exact_sq_sum(y_int)
        needed = jnp.ceil(jnp.log2(jnp.sqrt(
            jax.lax.stop_gradient(raw_var) / 2.0**32)))
        needed = jnp.max(needed)
        overflow = jnp.max(var_int) >= 2.0**32
        new_shift = jnp.where(overflow, jnp.maximum(shift, needed), shift)
        var_int = _var(new_shift)
    else:
        new_shift = shift

    def _factor(v):
        if use_int_sqrt:
            std = floor_ste(int_bitlength_sqrt(v)) * pow2(new_shift)
        else:
            std = floor_ste(jnp.sqrt(v)) * pow2(new_shift)
        return floor_ste(rdiv(2.0**31, std))
    factor = pack_rows(_factor, var_int)
    y_int = floor_ste(y_int * factor / 2)
    out_scale = dim_sqrt / 2.0**30

    w = jax.lax.stop_gradient(weight)
    b = jax.lax.stop_gradient(bias)
    bias_int = jnp.floor(rdiv(rdiv(b, w), out_scale))
    y_int = y_int + bias_int
    out_scale = out_scale * weight
    return y_int, out_scale, new_shift


def ibert_layernorm(x, scaling_factor, weight, bias, shift,
                    overflow_handling: bool = True,
                    use_int_sqrt: bool = False):
    """I-BERT LayerNorm on fake-quant floats; see :func:`ibert_layernorm_int`.

    Returns ``(x_out, out_scale, new_shift, y_int)`` — the exact integer
    rides along for the following QuantAct (ops/quant._requant_exact).
    """
    y_int, out_scale, new_shift = ibert_layernorm_int(
        x / scaling_factor, weight, bias, shift,
        overflow_handling=overflow_handling, use_int_sqrt=use_int_sqrt)
    return y_int * out_scale, out_scale, new_shift, y_int
