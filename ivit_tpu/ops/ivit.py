"""I-ViT integer nonlinearities: Shiftmax, ShiftGELU, I-LayerNorm.

Functional JAX re-implementations of
``/root/reference/models/quantization_utils/ivit_modules.py`` (I-ViT, ICCV'23).

Each nonlinearity has two entry points sharing one formula body:

* ``*_int`` — the integer-domain core: takes the integer tensor ``x_int``
  (held in float32; every value and intermediate is integer-exact, powers of
  two applied via the exact ``pow2`` bit trick) plus its scale, returns the
  integer output and the output scale.  This is what the deployment engine
  traces, with Pallas fusions swapped in underneath.
* the fake-quant wrapper — takes ``x = x_int * scale`` floats, used by the
  QAT flax graph; differentiable through the straight-through estimators.

Reference quirks intentionally preserved:
* ``int_exp_shift``'s ``x + (x>>1) - (x>>4)`` approximates ``x * log2(e)``
  (ivit_modules.py:91,151).
* GELU uses ``sigmoid(1.702 x)``'s exp trick with n=23; softmax uses n=15.
* LayerNorm runs a 10-iteration integer Newton sqrt seeded at 2**16
  (ivit_modules.py:45-49).
Reference quirks *not* preserved: the hard-coded reduction ``axis=2`` in
LayerNorm is generalized to ``axis=-1``; the device-specific ``.cuda()``
calls are gone.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quant import (exact_int_sum, exact_sq_sum, floor_div_int, floor_ste,
                    pack_rows, pow2, rdiv, round_ste)

INT32_MAX = 2.0**31 - 1


def int_exp_shift(x_int, scaling_factor, n: int, fast_q: bool = False):
    """Shift-based integer exp: 2**(x * log2 e) by quotient/remainder split.

    Mirrors ivit_modules.py:89-103 (GELU, n=23) and :150-162 (softmax, n=15).
    ``x_int`` is an integer-valued float tensor (<= 0 after max subtraction),
    ``scaling_factor`` its positive scale.  Returns (exp_int, scale / 2**n).

    ``fast_q`` (engine-only, freeze-gated by ``quant.exp_fastdiv_ok``):
    compute the per-element quotient with the divide-free exact
    ``floor_div_int`` — identical values, ~3x cheaper on the VPU.  The QAT
    sim keeps the rdiv form (its STE gradient path).
    """
    x_int = x_int + floor_ste(x_int / 2) - floor_ste(x_int / 2**4)

    x0_int = jax.lax.stop_gradient(jnp.floor(rdiv(-1.0, scaling_factor)))
    x_int = jnp.maximum(x_int, n * x0_int)

    if fast_q:
        q = floor_div_int(x_int, x0_int)
    else:
        q = floor_ste(rdiv(x_int, x0_int))
    r = x_int - x0_int * q
    exp_int = r / 2 - x0_int
    exp_int = jnp.clip(floor_ste(exp_int * pow2(n - q)), 0, None)
    return exp_int, scaling_factor / 2**n


# ---------------------------------------------------------------------------
# Integer-domain cores
# ---------------------------------------------------------------------------

def _pad_mask(shape, n_valid):
    col = jax.lax.broadcasted_iota(jnp.int32, shape, dimension=len(shape) - 1)
    return col < n_valid


def shiftmax_int(x_int, scaling_factor, output_bit: int = 8, n_valid=None,
                 fast_q: bool = False):
    """Shiftmax core (ivit_modules.py:164-179) on integer tensors.

    Returns ``(probs_int, out_scale)`` with probs in [0, 2**(bit-1)] and
    fixed ``out_scale = 2**-(bit-1)``.  ``n_valid``: when the last axis is
    padded (token-aligned engine layout), columns >= n_valid are excluded
    from the max and contribute exactly zero probability — results on valid
    columns are bit-identical to the unpadded computation.
    """
    x_int = round_ste(x_int)  # snap fake-quant float noise to the true int
    if n_valid is not None and n_valid != x_int.shape[-1]:
        mask = _pad_mask(x_int.shape, n_valid)
        x_int = jnp.where(mask, x_int, -(2.0**23))
    x_int_max = jnp.max(x_int, axis=-1, keepdims=True)
    x_int = x_int - x_int_max

    exp_int, _ = int_exp_shift(x_int, scaling_factor, n=15, fast_q=fast_q)
    if n_valid is not None and n_valid != x_int.shape[-1]:
        exp_int = jnp.where(mask, exp_int, 0.0)
    exp_int_sum = jnp.minimum(exact_int_sum(exp_int), INT32_MAX)

    factor = pack_rows(lambda s: floor_ste(rdiv(INT32_MAX, s)), exp_int_sum)
    probs_int = floor_ste(exp_int * factor / 2 ** (31 - output_bit + 1))
    out_scale = jnp.asarray([1.0 / 2 ** (output_bit - 1)], dtype=jnp.float32)
    return probs_int, out_scale


def shift_gelu_int(pre_x_int, scaling_factor, output_bit: int = 8, n: int = 23,
                   fast_q: bool = False):
    """ShiftGELU core (ivit_modules.py:105-126) on integer tensors.

    Returns ``(y_int, out_scale)`` with ``out_scale = scale * 2**-(bit-1)``;
    ``y_int = x_int * sigmoid_int`` can reach ~2**15.
    """
    scaling_factor_sig = scaling_factor * 1.702

    pre_x_int = round_ste(pre_x_int)  # snap fake-quant float noise
    x_int_max = jnp.max(pre_x_int, axis=-1, keepdims=True)
    x_int = pre_x_int - x_int_max

    exp_int, _ = int_exp_shift(x_int, scaling_factor_sig, n=n,
                               fast_q=fast_q)                        # e^(x-max)
    exp_int_max, _ = int_exp_shift(-x_int_max, scaling_factor_sig, n=n,
                                   fast_q=fast_q)                    # e^(-max)
    exp_int_sum = jnp.minimum(exp_int + exp_int_max, INT32_MAX)

    factor = floor_ste(rdiv(INT32_MAX, exp_int_sum))
    sigmoid_int = floor_ste(exp_int * factor / 2 ** (31 - output_bit + 1))
    sigmoid_scale = jnp.asarray([1.0 / 2 ** (output_bit - 1)], dtype=jnp.float32)

    y_int = pre_x_int * sigmoid_int
    out_scale = scaling_factor * sigmoid_scale
    return y_int, out_scale


def int_newton_sqrt(var_int, iters: int = 10, k0: float = 2.0**16):
    """Integer Newton-Raphson sqrt: k <- floor((k + floor(v/k)) / 2).

    Mirrors ivit_modules.py:45-49 (10 iterations, init 2**16).
    """
    k = jnp.full_like(var_int, k0)
    for _ in range(iters):
        k = floor_ste((k + floor_ste(rdiv(var_int, k))) / 2)
    return k


def i_layernorm_int(x_int, weight, bias):
    """I-LayerNorm core (ivit_modules.py:30-65) on integer tensors.

    Input-scale-free: the reference's ``x_int = x / s`` is the caller's job.
    Returns ``(y_int, out_scale)`` with per-channel
    ``out_scale = sqrt(C)/2**30 * weight``; ``y_int`` reaches ~2**26.
    """
    dim = x_int.shape[-1]
    dim_sqrt = jnp.sqrt(jnp.asarray(dim, dtype=jnp.float32))

    x_int = round_ste(x_int)  # snap fake-quant float noise to the true int
    # rdiv, not jnp.mean: XLA strength-reduces the mean's divide-by-C into a
    # 1-ulp-sloppy reciprocal multiply under jit, flipping round() ties.
    # pack_rows: the mean round and the Newton+factor chain are per-row
    # scalar chains — run them lane-packed (bit-identical relayout).
    mean_int = pack_rows(
        lambda s: round_ste(rdiv(s, jnp.float32(dim))), exact_int_sum(x_int))
    y_int = x_int - mean_int
    var_int = exact_sq_sum(y_int)

    factor = pack_rows(
        lambda v: floor_ste(rdiv(INT32_MAX, int_newton_sqrt(v))), var_int)
    y_int = floor_ste(y_int * factor / 2)
    out_scale = dim_sqrt / 2.0**30

    # fold bias through the per-channel weight, add in integer domain
    w = jax.lax.stop_gradient(weight)
    b = jax.lax.stop_gradient(bias)
    bias_int = jnp.floor(rdiv(rdiv(b, w), out_scale))
    y_int = y_int + bias_int
    out_scale = out_scale * weight
    return y_int, out_scale


# ---------------------------------------------------------------------------
# Fake-quant wrappers (QAT graph)
# ---------------------------------------------------------------------------

def shiftmax(x, scaling_factor, output_bit: int = 8):
    """Shiftmax on fake-quant floats; see :func:`shiftmax_int`."""
    probs_int, out_scale = shiftmax_int(rdiv(x, scaling_factor), scaling_factor,
                                        output_bit)
    return probs_int * out_scale.astype(x.dtype), out_scale.astype(x.dtype)


def shift_gelu(x, scaling_factor, output_bit: int = 8, n: int = 23):
    """ShiftGELU on fake-quant floats; see :func:`shift_gelu_int`."""
    y_int, out_scale = shift_gelu_int(rdiv(x, scaling_factor), scaling_factor,
                                      output_bit, n)
    return y_int * out_scale, out_scale


def i_layernorm(x, scaling_factor, weight, bias):
    """I-LayerNorm on fake-quant floats; see :func:`i_layernorm_int`.

    Returns ``(x_out, out_scale, y_int)`` — the exact integer rides along
    so the following QuantAct requants from it directly (LN ints are
    ~2**30, beyond f32-exact; see ops/quant._requant_exact).
    """
    y_int, out_scale = i_layernorm_int(rdiv(x, scaling_factor), weight, bias)
    return y_int * out_scale, out_scale, y_int
