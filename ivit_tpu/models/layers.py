"""Quantized primitive layers (flax.linen).

TPU-native re-design of the reference primitive modules
(``/root/reference/models/quantization_utils/quant_modules.py``):

* every module keeps the reference's ``(tensor, scaling_factor)`` protocol,
  where the tensor is a fake-quantized float (exactly ``int * scale``),
* activation-range EMA state lives in the ``'quant_stats'`` flax collection
  (the analogue of the reference's registered buffers); passing
  ``running_stat=True`` with ``mutable=['quant_stats']`` updates ranges
  (reference ``fix()``/``unfix()`` <-> running_stat False/True),
* layouts are TPU-first: activations are ``[..., C]`` (channels-last), linear
  kernels are ``[in, out]``, conv kernels ``[kh, kw, cin, cout]`` (NHWC), so
  every per-channel scale broadcasts on the last axis and GEMMs hit the MXU
  without transposes.

The integer-only deployment path (Pallas kernels, real int8 arrays) lives in
``ivit_tpu.engine`` and consumes the same parameters/state.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import ibert as ibert_ops
from ..ops import ivit as ivit_ops
from ..ops import quant as q
from ..ops.ppoly import eval_piecewise_poly


def _reduce_all_but_last(x, op):
    return op(x, axis=tuple(range(x.ndim - 1)))


class QuantAct(nn.Module):
    """Activation (re)quantizer with running-range EMA.

    Mirrors reference ``QuantAct`` (quant_modules.py:229-387): EMA momentum
    0.95 (``-1`` selects running min/max), first-batch initialization,
    optional percentile or per-channel ranges, and the dyadic
    ``fixedpoint_mul`` requantization with optional fused residual
    (``identity``) branch.
    """

    activation_bit: int = 8
    act_range_momentum: float = 0.95
    per_channel: bool = False
    channel_len: Optional[int] = None
    percentile: Optional[float] = None

    @nn.compact
    def __call__(self, x, pre_scale=None, identity=None, identity_scale=None,
                 *, running_stat: bool = False,
                 specified_min=None, specified_max=None, exact_int=None):
        shape = (self.channel_len,) if self.per_channel else (1,)
        x_min_v = self.variable("quant_stats", "x_min",
                                lambda: jnp.zeros(shape, jnp.float32))
        x_max_v = self.variable("quant_stats", "x_max",
                                lambda: jnp.zeros(shape, jnp.float32))
        # kept for checkpoint parity with the reference buffer
        scale_v = self.variable("quant_stats", "act_scaling_factor",
                                lambda: jnp.zeros(shape, jnp.float32))

        if running_stat:
            x_act = jax.lax.stop_gradient(x if identity is None else x + identity)
            if self.percentile is None:
                if self.per_channel:
                    cur_min = _reduce_all_but_last(x_act, jnp.min)
                    cur_max = _reduce_all_but_last(x_act, jnp.max)
                else:
                    cur_min = jnp.min(x_act).reshape(1)
                    cur_max = jnp.max(x_act).reshape(1)
            else:
                p_lo = (100.0 - self.percentile) / 2.0
                p_hi = 100.0 - p_lo
                if self.per_channel:
                    flat = x_act.reshape(-1, x_act.shape[-1])
                    cur_min = jnp.quantile(flat, p_lo / 100.0, axis=0)
                    cur_max = jnp.quantile(flat, p_hi / 100.0, axis=0)
                else:
                    flat = x_act.reshape(-1)
                    cur_min = jnp.quantile(flat, p_lo / 100.0).reshape(1)
                    cur_max = jnp.quantile(flat, p_hi / 100.0).reshape(1)

            uninit = jnp.all(x_min_v.value == x_max_v.value)
            if self.act_range_momentum == -1:
                upd_min = jnp.minimum(x_min_v.value, cur_min)
                upd_max = jnp.maximum(x_max_v.value, cur_max)
            else:
                m = self.act_range_momentum
                # contraction-pinned EMA: unpinned products made the stored
                # range (hence every downstream scale) context-dependent
                upd_min = q.ema_update(x_min_v.value, cur_min, m)
                upd_max = q.ema_update(x_max_v.value, cur_max, m)
            x_min_v.value = jnp.where(uninit, x_min_v.value + cur_min, upd_min)
            x_max_v.value = jnp.where(uninit, x_max_v.value + cur_max, upd_max)

        x_min = x_min_v.value if specified_min is None else specified_min
        x_max = x_max_v.value if specified_max is None else specified_max

        scale = q.symmetric_quant_params(self.activation_bit, x_min, x_max)
        if running_stat:
            scale_v.value = scale

        if pre_scale is None:
            out = q.fake_quantize(x, self.activation_bit, scale)
        else:
            out = q.fixedpoint_requant(
                x, pre_scale, self.activation_bit, scale,
                identity=identity, identity_scale=identity_scale,
                exact_int=exact_int)
        return out, scale


class QuantLinear(nn.Module):
    """Linear layer with per-output-channel symmetric weight quantization.

    Mirrors reference ``QuantLinear`` (quant_modules.py:131-226): weight scale
    recomputed from the float shadow weights every forward, bias quantized at
    ``s_w * s_act`` (32-bit), scalar input scale required, output carries the
    per-channel ``bias_scaling_factor``.
    """

    out_features: int
    use_bias: bool = True
    weight_bit: int = 8
    bias_bit: int = 32
    per_channel: bool = True

    @nn.compact
    def __call__(self, x, pre_scale):
        in_features = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.truncated_normal(0.02),
                            (in_features, self.out_features))
        bias = (self.param("bias", nn.initializers.zeros, (self.out_features,))
                if self.use_bias else None)

        w = jax.lax.stop_gradient(kernel)
        if self.per_channel:
            w_min = jnp.min(w, axis=0)
            w_max = jnp.max(w, axis=0)
        else:
            w_min = jnp.min(w).reshape(1)
            w_max = jnp.max(w).reshape(1)
        fc_scale = q.symmetric_quant_params(self.weight_bit, w_min, w_max)

        w_int = q.quantize_int(kernel, self.weight_bit, fc_scale[None, :])
        bias_scale = fc_scale * pre_scale.reshape(-1)

        # Snap to the exact int: the rdiv roundtrip of a fake-quant float can
        # sit 1 ulp off an integer, which makes the matmul's partial products
        # inexact and the accumulation reduction-order (i.e. compilation
        # context) dependent.  With exact-int operands every partial sum is
        # exactly representable in f32 (the envelope audit asserts acc < 2**24),
        # so the sim is bit-stable across eager/jit/fusion and bit-equal to
        # the engine's int32 accumulation.
        x_int = q.round_ste(q.rdiv(x, pre_scale))
        out = jnp.matmul(x_int, w_int)
        if bias is not None:
            b_int = q.quantize_int(bias, self.bias_bit, bias_scale)
            out = out + b_int
        return out * bias_scale, bias_scale


class QuantConv2d(nn.Module):
    """NHWC conv with per-output-channel weight quantization.

    Mirrors reference ``QuantConv2d`` (quant_modules.py:412-512); used for the
    patch embedding, where stride == kernel (the engine lowers it to a single
    int8 GEMM over extracted patches).
    """

    features: int
    kernel_size: tuple
    strides: tuple
    use_bias: bool = True
    weight_bit: int = 8
    bias_bit: int = 32

    @nn.compact
    def __call__(self, x, pre_scale):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.truncated_normal(0.02),
                            (kh, kw, cin, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)

        w = jax.lax.stop_gradient(kernel).reshape(-1, self.features)
        w_min = jnp.min(w, axis=0)
        w_max = jnp.max(w, axis=0)
        conv_scale = q.symmetric_quant_params(self.weight_bit, w_min, w_max)

        w_int = q.quantize_int(kernel, self.weight_bit,
                               conv_scale.reshape(1, 1, 1, -1))
        bias_scale = conv_scale * pre_scale.reshape(-1)

        # exact-int snap — see QuantLinear for why this is required for
        # bit-stability across compilation contexts
        x_int = q.round_ste(q.rdiv(x, pre_scale))
        out = jax.lax.conv_general_dilated(
            x_int, w_int, window_strides=self.strides, padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            b_int = q.quantize_int(bias, self.bias_bit, bias_scale)
            out = out + b_int
        return out * bias_scale, bias_scale


def quant_matmul(a, scale_a, b, scale_b):
    """Integer-valued matmul of two quantized activations.

    Mirrors reference ``QuantMatMul`` (quant_modules.py:390-409):
    ``(A/sA) @ (B/sB) * (sA*sB)``.
    """
    # exact-int snap — see QuantLinear for why this is required for
    # bit-stability across compilation contexts
    a_int = q.round_ste(q.rdiv(a, scale_a))
    b_int = q.round_ste(q.rdiv(b, scale_b))
    out_scale = (scale_a * scale_b).reshape(-1)
    return jnp.matmul(a_int, b_int) * out_scale, out_scale


# ---------------------------------------------------------------------------
# Nonlinearity wrapper modules (the layer_selection registry targets)
# ---------------------------------------------------------------------------

class IVITGELU(nn.Module):
    """ShiftGELU wrapper (ivit_modules.py:68-126)."""
    output_bit: int = 8
    n: int = 23

    def __call__(self, x, scaling_factor, *, running_stat: bool = False):
        return ivit_ops.shift_gelu(x, scaling_factor, self.output_bit, self.n)


class IVITSoftmax(nn.Module):
    """Shiftmax wrapper (ivit_modules.py:129-179)."""
    output_bit: int = 8

    def __call__(self, x, scaling_factor, *, running_stat: bool = False):
        return ivit_ops.shiftmax(x, scaling_factor, self.output_bit)


class IVITLayerNorm(nn.Module):
    """I-LayerNorm wrapper (ivit_modules.py:10-65).

    Returns ``(x, scale, y_int)``; callers thread ``y_int`` into the next
    QuantAct as ``exact_int`` (LN ints exceed the f32-exact envelope)."""
    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, scaling_factor, *, running_stat: bool = False):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return ivit_ops.i_layernorm(x, scaling_factor, weight, bias)


class IBERTGELU(nn.Module):
    """I-BERT polynomial GELU wrapper (ibert_modules.py:161-235)."""

    def __call__(self, x, scaling_factor, *, running_stat: bool = False):
        return ibert_ops.ibert_gelu(x, scaling_factor)


class _ExpRangeAct(nn.Module):
    """16-bit requantizer for I-BERT softmax's raw exp integers.

    State layout matches the reference's internal ``QuantAct`` buffers
    (``int_softmax.act.{x_min,x_max,act_scaling_factor}``) so checkpoints
    round-trip, but the requant is the single-rounding
    ``round(exp_int * m)`` with ``m`` the correctly-rounded f32 reciprocal
    of ``s_act`` — one VPU multiply per element.  The reference's float64
    ``fixedpoint_mul`` (31-bit dyadic mantissa) and a correctly-rounded
    divide both differ from this by at most 1 ulp of the scaled value
    (~2**-9 relative at the 16-bit range), i.e. tie-level only — the same
    order as the reference's own 31-bit-mantissa rounding.  The multiply
    form is what the fused kernels run per element (a correctly-rounded
    divide costs ~40 VPU ops there), and sim == engine == kernels must be
    bit-identical, so all three use it.
    """

    @nn.compact
    def __call__(self, exp_int, *, running_stat: bool = False):
        x_min_v = self.variable("quant_stats", "x_min",
                                lambda: jnp.zeros((1,), jnp.float32))
        x_max_v = self.variable("quant_stats", "x_max",
                                lambda: jnp.zeros((1,), jnp.float32))
        scale_v = self.variable("quant_stats", "act_scaling_factor",
                                lambda: jnp.zeros((1,), jnp.float32))
        if running_stat:
            sg = jax.lax.stop_gradient(exp_int)
            cur_min = jnp.min(sg).reshape(1)
            cur_max = jnp.max(sg).reshape(1)
            uninit = jnp.all(x_min_v.value == x_max_v.value)
            m = 0.95
            # contraction-pinned EMA (ops/quant.ema_update): the exp ranges
            # sit at ~2**50 where an unpinned mul+add tie-breaks differently
            # per compilation context (found by tests/test_chunked.py)
            x_min_v.value = jnp.where(uninit, x_min_v.value + cur_min,
                                      q.ema_update(x_min_v.value, cur_min, m))
            x_max_v.value = jnp.where(uninit, x_max_v.value + cur_max,
                                      q.ema_update(x_max_v.value, cur_max, m))
        s_act = q.symmetric_quant_params(16, x_min_v.value, x_max_v.value)
        if running_stat:
            scale_v.value = s_act
        m_exp = q.rdiv(1.0, s_act)      # scalar; per-element cost is one mul
        exp16 = jnp.clip(q.round_ste(exp_int * m_exp),
                         -(2.0**15), 2.0**15 - 1)
        return exp16, s_act


class IBERTSoftmax(nn.Module):
    """I-BERT softmax with internal 16-bit exp QuantAct (ibert:237-319)."""
    output_bit: int = 8

    @nn.compact
    def __call__(self, x, scaling_factor, *, running_stat: bool = False):
        exp_int, exp_scale = ibert_ops.ibert_softmax_exp(x, scaling_factor)
        exp16, _ = _ExpRangeAct(name="act")(exp_int, running_stat=running_stat)
        return ibert_ops.ibert_softmax_normalize(exp16, self.output_bit,
                                                 dtype=x.dtype)


class IBERTLayerNorm(nn.Module):
    """I-BERT LayerNorm with dynamic overflow shift state (ibert:12-158)."""
    features: int
    output_bit: int = 8
    eps: float = 1e-5
    use_int_sqrt: bool = False

    @nn.compact
    def __call__(self, x, scaling_factor, *, running_stat: bool = False):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        shift_v = self.variable("quant_stats", "shift",
                                lambda: jnp.zeros((1,), jnp.float32))
        # overflow handling active exactly when ranges are running (ref
        # fix()/unfix() toggles it, ibert_modules.py:63-67)
        y, out_scale, new_shift, y_int = ibert_ops.ibert_layernorm(
            x, scaling_factor, weight, bias, shift_v.value,
            overflow_handling=running_stat, use_int_sqrt=self.use_int_sqrt)
        if running_stat:
            shift_v.value = new_shift.reshape(1)
        return y, out_scale, y_int


class FloatGELU(nn.Module):
    """Float golden GELU with quantized output (layer_selection.py:11-37)."""
    bitwidth: int = 8

    def __call__(self, x, scaling_factor, *, running_stat: bool = False):
        y = jax.nn.gelu(x, approximate=False)
        qmin = -(2 ** (self.bitwidth - 1))
        qmax = 2 ** (self.bitwidth - 1) - 1
        y_int = jnp.clip(q.floor_ste(y / scaling_factor), qmin, qmax)
        return y_int * scaling_factor, scaling_factor


class FloatSoftmax(nn.Module):
    """Float golden softmax with quantized output (layer_selection.py:40-67)."""
    bitwidth: int = 8

    def __call__(self, x, scaling_factor, *, running_stat: bool = False):
        y = jax.nn.softmax(x, axis=-1)
        out_scale = jnp.asarray([2.0 / 2**self.bitwidth], dtype=x.dtype)
        qmax = 2 ** (self.bitwidth - 1) - 1
        y_int = jnp.clip(q.floor_ste(y / out_scale), 0, qmax)
        return y_int * out_scale, out_scale


class FloatLayerNorm(nn.Module):
    """Float golden LayerNorm with quantized output (layer_selection.py:70-113)."""
    features: int
    eps: float = 1e-5
    bitwidth: int = 8

    @nn.compact
    def __call__(self, x, scaling_factor, *, running_stat: bool = False):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * weight + bias

        dim_sqrt = jnp.sqrt(jnp.asarray(x.shape[-1], dtype=x.dtype))
        out_scale = dim_sqrt / 2.0**30 * weight
        qmin = -(2 ** (self.bitwidth - 1))
        qmax = 2 ** (self.bitwidth - 1) - 1
        y_int = jnp.clip(q.floor_ste(y / out_scale), qmin, qmax)
        return y_int * out_scale, out_scale, y_int


# ---------------------------------------------------------------------------
# Piecewise-polynomial nonlinearities
# ---------------------------------------------------------------------------

class PPolyGELU(nn.Module):
    """Piecewise-polynomial integer GELU (ppoly_modules.py:14-135).

    TPU re-design: coefficients are fitted host-side at calibration/freeze
    time (``ivit_tpu.train.ppoly_fit``) into ``'quant_stats'`` buffers; the
    forward evaluates the fitted table with a float-GELU straight-through
    gradient.  Before fitting, the backend golden function is used directly
    (the reference refits from batch statistics on every unfixed forward —
    a host round-trip we deliberately avoid).
    """

    output_bit: int = 8
    scale_bits: int = 22
    seg: int = 16
    deg: int = 2
    backend: str = "ibert"
    alpha: float = 0.0
    optim_bounds: bool = True

    @nn.compact
    def __call__(self, x, scaling_factor, *, running_stat: bool = False):
        bounds_v = self.variable("quant_stats", "bounds",
                                 lambda: jnp.zeros((self.seg - 1,), jnp.int32))
        coeffs_v = self.variable("quant_stats", "coeffs",
                                 lambda: jnp.zeros((self.seg, self.deg + 1), jnp.int32))
        fitted_v = self.variable("quant_stats", "fitted",
                                 lambda: jnp.zeros((1,), jnp.float32))
        x_lo_v = self.variable("quant_stats", "x_lo",
                               lambda: jnp.zeros((1,), jnp.float32))
        x_hi_v = self.variable("quant_stats", "x_hi",
                               lambda: jnp.zeros((1,), jnp.float32))
        in_scale_v = self.variable("quant_stats", "in_scale",
                                   lambda: jnp.zeros((1,), jnp.float32))

        if running_stat:
            x_sg = jax.lax.stop_gradient(x)
            x_lo_v.value = jnp.minimum(x_lo_v.value, jnp.min(x_sg).reshape(1))
            x_hi_v.value = jnp.maximum(x_hi_v.value, jnp.max(x_sg).reshape(1))
            in_scale_v.value = jnp.reshape(scaling_factor, (-1,))[:1]

        s = scaling_factor
        if self.backend == "ibert":
            so = q.rdiv(s, ibert_ops.GELU_K) ** 2 * ibert_ops.GELU_A * (2**ibert_ops.GELU_N)
            out_scale = s * so / 2
        else:
            out_scale = s / (2.0**self.scale_bits)
        out_scale = jax.lax.stop_gradient(out_scale)

        # round_ste snap, not the reference's floor (ppoly_modules.py:106):
        # x is exactly fl(z*s), and floor of its correctly-rounded quotient
        # sits on a knife edge at integer z — any ulp-level perturbation of
        # the (possibly fusion-duplicated) producer flips it to z-1 (measured:
        # 3.8% of elements flipped eager-vs-jit at full model size).  The
        # snap recovers the true integer the engine receives, exactly like
        # every other family core (ops/ivit.py, ops/ibert.py).
        x_int = q.round_ste(q.rdiv(x, s))
        y_poly = eval_piecewise_poly(
            jax.lax.stop_gradient(x_int),
            bounds_v.value.astype(jnp.float32), coeffs_v.value)
        y_poly = y_poly / (2.0**self.scale_bits)

        # golden fallback value (pre-fit) — the backend function itself
        if self.backend == "ibert":
            y_golden, _ = ibert_ops.ibert_gelu(x, s)
        else:
            y_golden = jax.nn.gelu(x, approximate=False)
        y_val = jnp.where(fitted_v.value[0] > 0,
                          y_poly, jax.lax.stop_gradient(y_golden))

        # float-GELU straight-through gradient (ppoly_modules.py:124-133)
        y_float_gelu = jax.nn.gelu(x, approximate=False)
        y = jax.lax.stop_gradient(y_val) + (
            y_float_gelu - jax.lax.stop_gradient(y_float_gelu))
        # rdiv, not a bare divide: out_scale is not a power of two, and the
        # quotient feeds a floor (ops/quant.py doctrine; engine mirrors this
        # exact chain in vit_int._gelu_int's ppoly branch)
        y = out_scale * q.floor_ste(q.rdiv(y, out_scale))
        return y, out_scale


class PPolySoftmax(nn.Module):
    """Piecewise-polynomial integer softmax (ppoly_modules.py:137-343)."""

    output_bit: int = 8
    scale_bits: int = 28
    exp_bits: int = 16
    seg: int = 16
    deg: int = 2
    backend: str = "float"
    alpha: float = 0.0
    optim_bounds: bool = False

    @nn.compact
    def __call__(self, x, scaling_factor, *, running_stat: bool = False):
        bounds_v = self.variable("quant_stats", "bounds",
                                 lambda: jnp.zeros((self.seg - 1,), jnp.int32))
        coeffs_v = self.variable("quant_stats", "coeffs",
                                 lambda: jnp.zeros((self.seg, self.deg + 1), jnp.int32))
        fitted_v = self.variable("quant_stats", "fitted",
                                 lambda: jnp.zeros((1,), jnp.float32))
        x_lo_v = self.variable("quant_stats", "x_lo",
                               lambda: jnp.zeros((1,), jnp.float32))
        x_hi_v = self.variable("quant_stats", "x_hi",
                               lambda: jnp.zeros((1,), jnp.float32))
        in_scale_v = self.variable("quant_stats", "in_scale",
                                   lambda: jnp.zeros((1,), jnp.float32))

        s = jnp.reshape(scaling_factor, (-1,))[:1]
        # round_ste snap (not the reference's floor, ppoly_modules.py:302):
        # see PPolyGELU — recovers the true integer in every compilation
        # context instead of the knife-edge floor
        x_int = q.round_ste(q.rdiv(x, s))
        x_int_max = jnp.max(jax.lax.stop_gradient(x_int), axis=-1, keepdims=True)
        x_off = x_int - x_int_max + 127  # offset domain (ppoly_modules.py:306)

        if running_stat:
            off_sg = jax.lax.stop_gradient(x_off)
            x_lo_v.value = jnp.minimum(x_lo_v.value, jnp.min(off_sg).reshape(1))
            x_hi_v.value = jnp.maximum(x_hi_v.value, jnp.max(off_sg).reshape(1))
            in_scale_v.value = s

        exp_poly = eval_piecewise_poly(
            jax.lax.stop_gradient(x_off),
            bounds_v.value.astype(jnp.float32), coeffs_v.value)
        exp_poly = jnp.clip(exp_poly, 0, None)

        # golden fallback before fitting: float exp on the offset grid
        exp_golden = jnp.exp((jax.lax.stop_gradient(x_off) - 127) * s) * (2.0**self.scale_bits)
        exp_int = jnp.where(fitted_v.value[0] > 0, exp_poly, exp_golden)

        exp_int = jnp.floor(exp_int / 2 ** (30 - self.exp_bits + 1))
        exp_sum = jnp.clip(jnp.sum(exp_int, axis=-1, keepdims=True), 1.0, None)
        factor = jnp.floor(q.rdiv(2.0**32, exp_sum))
        softmax_int = jnp.floor(exp_int * factor / 2 ** (32 - self.output_bit + 1))

        out_scale = jnp.asarray([2.0 / 2**self.output_bit], dtype=x.dtype)
        y_val = softmax_int * out_scale

        # float-softmax straight-through gradient (ppoly_modules.py:326-336)
        y_float = jax.nn.softmax(x, axis=-1)
        y = jax.lax.stop_gradient(y_val) + (y_float - jax.lax.stop_gradient(y_float))
        y = out_scale * q.floor_ste(y / out_scale)
        return y, out_scale
