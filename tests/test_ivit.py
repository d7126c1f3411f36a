"""Tests for the I-ViT integer nonlinearities (ops/ivit.py).

Follows the reference's golden-model comparison methodology
(scripts/gelu_approx_analysis.py:74-117): evaluate over the dense 8-bit input
grid and bound the approximation error against the float function, plus exact
int64 golden re-statements of the shift formulas.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import erf

from ivit_tpu.ops import ivit


def _golden_int_exp_shift(x_int, s, n):
    """numpy float32 restatement of ivit_modules.py:89-103.

    float32 deliberately: the reference runs these formulas on torch float32
    tensors, so divisions like ``x_int / x0_int`` carry f32 rounding at exact
    multiples — int64 math would *differ* from the reference there.
    """
    x_int = x_int.astype(np.float32)
    x_int = x_int + np.floor(x_int / np.float32(2)) - np.floor(x_int / np.float32(16))
    x0 = np.float32(np.floor(-1.0 / s))
    x_int = np.maximum(x_int, n * x0)
    q_ = np.floor(x_int / x0)
    r = x_int - x0 * q_
    exp = r / np.float32(2) - x0
    exp = np.clip(np.floor(exp * np.exp2(np.float32(n) - q_)), 0, None)
    return exp


def test_int_exp_shift_matches_golden():
    s = np.float32(0.05)
    x_int = np.arange(-512, 1)
    got, out_s = ivit.int_exp_shift(jnp.asarray(x_int, jnp.float32),
                                    jnp.asarray(s), n=15)
    want = _golden_int_exp_shift(x_int, s, 15)
    np.testing.assert_array_equal(np.asarray(got), want)
    np.testing.assert_allclose(float(out_s), s / 2**15, rtol=1e-6)


def test_shiftmax_rows_sum_to_one(rng):
    s = np.float32(0.06)
    x = (rng.integers(-127, 128, size=(4, 8, 50)) * s).astype(np.float32)
    y, out_s = ivit.shiftmax(jnp.asarray(x), jnp.asarray([s]), output_bit=8)
    sums = np.asarray(jnp.sum(y, axis=-1))
    # each of ~N active probabilities floors away up to 1/128: rows undershoot
    assert np.all(sums <= 1.0 + 1e-5) and np.all(sums > 0.8), sums
    assert float(out_s[0]) == 1.0 / 128
    # all probabilities on the fixed grid and non-negative
    ints = np.asarray(y) * 128
    np.testing.assert_allclose(ints, np.round(ints), atol=1e-4)
    assert np.all(ints >= 0)


def test_shiftmax_vs_float_softmax(rng):
    s = np.float32(0.05)
    x = (rng.integers(-127, 128, size=(16, 197)) * s).astype(np.float32)
    y, _ = ivit.shiftmax(jnp.asarray(x), jnp.asarray([s]), output_bit=8)
    ref = jax.nn.softmax(jnp.asarray(x), axis=-1)
    err = np.abs(np.asarray(y) - np.asarray(ref))
    # I-ViT paper-level fidelity: shiftmax within ~2 quantization steps
    assert err.max() < 0.03, err.max()


def _golden_shift_gelu(x, s, bit=8, n=23):
    """numpy float32 restatement of ivit_modules.py:105-126."""
    f32 = np.float32
    pre = np.round(x / s)
    ssig = s * f32(1.702)
    mx = pre.max(-1, keepdims=True)
    ei = _golden_int_exp_shift(pre - mx, ssig, n)
    em = _golden_int_exp_shift(-mx, ssig, n)
    esum = np.minimum(ei + em, 2**31 - 1)
    factor = np.floor((2**31 - 1) / esum)
    sig = np.floor(ei * factor / 2 ** (31 - bit + 1))
    return pre * sig * (s * f32(1.0 / 2 ** (bit - 1)))


def test_shift_gelu_matches_golden_and_float():
    s = np.float32(0.05)
    x_int = np.arange(-128, 128, dtype=np.float32)
    x = (x_int * s).astype(np.float32).reshape(1, -1)
    y, out_s = ivit.shift_gelu(jnp.asarray(x), jnp.asarray([s]), output_bit=8)
    # bit-faithful vs the reference formulas
    want = _golden_shift_gelu(x, s)
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-4)
    # approximation quality vs true GELU: the sigmoid saturation flooring
    # costs up to ~4% relative near the row max (genuine reference behavior)
    ref = x * 0.5 * (1 + erf(x / np.sqrt(2)))
    err = np.abs(np.asarray(y)[0] - ref[0])
    assert err.max() < 0.25, err.max()
    assert err.mean() < 0.03, err.mean()


def test_i_layernorm_vs_float_layernorm(rng):
    s = np.float32(0.04)
    c = 192
    x = (rng.integers(-127, 128, size=(2, 8, c)) * s).astype(np.float32)
    w = jnp.asarray(rng.uniform(0.5, 1.5, size=c).astype(np.float32))
    b = jnp.asarray(rng.normal(size=c).astype(np.float32) * 0.1)
    y, out_s, _ = ivit.i_layernorm(jnp.asarray(x), jnp.asarray([s]), w, b)

    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    ref = (x - mean) / np.sqrt(var + 1e-6) * np.asarray(w) + np.asarray(b)
    err = np.abs(np.asarray(y) - ref)
    assert err.max() < 0.05, err.max()
    # output is on the per-channel grid
    ints = np.asarray(y) / np.asarray(out_s)
    np.testing.assert_allclose(ints, np.round(ints), atol=1e-2)


def test_int_newton_sqrt_converges():
    # 10 floor-Newton iterations seeded at 2**16 (ivit_modules.py:45-49)
    # reach floor(sqrt)+-1 only for var >= ~2**12 (halving covers 10 octaves);
    # LayerNorm variances (sum of squares over >=192 channels) always are.
    v = jnp.asarray([480000.0, 2.0**20, 2.0**30, 2.0**38, 123456789.0])
    k = ivit.int_newton_sqrt(v)
    want = np.floor(np.sqrt(np.asarray(v)))
    assert np.all(np.abs(np.asarray(k) - want) <= 1.0), np.asarray(k)
    # tiny-variance behavior matches the reference: monotone halving from 2**16
    small = ivit.int_newton_sqrt(jnp.asarray([0.0]))
    assert float(small[0]) == 64.0


def test_gradients_flow_through_shiftmax(rng):
    s = jnp.asarray([0.05])
    x = jnp.asarray(rng.normal(size=(2, 10)).astype(np.float32))
    g = jax.grad(lambda a: jnp.sum(ivit.shiftmax(a, s)[0] ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
