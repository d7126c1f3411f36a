"""Tests for the I-BERT polynomial nonlinearities (ops/ibert.py)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import erf

from ivit_tpu.ops import ibert


def test_int_exp_accuracy():
    s = np.float32(0.004)
    x_int = np.arange(-2000, 1, dtype=np.float32)
    e_int, e_s = ibert.int_exp(jnp.asarray(x_int), jnp.asarray(s))
    got = np.asarray(e_int) * float(np.asarray(e_s).reshape(-1)[0])
    want = np.exp(x_int * s)
    assert np.abs(got - want).max() < 5e-3


def _golden_ibert_gelu(x, s):
    """Faithful numpy float64 port of ibert_modules.py:161-235."""
    a, b, c = -0.2888, -1.769, 1.0 / -0.2888
    k, n = 1.4142, 6
    se = s / k
    x_int = x / s
    b_int = np.floor(b / se)
    c_int = np.floor(c / se**2)
    sign = np.sign(x_int)
    abs_int = np.minimum(np.abs(x_int), -b_int)
    y = sign * ((abs_int + b_int) ** 2 + c_int)
    sig_s = se**2 * a
    y = np.floor(y / 2**n)
    sig_s = sig_s * 2**n
    shift = np.floor(1.0 / sig_s)
    out = x_int * (y + shift)
    s_out = s * sig_s / 2
    return out * s_out, s_out


def test_ibert_gelu_matches_golden_and_float():
    s = np.float32(0.05)
    x = (np.arange(-128, 128, dtype=np.float32) * s).reshape(1, -1)
    y, _ = ibert.ibert_gelu(jnp.asarray(x), jnp.asarray([s]))
    # bit-faithful vs the reference formula (float64 golden)
    want, _ = _golden_ibert_gelu(x.astype(np.float64), float(s))
    np.testing.assert_allclose(np.asarray(y)[0], want[0], atol=1e-4)
    # approximation quality vs true GELU (error inherent to I-BERT's erf poly)
    ref = x * 0.5 * (1 + erf(x / np.sqrt(2)))
    err = np.abs(np.asarray(y)[0] - ref[0])
    assert err.max() < 0.12, err.max()
    assert err.mean() < 0.05, err.mean()


def test_ibert_softmax_module(rng):
    """Full IBERTSoftmax including the internal 16-bit exp QuantAct — the raw
    exp ints are ~2**40 and *require* that requant stage (ibert:262,310-311)."""
    from ivit_tpu.models.layers import IBERTSoftmax

    s = np.float32(0.05)
    x = (rng.integers(-127, 128, size=(8, 64)) * s).astype(np.float32)
    mod = IBERTSoftmax(output_bit=8)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         jnp.asarray([s]), running_stat=True)
    # one calibration pass to settle the exp range, then frozen eval
    _, state = mod.apply(variables, jnp.asarray(x), jnp.asarray([s]),
                         running_stat=True, mutable=["quant_stats"])
    (y, out_s), _ = mod.apply(
        {"params": variables.get("params", {}), **state},
        jnp.asarray(x), jnp.asarray([s]), running_stat=False,
        mutable=[])
    ref = jax.nn.softmax(jnp.asarray(x), axis=-1)
    err = np.abs(np.asarray(y) - np.asarray(ref))
    assert err.max() < 0.03, err.max()
    assert float(out_s[0]) == 2.0 / 256


def test_bitlength_sqrt():
    n = jnp.asarray([0.0, 1.0, 2.0, 3.0, 4.0, 100.0, 65536.0, 2.0**30, 987654321.0])
    got = np.asarray(ibert.int_bitlength_sqrt(n))
    want = np.floor(np.sqrt(np.asarray(n)))
    assert np.all(np.abs(got - want) <= 1.0)
    assert got[0] == 0.0


def test_layernorm_no_overflow_shift_stays(rng):
    s = np.float32(0.05)
    c = 64
    x = (rng.integers(-127, 128, size=(2, 4, c)) * s).astype(np.float32)
    w = jnp.ones(c)
    b = jnp.zeros(c)
    y, out_s, new_shift, _ = ibert.ibert_layernorm(
        jnp.asarray(x), jnp.asarray([s]), w, b, jnp.zeros(1),
        overflow_handling=True)
    assert float(jnp.max(new_shift)) == 0.0

    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    ref = (x - mean) / np.sqrt(var + 1e-5)
    assert np.abs(np.asarray(y) - ref).max() < 0.05


def test_layernorm_overflow_raises_shift(rng):
    """16-bit-scale inputs big enough to overflow the 2**32 variance budget."""
    s = np.float32(1e-4)
    c = 768
    x_int = rng.integers(-(2**15), 2**15, size=(1, 4, c)).astype(np.float32)
    x = x_int * s
    y, out_s, new_shift, _ = ibert.ibert_layernorm(
        jnp.asarray(x), jnp.asarray([s]), jnp.ones(c), jnp.zeros(c),
        jnp.zeros(1), overflow_handling=True)
    assert float(jnp.max(new_shift)) > 0.0
    # with the raised shift, the shifted variance is back in budget
    assert np.isfinite(np.asarray(y)).all()

    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    ref = (x - mean) / np.sqrt(var + 1e-5)
    assert np.abs(np.asarray(y) - ref).max() < 0.05


def test_layernorm_int_sqrt_mode(rng):
    s = np.float32(0.05)
    c = 128
    x = (rng.integers(-127, 128, size=(2, 4, c)) * s).astype(np.float32)
    y, _, _, _ = ibert.ibert_layernorm(
        jnp.asarray(x), jnp.asarray([s]), jnp.ones(c), jnp.zeros(c),
        jnp.zeros(1), overflow_handling=False, use_int_sqrt=True)
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    ref = (x - mean) / np.sqrt(var + 1e-5)
    assert np.abs(np.asarray(y) - ref).max() < 0.06
