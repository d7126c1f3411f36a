"""Tests for the quantization math core (ops/quant.py) against float64 numpy
golden implementations of the reference formulas (quant_utils.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ivit_tpu.ops import quant as q
from ivit_tpu.ops.dyadic import batch_frexp


def test_symmetric_params():
    s = q.symmetric_quant_params(8, jnp.asarray([-3.0]), jnp.asarray([2.0]))
    np.testing.assert_allclose(np.asarray(s), 3.0 / 127, rtol=1e-6)
    # eps clamp
    s0 = q.symmetric_quant_params(8, jnp.asarray([0.0]), jnp.asarray([0.0]))
    assert float(s0[0]) > 0


def test_fake_quantize_grid():
    scale = jnp.asarray([0.1])
    x = jnp.asarray([0.0, 0.05, 0.1, -0.26, 100.0, -100.0])
    y = q.fake_quantize(x, 8, scale)
    np.testing.assert_allclose(
        np.asarray(y), [0.0, 0.0, 0.1, -0.3, 12.7, -12.8], atol=1e-6)


def test_quantize_int_rounds_half_to_even():
    scale = jnp.asarray([1.0])
    x = jnp.asarray([0.5, 1.5, 2.5, -0.5, -1.5])
    y = q.quantize_int(x, 8, scale)
    np.testing.assert_array_equal(np.asarray(y), [0.0, 2.0, 2.0, -0.0, -2.0])


def test_ste_gradients():
    scale = jnp.asarray([0.1])
    g = jax.grad(lambda x: jnp.sum(q.fake_quantize(x, 8, scale)))(
        jnp.asarray([0.03, -0.04, 0.5]))
    np.testing.assert_allclose(np.asarray(g), [1.0, 1.0, 1.0])


def _golden_fixedpoint(x, s_in, bits, s_out, identity=None, s_id=None):
    """Float64 numpy re-statement of ref fixedpoint_mul (quant_utils.py:192-253)
    composed with the external * s_out."""
    n = 2 ** (bits - 1) - 1
    z = np.round(np.float64(x) / np.float64(s_in))
    m, e = batch_frexp(np.float64(s_in) / np.float64(s_out))
    out = np.round(z * m / 2.0**e)
    if identity is not None:
        zi = np.round(np.float64(identity) / np.float64(s_id))
        mi, ei = batch_frexp(np.float64(s_id) / np.float64(s_out))
        out = out + np.round(zi * mi / 2.0**ei)
    if bits in (4, 8, 16, 32):
        out = np.clip(out, -n - 1, n)
    return out * np.float64(s_out)


def test_fixedpoint_requant_matches_golden(rng):
    s_in = np.float32(0.0123)
    s_out = np.float32(0.0371)
    z = rng.integers(-127, 128, size=4096)
    x = (z * s_in).astype(np.float32)
    got = q.fixedpoint_requant(jnp.asarray(x), jnp.asarray([s_in]), 8,
                              jnp.asarray([s_out]))
    want = _golden_fixedpoint(x, np.asarray([s_in]), 8, np.asarray([s_out]))
    # compare in integer units (int*s_out in f32 vs f64 carries ~1e-6 noise);
    # f32 on-device vs f64 golden agrees except at exact rounding ties
    mism = np.abs(np.asarray(got, np.float64) / s_out - want / s_out) > 0.5
    assert mism.mean() < 1e-3, f"mismatch rate {mism.mean()}"


def test_fixedpoint_requant_residual_fusion(rng):
    # NB: generic (EMA-like) scales.  Exact "nice" rationals such as
    # 0.023/0.04 put z*M exactly on .5 ties for periodic z, where the QAT
    # sim's on-device f32 mantissa and the engine/golden f64 mantissa may
    # round differently; calibrated scales never do this (ties ~1e-5).
    s_in, s_id, s_out = (np.float32(0.0112837), np.float32(0.0231847),
                         np.float32(0.0403619))
    z = rng.integers(-127, 128, size=2048)
    zi = rng.integers(-127, 128, size=2048)
    x = (z * s_in).astype(np.float32)
    idn = (zi * s_id).astype(np.float32)
    got = q.fixedpoint_requant(jnp.asarray(x), jnp.asarray([s_in]), 8,
                              jnp.asarray([s_out]), identity=jnp.asarray(idn),
                              identity_scale=jnp.asarray([s_id]))
    want = _golden_fixedpoint(x, np.asarray([s_in]), 8, np.asarray([s_out]),
                              idn, np.asarray([s_id]))
    mism = np.abs(np.asarray(got, np.float64) / s_out - want / s_out) > 0.5
    assert mism.mean() < 1e-3


def test_fixedpoint_requant_per_channel_scale(rng):
    """Per-channel input scales (QuantLinear/Conv outputs) must broadcast."""
    c = 16
    s_in = (10.0 ** rng.uniform(-3, -1, size=c)).astype(np.float32)
    s_out = np.float32(0.0517391)
    z = rng.integers(-127, 128, size=(8, c))
    x = (z * s_in).astype(np.float32)
    got = q.fixedpoint_requant(jnp.asarray(x), jnp.asarray(s_in), 8,
                              jnp.asarray([s_out]))
    want = _golden_fixedpoint(x, s_in[None, :], 8, np.asarray([s_out]))
    mism = np.abs(np.asarray(got, np.float64) / s_out - want / s_out) > 0.5
    assert mism.mean() < 1e-2


def test_fixedpoint_gradients_are_straight_through(rng):
    s_in, s_out = jnp.asarray([0.01]), jnp.asarray([0.02])
    x = jnp.asarray(rng.normal(size=32).astype(np.float32))
    idn = jnp.asarray(rng.normal(size=32).astype(np.float32))

    gx = jax.grad(lambda a: jnp.sum(q.fixedpoint_requant(a, s_in, 8, s_out)))(x)
    np.testing.assert_allclose(np.asarray(gx), np.ones(32))

    gx, gi = jax.grad(
        lambda a, b: jnp.sum(q.fixedpoint_requant(
            a, s_in, 8, s_out, identity=b, identity_scale=s_in)),
        argnums=(0, 1))(x, idn)
    np.testing.assert_allclose(np.asarray(gx), np.ones(32))
    np.testing.assert_allclose(np.asarray(gi), np.ones(32))


def test_requant_16bit_envelope(rng):
    """16-bit requant keeps integer outputs within the int16 envelope."""
    s_in, s_out = np.float32(0.01), np.float32(1e-4)
    z = rng.integers(-(2**15), 2**15, size=1024)
    x = (z * s_in).astype(np.float32)
    got = q.fixedpoint_requant(jnp.asarray(x), jnp.asarray([s_in]), 16,
                              jnp.asarray([s_out]))
    ints = np.asarray(got) / s_out
    assert np.all(ints <= 2**15 - 1 + 0.5)
    assert np.all(ints >= -(2**15) - 0.5)


def test_rdiv_behavioral_contract(rng):
    """rdiv tracks correctly-rounded division to ~1 ulp (it may double-round
    at near-tie quotients) and must agree with it exactly through the
    round()/floor() constructs the scheme uses — the property that makes
    results platform-deterministic (TPU's raw divide is ~1 ulp sloppy)."""
    a = rng.integers(1, 2**26, size=100000).astype(np.float32)
    b = rng.integers(1, 2**20, size=100000).astype(np.float32)
    got = np.asarray(q.rdiv(jnp.asarray(a), jnp.asarray(b)))
    want = a / b  # numpy: correctly rounded
    np.testing.assert_allclose(got, want, rtol=3e-7)
    # fake-quant round trips up to the f32-exact integer range: exact
    # recovery (beyond 2**24 the product itself cannot hold the integer and
    # any 1-ulp neighbor is an equally valid recovery)
    s = np.float32(0.0516)
    z = rng.integers(-(2**22), 2**22, size=100000)
    x = (z * s).astype(np.float32)
    got = np.asarray(jnp.round(q.rdiv(jnp.asarray(x), jnp.asarray(s))))
    np.testing.assert_array_equal(got, np.round(x / s))
    # weight-quantization boundaries: round agreement
    w = rng.standard_normal((512, 256)).astype(np.float32) * 0.02
    ws = (np.maximum(np.abs(w).max(0), 1e-8) / 127).astype(np.float32)
    got = np.asarray(jnp.round(q.rdiv(jnp.asarray(w), jnp.asarray(ws))))
    np.testing.assert_array_equal(got, np.round(w / ws))


def test_floor_div_int_matches_floor_rdiv():
    """The freeze gate's soundness: wherever ``exp_fastdiv_ok`` passes,
    the divide-free ``floor_div_int`` equals ``floor(rdiv(x, x0))`` for
    EVERY integer x in the exp chain's clamped domain [n*x0, 0] —
    exhaustively for small/mid divisors, boundary bands at the gate edge
    (divergence, if any, can only sit within one quotient ulp of an
    integer, i.e. next to multiples of x0)."""
    f = jax.jit(lambda x, b: (q.floor_div_int(x, b),
                              jnp.floor(q.rdiv(x, b))))
    for n in (15, 23, 30):
        for x0 in (-2.0, -7.0, -33.0, -100.0, -917.0, -31415.0):
            assert q.exp_fastdiv_ok(x0, n)
            x = jnp.arange(n * x0, 1.0, dtype=jnp.float32)  # exhaustive
            got, want = f(x, jnp.float32(x0))
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for n in (15, 23, 30):
        edge = -(2.0 ** (23 - int(np.floor(np.log2(n)))))   # gate edge
        assert q.exp_fastdiv_ok(edge, n)
        assert not q.exp_fastdiv_ok(4 * edge, n)
        bands = np.concatenate([np.arange(k * edge - 4, k * edge + 5)
                                for k in range(n + 1)])
        bands = bands[(bands <= 0) & (bands >= n * edge)]
        got, want = f(jnp.asarray(bands, jnp.float32), jnp.float32(edge))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_floor_div_int_true_floor_generic(rng):
    """floor_div_int == Python's exact integer floor division for generic
    signs/magnitudes inside its preconditions."""
    xs = rng.integers(-(2**23), 2**23, size=20000)
    bs = rng.integers(1, 2**19, size=20000) * rng.choice([-1, 1], size=20000)
    got = np.asarray(q.floor_div_int(jnp.asarray(xs, jnp.float32),
                                     jnp.asarray(bs, jnp.float32)))
    want = xs // bs   # Python/numpy integer floor division: the true floor
    # restrict to pairs whose |quotient| keeps the seed within +-1
    ok = np.abs(want) < 2**20
    np.testing.assert_array_equal(got[ok], want[ok].astype(np.float32))
