"""Bit-exactness tests for the dyadic decomposition vs the reference
``batch_frexp`` semantics (quant_utils.py:151-175: np.frexp + Decimal
ROUND_HALF_UP on the 31-bit mantissa)."""

import decimal
from decimal import Decimal

import numpy as np

from ivit_tpu.ops.dyadic import Dyadic, batch_frexp, dyadic_to_multiplier


def _reference_batch_frexp(inputs, max_bit=31):
    """Verbatim reference formula, Decimal and all."""
    m_f, e_f = np.frexp(np.asarray(inputs, dtype=np.float64))
    out_m = []
    for m in m_f:
        out_m.append(int(Decimal(m * (2**max_bit)).quantize(
            Decimal("1"), rounding=decimal.ROUND_HALF_UP)))
    return np.array(out_m, dtype=np.int64), (float(max_bit) - e_f).astype(np.int64)


def test_matches_reference_decimal_rounding(rng):
    scales = np.concatenate([
        10.0 ** rng.uniform(-12, 4, size=2000),
        np.array([1.0, 0.5, 2.0, 1 / 3, 2 / 3, 1e-9, 127.0, 1 / 127]),
    ])
    m, e = batch_frexp(scales)
    m_ref, e_ref = _reference_batch_frexp(scales)
    np.testing.assert_array_equal(m, m_ref)
    np.testing.assert_array_equal(e, e_ref)


def test_mantissa_range(rng):
    scales = 10.0 ** rng.uniform(-10, 3, size=1000)
    m, e = batch_frexp(scales)
    assert np.all(m >= 2**30)
    assert np.all(m <= 2**31)


def test_multiplier_accuracy(rng):
    scales = 10.0 ** rng.uniform(-10, 3, size=1000)
    m, e = batch_frexp(scales)
    rel_err = np.abs(dyadic_to_multiplier(m, e) - scales) / scales
    assert rel_err.max() < 2.0**-31


def test_apply_exact_matches_float64_round(rng):
    d = Dyadic.from_ratio(np.array([0.037]))
    z = rng.integers(-(2**20), 2**20, size=10000)
    got = d.apply_exact(z)
    want = np.round(z.astype(np.float64) * d.m[0] / 2.0 ** d.e[0])
    np.testing.assert_array_equal(got, want)
