"""Piecewise-polynomial integer approximations (the fork's "ppoly" family).

Re-design of ``/root/reference/models/quantization_utils/ppoly_backend.py``
(host-side least-squares fitting with optional coordinate-descent boundary
optimization) and ``ppoly_modules.py`` (integer Horner evaluation).

TPU-first differences from the reference:

* Fitting is a pure-numpy host utility that runs at **calibration/freeze
  time**, not inside the forward pass (the reference refits from the current
  batch min/max on every unfixed forward — a host sync per call).  The layer
  wrappers in ``models/layers.py`` track running input ranges and invoke
  :func:`fit_gelu_coeffs` / :func:`fit_softmax_exp_coeffs` when the model is
  frozen or calibrated.
* Evaluation replaces the reference's per-segment boolean-mask loop
  (ppoly_backend.py:293-351) with a vectorized segment search
  (`sum(x >= bound)`) + gathered-coefficient Horner — one pass, no masks,
  maps onto the VPU.

The integer semantics match the reference:
  coeff_int[k] = floor(c_k * s**k * 2**N), internal bounds floor(b/s) int32,
  Horner accumulation nominally int64 with a 32-bit accumulator budget
  (ACCUMULATOR_BITWIDTH) checked at fit time.
"""

from __future__ import annotations

import dataclasses
import math
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from .quant import mul_add_2r

ACCUMULATOR_BITWIDTH = 32


# ---------------------------------------------------------------------------
# Host-side fitting (numpy, freeze-time)
# ---------------------------------------------------------------------------

def optimize_segment_bounds(xs, ys, x_lo, x_hi, segments, degree, max_iter=10):
    """Coordinate-descent boundary optimization (ppoly_backend.py:15-77)."""
    MIN_WIDTH_DIVISOR = 4
    SEARCH_RANGE_FACTOR = 0.3
    SEARCH_STEPS = 10

    bounds = np.linspace(x_lo, x_hi, segments + 1, dtype=np.float32)
    min_width = (x_hi - x_lo) / (segments * MIN_WIDTH_DIVISOR)

    for _ in range(max_iter):
        for i in range(1, segments):
            lo_search = max(bounds[i - 1] + min_width,
                            bounds[i] - SEARCH_RANGE_FACTOR * (bounds[i + 1] - bounds[i - 1]))
            hi_search = min(bounds[i + 1] - min_width,
                            bounds[i] + SEARCH_RANGE_FACTOR * (bounds[i + 1] - bounds[i - 1]))
            if lo_search >= hi_search:
                continue
            best_pos, best_error = bounds[i], float("inf")
            for pos in np.linspace(lo_search, hi_search, SEARCH_STEPS):
                bounds_test = bounds.copy()
                bounds_test[i] = pos
                total_error = 0.0
                for j in range(segments):
                    mask = (xs >= bounds_test[j]) & (xs <= bounds_test[j + 1])
                    if mask.any():
                        with warnings.catch_warnings():
                            warnings.simplefilter("ignore")
                            coeffs = np.polyfit(xs[mask], ys[mask], degree)
                        total_error += float(np.sum((ys[mask] - np.polyval(coeffs, xs[mask])) ** 2))
                if total_error < best_error:
                    best_error, best_pos = total_error, pos
            bounds[i] = best_pos
    return bounds


def fit_piecewise_polynomials(xs, ys, x_lo, x_hi, segments, degree,
                              alpha=0.0, optim_bounds=True):
    """Least-squares piecewise fit (ppoly_backend.py:80-216, sans plotting).

    Returns a list of ``((lo, hi), coeffs)`` with coeffs highest-power-first.
    Fits on [-1,1]-normalized coordinates and un-normalizes via binomial
    expansion for numerical conditioning, exactly like the reference.
    """
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    x_lo, x_hi = float(x_lo), float(x_hi)

    if optim_bounds:
        bounds = optimize_segment_bounds(xs, ys, x_lo, x_hi, segments, degree)
    else:
        bounds = np.linspace(x_lo, x_hi, segments + 1, dtype=np.float32)

    segment_width = (x_hi - x_lo) / segments
    overlap_width = alpha * segment_width
    pieces = []
    for i, (lo, hi) in enumerate(zip(bounds[:-1], bounds[1:])):
        fit_lo = lo - overlap_width if i > 0 else lo
        fit_hi = hi + overlap_width if i < segments - 1 else hi
        mask = (xs >= fit_lo) & (xs <= fit_hi)
        x_fit, y_fit = xs[mask], ys[mask]

        if len(x_fit) > degree:
            x_center = (fit_lo + fit_hi) / 2.0
            x_scale = (fit_hi - fit_lo) / 2.0
            if abs(x_scale) < 1e-10:
                x_scale = 1.0
            x_norm = (x_fit - x_center) / x_scale
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                coeffs_norm = np.polyfit(x_norm, y_fit, degree)
            coeffs = np.zeros(degree + 1, dtype=np.float64)
            for j in range(degree + 1):
                poly_power = degree - j
                coeff_norm = coeffs_norm[j]
                for k in range(poly_power + 1):
                    binom = math.comb(poly_power, k)
                    contrib = (coeff_norm * binom
                               * ((-x_center / x_scale) ** (poly_power - k))
                               / (x_scale**k))
                    coeffs[degree - k] += contrib
            coeffs = coeffs.astype(np.float32)
        else:
            coeffs = np.zeros(degree + 1, dtype=np.float32)
            if len(y_fit) > 0:
                coeffs[-1] = float(np.mean(y_fit))
        pieces.append(((float(lo), float(hi)), coeffs))
    return pieces


def compute_integer_coefficients(float_pieces, scaling_factor, N):
    """Float pieces -> (internal_bounds[int32, seg-1], coeffs[int64, seg, deg+1]).

    ``coeff_int = floor(c_k * s**k * 2**N)`` (ppoly_backend.py:219-290).
    Also returns per-position signed bit-widths (hardware sizing info).
    """
    s = float(np.asarray(scaling_factor).reshape(-1)[0])
    bounds, int_coeffs, bitwidths = [], [], {}
    for idx, ((lo_f, _hi_f), coeffs) in enumerate(float_pieces):
        if idx > 0:
            bounds.append(math.floor(lo_f / s))
        deg = len(coeffs) - 1
        row = []
        for i, coeff in enumerate(coeffs):
            power = deg - i
            int_coeff = math.floor(float(coeff) * (s**power) * (2.0**N))
            bw = 1 if int_coeff == 0 else int(math.ceil(math.log2(abs(int_coeff) + 1))) + 1
            bitwidths[power] = max(bitwidths.get(power, 0), bw)
            row.append(int_coeff)
        int_coeffs.append(row)
    bounds = np.asarray(bounds, dtype=np.int32)
    coeffs_arr = np.asarray(int_coeffs, dtype=np.int64)
    return bounds, coeffs_arr, bitwidths


# ---------------------------------------------------------------------------
# Fitted-function containers
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PPolyTable:
    """Frozen integer piecewise polynomial: internal bounds + coefficients."""
    bounds: np.ndarray        # int32 [segments-1]
    coeffs: np.ndarray        # int64 [segments, degree+1], highest power first
    scale_bits: int           # N
    out_scale: np.ndarray     # float, output scaling factor

    @property
    def segments(self) -> int:
        return int(self.coeffs.shape[0])

    @property
    def degree(self) -> int:
        return int(self.coeffs.shape[1]) - 1


def _gelu_ref(x):
    return 0.5 * x * (1.0 + np.vectorize(math.erf)(x / math.sqrt(2.0)))


def _ibert_gelu_host(xs, s):
    """Host (numpy) golden IBERT GELU used as the ppoly 'ibert' backend target
    (ppoly_modules.py:61-76 samples an IBERTIntGELU instance)."""
    from . import ibert as _ib
    y, _ = _ib.ibert_gelu(jnp.asarray(xs, jnp.float32), jnp.asarray(s, jnp.float32))
    return np.asarray(y, dtype=np.float64)


def _ibert_exp_host(x_int, s):
    """Host golden IBERT int_exp (ppoly_modules.py:174-199)."""
    from . import ibert as _ib
    e_int, e_scale = _ib.int_exp(jnp.asarray(x_int, jnp.float32), jnp.asarray(s, jnp.float32))
    return np.asarray(e_int, np.float64) * np.asarray(e_scale, np.float64)


def fit_gelu_table(x_lo, x_hi, scaling_factor, *, scale_bits=22, seg=16,
                   deg=2, backend="ibert", alpha=0.0, optim_bounds=True) -> PPolyTable:
    """Fit the GELU ppoly table over [x_lo, x_hi] (ppoly_modules.py:56-100)."""
    x_lo = math.floor(x_lo)
    x_hi = math.ceil(x_hi)
    s = float(np.asarray(scaling_factor).reshape(-1)[0])
    xs = np.linspace(x_lo, x_hi, 10000)
    if backend == "ibert":
        ys = _ibert_gelu_host(xs, s)
    else:
        ys = _gelu_ref(xs)
    pieces = fit_piecewise_polynomials(xs, ys, x_lo, x_hi, seg, deg, alpha,
                                       optim_bounds=optim_bounds)
    bounds, coeffs, _ = compute_integer_coefficients(pieces, s, scale_bits)

    if backend == "ibert":
        # reproduce IBERT's composite output scale (ppoly_modules.py:84-92)
        from .ibert import GELU_A, GELU_K, GELU_N
        so = s / GELU_K
        so = so**2 * GELU_A
        so = so * (2**GELU_N)
        out_scale = np.asarray(s * so / 2, dtype=np.float32)
    else:
        out_scale = np.asarray(s / (2.0**scale_bits), dtype=np.float32)
    return PPolyTable(bounds=bounds, coeffs=coeffs, scale_bits=scale_bits,
                      out_scale=out_scale)


def fit_softmax_exp_table(x_lo_int, x_hi_int, scaling_factor, *, scale_bits=28,
                          seg=16, deg=2, backend="float", alpha=0.0,
                          optim_bounds=False) -> PPolyTable:
    """Fit the softmax exp ppoly table (ppoly_modules.py:213-256).

    The input domain is the *offset* integer grid ``x_int - max + 127``
    (non-negative), fitting ``exp((x_off - 127) * s)``.
    """
    s = float(np.asarray(scaling_factor).reshape(-1)[0])
    x_lo_int = math.floor(x_lo_int)
    x_hi_int = math.ceil(x_hi_int)
    xs_off = np.linspace(x_lo_int, x_hi_int, 10000)
    if backend == "ibert":
        ys = _ibert_exp_host(xs_off - 127, s)
    else:
        ys = np.exp((xs_off - 127) * s)
    xs = xs_off * s
    x_lo, x_hi = x_lo_int * s, x_hi_int * s
    pieces = fit_piecewise_polynomials(xs, ys, x_lo, x_hi, seg, deg, alpha,
                                       optim_bounds=optim_bounds)
    bounds, coeffs, _ = compute_integer_coefficients(pieces, s, scale_bits)
    return PPolyTable(bounds=bounds, coeffs=coeffs, scale_bits=scale_bits,
                      out_scale=np.asarray(1.0, dtype=np.float32))


# ---------------------------------------------------------------------------
# Device-side evaluation (jnp)
# ---------------------------------------------------------------------------

def eval_piecewise_poly(x_int, bounds, coeffs):
    """Vectorized integer Horner evaluation.

    ``x_int``: integer-valued array (float32 or int32).
    ``bounds``: [segments-1] sorted internal boundaries.
    ``coeffs``: [segments, degree+1], highest power first.

    Segment selection matches the reference convention
    (ppoly_backend.py:307-329): segment i covers ``bounds[i-1] <= x < bounds[i]``.
    Implemented as a comparison-count (``sum(x >= b)``) + one-hot gather,
    which XLA lowers to pure VPU work (no scatter/gather shuffles).
    """
    bounds = jnp.asarray(bounds, dtype=x_int.dtype)
    coeffs = jnp.asarray(coeffs, dtype=x_int.dtype)
    segments, _ = coeffs.shape

    if segments == 1:
        seg_idx = jnp.zeros(x_int.shape, dtype=jnp.int32)
    else:
        seg_idx = jnp.sum(
            x_int[..., None] >= bounds.reshape((1,) * x_int.ndim + (-1,)),
            axis=-1,
        ).astype(jnp.int32)

    # gather per-element coefficient rows: [..., degree+1]
    c = coeffs[seg_idx]

    r = c[..., 0]
    for k in range(1, coeffs.shape[1]):
        # two-rounding mul-add: a bare r*x + c contracts into an FMA under
        # jit (integer coefficients reach 2**22, so the product is inexact
        # and the fused value differs) — ops/quant.py doctrine
        r = mul_add_2r(r, x_int, c[..., k])
    return r
