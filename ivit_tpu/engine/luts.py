"""Freeze-time exact lookup tables for the 8-bit-domain nonlinearities.

Every hot nonlinearity input in the scheme is an int8 integer at a frozen
scale: the softmax sees requantized scores in [-128, 127] (so the shifted
argument ``x - x_max`` spans [-255, 0] — 256 values), and the GELU sees the
fc1 requant output likewise.  The entire exp/erf/poly tower therefore
collapses to a 256-entry table computed ONCE at freeze time by running the
exact tower formula over the full reachable domain — **bit-identical by
construction** (same function, same domain, and the tower is compilation-
context-stable by the ops/quant.py machinery, so host-CPU evaluation equals
the TPU sim bit-for-bit; tests/test_lut.py re-verifies both claims).

In-kernel evaluation is a per-element 128-lane dynamic gather
(``ops/pallas/block._lut_gather``): ~6 VPU ops/element vs ~40 for the
tower — the dominant VPU cost of the fused kernels (round-3 ablations:
softmax ~6.5ms + GELU ~6.6ms of DeiT-T's 36ms model).

Reference semantics tabled:
* ivit Shiftmax / ShiftGELU ``int_exp_shift``
  (/root/reference/models/quantization_utils/ivit_modules.py:89-103)
* ibert ``int_exp`` / ``int_erf`` (ibert_modules.py:263-295, 203-218)
* ppoly piecewise Horner (ppoly_backend.py:293-351)
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np

LUT_SIZE = 256


@contextlib.contextmanager
def _on_cpu():
    """Evaluate table builders on host CPU (the tower functions are
    compilation-context-stable, so CPU values == TPU sim values bit-for-bit;
    building on CPU avoids ~50 eager dispatches through the TPU tunnel).

    ``local_devices``, not ``devices``: under ``jax.distributed`` the global
    device list leads with process 0's devices, and pinning another
    process's (non-addressable) device as default would make every eager
    table op a cross-process transfer (r4: wedged the multihost demo's
    shutdown barrier)."""
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        yield
        return
    with jax.default_device(cpu):
        yield


def _np_f32(x):
    return np.asarray(x, dtype=np.float32)


def shiftmax_exp_lut(s_attn) -> np.ndarray:
    """exp table for ivit Shiftmax: T[i] = int_exp_shift(-i, s_attn, n=15).

    Index i = x_max - x in [0, 255] (both int8).  Values are the f32-held
    integers the tower produces (<= 2**30)."""
    from ..ops.ivit import int_exp_shift
    with _on_cpu():
        d = -jnp.arange(LUT_SIZE, dtype=jnp.float32)
        exp_int, _ = int_exp_shift(d, jnp.float32(_np_f32(s_attn)), n=15)
    return _np_f32(exp_int)


def shift_gelu_exp_lut(s_gelu) -> np.ndarray:
    """exp table for ivit ShiftGELU: T[i] = int_exp_shift(-i, s*1.702, n=23).

    The kernel combines it with the per-row ``exp(-x_max)`` tower into a
    per-row sigmoid table (see block._shift_gelu_lut)."""
    from ..ops.ivit import int_exp_shift
    with _on_cpu():
        s_sig = jnp.float32(_np_f32(s_gelu)) * 1.702
        d = -jnp.arange(LUT_SIZE, dtype=jnp.float32)
        exp_int, _ = int_exp_shift(d, s_sig, n=23)
    return _np_f32(exp_int)


def ibert_softmax_exp16_lut(s_attn, s_exp_act) -> np.ndarray:
    """Folded exp16 table for ibert softmax.

    T[i] = clip(round(int_exp(-i, s_attn) * M), -2**15, 2**15-1) where
    M = rdiv(1, s_exp_act) — the engine's internal 16-bit exp QuantAct
    (ibert_modules.py:262,310-311) folded into the table."""
    from ..ops.ibert import int_exp
    from ..ops.quant import rdiv
    with _on_cpu():
        d = -jnp.arange(LUT_SIZE, dtype=jnp.float32)
        exp_int, _ = int_exp(d, jnp.float32(_np_f32(s_attn)))
        m = rdiv(1.0, jnp.float32(_np_f32(s_exp_act)))
        exp16 = jnp.clip(jnp.round(exp_int * m), -(2.0**15), 2.0**15 - 1)
    return _np_f32(exp16)


def ibert_gelu_lut(s_gelu) -> np.ndarray:
    """Folded erf+shift table for ibert GELU: U[x+128] = erf_int(x) + shift.

    The GELU output is then ``y_int = x * U[x+128]`` (ibert_modules.py:
    220-235; engine chain ops/ibert.ibert_gelu_int)."""
    from ..ops.ibert import GELU_K, int_erf
    from ..ops.quant import rdiv
    with _on_cpu():
        x = jnp.arange(LUT_SIZE, dtype=jnp.float32) - 128.0
        se = rdiv(jnp.float32(_np_f32(s_gelu)), GELU_K)
        erf_int, sig_scale = int_erf(x, se)
        shift = jnp.floor(rdiv(1.0, sig_scale))
        u = erf_int + shift
    return _np_f32(u)


def ppoly_softmax_exp_lut(bounds, coeffs, exp_bits: int) -> np.ndarray:
    """Folded exp-grid table for ppoly softmax.

    T[i] = floor(clip(poly(127 - i), 0) / 2**(30 - exp_bits + 1)) with
    i = x_max - x, x_off = x - x_max + 127 = 127 - i (engine _softmax_int
    ppoly branch; reference ppoly_modules.py:302-312)."""
    from ..ops.ppoly import eval_piecewise_poly
    with _on_cpu():
        x_off = 127.0 - jnp.arange(LUT_SIZE, dtype=jnp.float32)
        y = jnp.clip(eval_piecewise_poly(
            x_off, jnp.asarray(bounds, jnp.float32),
            jnp.asarray(coeffs, jnp.float32)), 0.0, None)
        t = jnp.floor(y / 2.0 ** (30 - exp_bits + 1))
    return _np_f32(t)


def ppoly_gelu_lut(bounds, coeffs, scale_bits: int, s_out) -> np.ndarray:
    """Fully folded ppoly GELU table.

    U[x+128] = floor(rdiv(poly(x) / 2**scale_bits, s_out)) — the engine's
    Horner + exact /2**sb + re-floor onto the backend grid
    (engine _gelu_int ppoly branch), all folded."""
    from ..ops.ppoly import eval_piecewise_poly
    from ..ops.quant import rdiv
    with _on_cpu():
        x = jnp.arange(LUT_SIZE, dtype=jnp.float32) - 128.0
        y_int = eval_piecewise_poly(x, jnp.asarray(bounds, jnp.float32),
                                    jnp.asarray(coeffs, jnp.float32))
        y = y_int / 2.0**scale_bits
        u = jnp.floor(rdiv(y, jnp.float32(_np_f32(s_out))))
    return _np_f32(u)


def swin_shift_sat(sm_base: str, s_attn, mask_min: float, s_exp_act=None):
    """Saturation gate for Swin shift-masked softmax positions.

    The additive shift mask (reference swin_quant.py:151-158: −100 before
    softmax, here ``M = round(-100 / s_attn)`` in integer domain) pushes
    masked scores far below the int8 LUT domain.  The exp towers clamp
    their argument at ``n * x0`` (ivit_modules.py:95 / ibert int_exp), so
    deep-enough masked positions all evaluate to ONE constant.  This
    verifies that numerically over the FULL masked range
    ``d = x_max - (a + M)``, a in [-128, 127], x_max in [-128, 127] —
    i.e. d in [max(0, |M|-255), |M|+255] — and returns ``(ok, sat)``.
    The kernel then selects ``sat`` directly for masked positions
    (block._softmax_lut); if the range is not flat (degenerate scales or a
    tiny mask), ``ok`` is False and the engine keeps the tower path.
    """
    m = abs(float(mask_min))
    lo = max(0.0, m - 255.0)
    with _on_cpu():
        d = -jnp.arange(lo, m + 256.0, dtype=jnp.float32)
        if sm_base == "ivit":
            from ..ops.ivit import int_exp_shift
            vals, _ = int_exp_shift(d, jnp.float32(_np_f32(s_attn)), n=15)
        elif sm_base == "ibert":
            from ..ops.ibert import int_exp
            from ..ops.quant import rdiv
            vals, _ = int_exp(d, jnp.float32(_np_f32(s_attn)))
            mm = rdiv(1.0, jnp.float32(_np_f32(s_exp_act)))
            vals = jnp.clip(jnp.round(vals * mm), -(2.0**15), 2.0**15 - 1)
        else:
            # ppoly extrapolates its leftmost segment — no saturation
            return False, np.float32(0.0)
    v = _np_f32(vals)
    ok = bool(v.size > 0 and np.all(v == v[0]))
    return ok, (v[0] if ok else np.float32(0.0))


def sum_fits_int32(lut: np.ndarray, n: int) -> bool:
    """May the softmax exp row sum run as ONE int32 reduction?

    Exact iff the worst-case row sum n * max(T) stays under 2**31 (the
    two-limb exact_int_sum is the fallback — ops/quant.py)."""
    m = float(np.max(np.abs(lut))) if lut.size else 0.0
    return bool(n * m < 2.0**31)
