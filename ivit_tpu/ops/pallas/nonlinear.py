"""Fused Pallas TPU kernels for the integer nonlinearities.

The ablation profile (see git history) shows the XLA engine spends ~half its
time in the softmax/GELU elementwise chains: each row reduction splits the
fusion, so the [B,H,197,197] score tensor and [B,197,4C] MLP hidden tensor
make 3-4 HBM round trips.  These kernels do the whole chain — including the
following dyadic requantization — in one VMEM pass: int8 in, int8 out.

Bit-compatibility: the in-kernel math is the same float32-held integer
arithmetic as ``ops/ivit.py`` / ``ops/ibert.py`` cores (exact powers of two
via bit-constructed floats), so fused and unfused paths produce identical
integers; ``tests/test_pallas.py`` asserts elementwise equality.

Row layout: callers flatten leading dims to [R, N]; the grid tiles R, each
program holds (TILE_R, N) in VMEM.  N (197 for ViT, row length) is padded by
Mosaic to the lane multiple; padded columns are driven to exp=0 by clamping
semantics (see masks below).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import _interp, _kernel_trace

INT32_MAX = 2.0**31 - 1


from ..quant import exact_fma as _quant_exact_fma
from ..quant import floor_div_int as _floor_div_int
from ..quant import rdiv as _quant_rdiv


def _rdiv(a, b):
    """Correctly-rounded f32 division, contraction/rewrite-proof.

    Delegates to ops.quant.rdiv so the kernels share the exact construction
    the sim and unfused engine use (bitmask splits, pinned operands,
    barrier-separated divisions — see ops/quant.py for the full hazard
    catalogue: TPU's sloppy divide, XLA's shared-divisor rewrite, LLVM FMA
    contraction of producer expressions).  In interpret mode this runs as
    XLA ops where all those hazards are live; under Mosaic the bitcasts are
    supported (pow2 uses them) — scalar-operand lowering to be validated on
    hardware.
    """
    return _quant_rdiv(a, b)


def _exact_fma(a, b, c):
    """Correctly-rounded a*b + c, contraction-immune (ops.quant.exact_fma)."""
    return _quant_exact_fma(a, b, c)


def _int_sum(x):
    """Order-independent last-axis sum of integer-valued f32 via the
    two-limb int32 scheme — bit-identical to ops/quant.exact_int_sum."""
    x = jnp.clip(x, -(2.0**31), 2.0**31)
    h = jnp.floor(x * (2.0**-8))
    l = x - h * (2.0**8)
    s_h = jnp.sum(h.astype(jnp.int32), axis=-1, keepdims=True)
    s_l = jnp.sum(l.astype(jnp.int32), axis=-1, keepdims=True)
    return s_h.astype(jnp.float32) * 2.0**8 + s_l.astype(jnp.float32)


def _sq_sum(y):
    """Order-independent last-axis sum of squares via the two-limb int32
    scheme — see ops/quant.exact_sq_sum (bit-identical recombination)."""
    a = jnp.floor(y * (2.0**-8))
    b = y - a * (2.0**8)
    s_aa = jnp.sum((a * a).astype(jnp.int32), axis=-1, keepdims=True)
    s_ab = jnp.sum((a * b).astype(jnp.int32), axis=-1, keepdims=True)
    s_bb = jnp.sum((b * b).astype(jnp.int32), axis=-1, keepdims=True)
    return (s_aa.astype(jnp.float32) * 2.0**16
            + (s_ab.astype(jnp.float32) * 2.0**9
               + s_bb.astype(jnp.float32)))


def _pow2(k):
    """Exact 2**k inside the kernel (see ops/quant.py pow2)."""
    ki = jnp.clip(k, -126.0, 127.0).astype(jnp.int32)
    return jax.lax.bitcast_convert_type((ki + 127) << 23, jnp.float32)


def _int_exp_shift(x_int, scaling_factor, n, fast_q=False):
    """ivit int_exp_shift on f32-held ints (ivit_modules.py:89-103).

    /2 and /16 are exact power-of-two multiplies.  ``fast_q``: divide-free
    exact quotient (ops/quant.floor_div_int) — the freeze step gates it on
    ``exp_fastdiv_ok`` so the value is identical to floor of the correctly-
    rounded quotient (the reference's torch ``floor(x/x0)`` semantic, which
    the rdiv form reproduces on every backend).
    """
    x_int = x_int + jnp.floor(x_int * 0.5) - jnp.floor(x_int * 0.0625)
    x0_int = jnp.floor(_rdiv(-1.0, scaling_factor))
    x_int = jnp.maximum(x_int, n * x0_int)
    if fast_q:
        q = _floor_div_int(x_int, x0_int)
    else:
        q = jnp.floor(_rdiv(x_int, x0_int))
    r = x_int - x0_int * q
    exp_int = r * 0.5 - x0_int
    return jnp.clip(jnp.floor(exp_int * _pow2(n - q)), 0, None)


# ---------------------------------------------------------------------------
# Shiftmax (+ optional fused requant of the following QuantAct)
# ---------------------------------------------------------------------------

def _shiftmax_kernel(x_ref, s_ref, o_ref, *, output_bit, n_valid, fast_q):
    x = x_ref[...].astype(jnp.float32)
    s = s_ref[0]
    ncols = x.shape[-1]
    mask = None
    if n_valid != ncols:
        # padding columns must never win the max and contribute exp == 0
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=x.ndim - 1)
        mask = col < n_valid
        x = jnp.where(mask, x, -(2.0**23))
    x_max = jnp.max(x, axis=-1, keepdims=True)
    x = x - x_max
    exp_int = _int_exp_shift(x, s, 15, fast_q)
    if mask is not None:
        exp_int = jnp.where(mask, exp_int, 0.0)
    exp_sum = jnp.minimum(_int_sum(exp_int), INT32_MAX)
    factor = jnp.floor(_rdiv(INT32_MAX, exp_sum))
    probs = jnp.floor(exp_int * factor * (2.0 ** -(31 - output_bit + 1)))
    o_ref[...] = probs.astype(o_ref.dtype)


def shiftmax_p(scores_int8, s_attn, output_bit: int = 8, *,
               n_valid=None, tile_rows: int = 1024, interpret: bool = False,
               fast_q: bool = False):
    """Fused Shiftmax: int8 scores [.., N] -> intN probs, one VMEM pass."""
    odtype = jnp.int8 if output_bit <= 8 else jnp.int16
    shape = scores_int8.shape
    n = shape[-1]
    n_valid = n if n_valid is None else n_valid
    x = scores_int8.reshape(-1, n)
    rows = x.shape[0]
    vmem_rows = max(8, (10 * 2**20 // (n * 40)) // 8 * 8)  # see shift_gelu
    tile = min(tile_rows, vmem_rows, rows)
    grid = (pl.cdiv(rows, tile),)
    s = jnp.reshape(s_attn, (1,)).astype(jnp.float32)
    interp = _interp(interpret)
    with _kernel_trace(interp):
        out = pl.pallas_call(
            functools.partial(_shiftmax_kernel, output_bit=output_bit,
                              n_valid=n_valid, fast_q=fast_q),
            name="shiftmax_kernel",
            out_shape=jax.ShapeDtypeStruct((rows, n), odtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((tile, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interp,
        )(x, s)
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# ShiftGELU fused with the following dyadic requant
# ---------------------------------------------------------------------------

def _shift_gelu_kernel(x_ref, sc_ref, o_ref, *, output_bit, n, out_bits,
                       fast_q):
    x = x_ref[...].astype(jnp.float32)
    s_sig = sc_ref[0]          # s_gelu * 1.702
    m_out = sc_ref[1]          # requant multiplier (gelu-out -> next scale)
    x_max = jnp.max(x, axis=-1, keepdims=True)
    xc = x - x_max
    exp_int = _int_exp_shift(xc, s_sig, n, fast_q)
    exp_max = _int_exp_shift(-x_max, s_sig, n, fast_q)
    exp_sum = jnp.minimum(exp_int + exp_max, INT32_MAX)
    factor = jnp.floor(_rdiv(INT32_MAX, exp_sum))
    sigmoid_int = jnp.floor(exp_int * factor * (2.0 ** -(31 - output_bit + 1)))
    y_int = x * sigmoid_int
    # fused requant to the next activation scale
    lim = 2.0 ** (out_bits - 1)
    y = jnp.clip(jnp.round(y_int * m_out), -lim, lim - 1)
    o_ref[...] = y.astype(jnp.int8)


def shift_gelu_requant_p(x_int8, s_gelu, m_out, output_bit: int = 8,
                         n: int = 23, out_bits: int = 8, *,
                         tile_rows: int = 512, interpret: bool = False,
                         fast_q: bool = False):
    """Fused ShiftGELU + requant: int8 [.., H] -> int8 on the next scale.

    Note: the GELU max-reduction runs over the full last axis (the MLP hidden
    dim), matching ivit_modules.py:110.
    """
    shape = x_int8.shape
    h = shape[-1]
    x = x_int8.reshape(-1, h)
    rows = x.shape[0]
    # scoped-VMEM budget: the exp chain keeps ~10 live f32 temporaries of the
    # tile, and Mosaic's stack limit is 16MB (hit at DeiT-S h=1536, tile 512:
    # 28.4MB).  Cap the tile so 10 * tile * h * 4B stays under ~10MB.
    vmem_rows = max(8, (10 * 2**20 // (h * 40)) // 8 * 8)
    tile = min(tile_rows, vmem_rows, rows)
    grid = (pl.cdiv(rows, tile),)
    scalars = jnp.stack([
        jnp.reshape(s_gelu, ()).astype(jnp.float32) * 1.702,
        jnp.reshape(m_out, ()).astype(jnp.float32),
    ])
    interp = _interp(interpret)
    with _kernel_trace(interp):
        out = pl.pallas_call(
            functools.partial(_shift_gelu_kernel, output_bit=output_bit, n=n,
                              out_bits=out_bits, fast_q=fast_q),
            name="shift_gelu_kernel",
            out_shape=jax.ShapeDtypeStruct((rows, h), jnp.int8),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, h), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((tile, h), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interp,
        )(x, scalars)
    return out.reshape(shape)
