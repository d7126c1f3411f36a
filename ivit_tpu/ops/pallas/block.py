"""Fused transformer-block Pallas kernels (the engine's hot path).

Design: the per-op XLA engine spends most of its time on elementwise-chain
fusions, dtype converts and layout copies between GEMMs (see profiles in git
history).  These kernels run an entire block *half* in one ``pallas_call``:
weights live in VMEM for the whole sweep, every intermediate stays on-chip,
and HBM sees exactly one int8 read and one int8 write of the token stream.

``mlp_block_p``: I-LayerNorm -> requant -> fc1(int8 MXU) -> requant ->
ShiftGELU -> requant -> fc2(int8 MXU) -> requant -> integer residual add.
Row-local (tokens independent), so the grid tiles rows freely.

All arithmetic is the same f32-held-integer math as the unfused engine —
bit-identical outputs (tests/test_pallas.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import _interp, _kernel_trace

from ..quant import mul_add_2r as _mul_add_2r
from .nonlinear import (_exact_fma, _floor_div_int, _int_exp_shift, _int_sum,
                        _pow2, _rdiv, _sq_sum)

INT32_MAX = 2.0**31 - 1


def _mxu_mode() -> str:
    """MXU operand dtype for the fused kernels: ``int8`` (default) or ``bf16``.

    bf16 x bf16 -> f32 dots are BIT-IDENTICAL to the int8 x int8 -> int32
    dots here: every operand is an int8-valued integer (exact in bf16's
    8-bit mantissa), every product is computed exactly by the MXU and
    accumulated in f32, partial sums stay exact while ``K * 2**14 < 2**24``
    (all dots satisfy it; fc2's wide K is chunked), and the final
    accumulator is inside the f32-exact 2**24 envelope the whole scheme
    already relies on (engine/vit_int.py F32_EXACT audit taps — the QAT sim
    computes these same accumulators in f32).

    The default is ``int8``: round-2 hardware A/Bs showed bf16 operands buy
    nothing (DeiT-S fused 4,766 img/s bf16 vs 4,779-4,780 int8,
    runs/path_compare_small_ibert.log vs runs/bench_now.log) while costing
    ~25% more scoped VMEM per tile (the round-2 driver bench OOMed on it,
    BENCH_r02.json).  bf16 stays available for A/Bs via ``IVIT_MXU=bf16``
    or the per-call ``mxu=`` kwarg, with the tile cap below keeping it
    inside the 16MB Mosaic scoped-VMEM stack.
    """
    return os.environ.get("IVIT_MXU", "int8")


# Scoped-VMEM tile caps for the fused MLP kernel.  Mosaic's per-kernel
# scoped-allocation (stack) limit is 16MB; the kernel's live f32 temporaries
# are dominated by the [tile, hidden] GELU/exp chain, so scoped bytes scale
# ~linearly in tile*hd at fixed family/mode.  Bytes-per-(tile*hd)-element
# constants are calibrated against real-TPU compiles:
#   ibert/bf16  tile 512 x hd 1536 -> 19.46M measured (round-2 driver OOM,
#               BENCH_r02.json)  => 24.8 B/elt; padded to 28.
#   ibert/int8  tile 512 x hd 1536 -> compiles green (driver bench)
#               => <=21.3 B/elt; 20 keeps the proven tile-512 config intact.
#   ivit shift-GELU keeps ~10 live f32 hidden-tile temps (28.4M at
#               512x1536 standalone, nonlinear.py budget note) => 40/48.
# scripts/check_vmem_geometries.py re-verifies every real model geometry by
# actually compiling on the TPU (wired into scripts/tpu_session.sh);
# tests/test_vmem_budget.py checks this arithmetic for every geometry on CPU.
_MLP_BYTES_PER_ELT = {("ivit", "int8"): 40, ("ivit", "bf16"): 48,
                      ("ibert", "int8"): 20, ("ibert", "bf16"): 28,
                      # ppoly keeps deg+1 coefficient planes + one boundary
                      # mask + the rdiv epilogue temporaries live
                      ("ppoly", "int8"): 40, ("ppoly", "bf16"): 48}
_VMEM_BUDGET = 16 * 2**20


def _mlp_tile(tile_rows: int, rows: int, hd: int, mxu: str,
              gelu_base: str) -> int:
    """Largest row tile that fits the scoped-VMEM budget (prefers an even
    divisor of ``rows`` so Mosaic never emits partial-tile masked stores,
    the op class behind the round-2 int8-scratch miscompile)."""
    bpe = _MLP_BYTES_PER_ELT.get((gelu_base, mxu), 48)
    tile = min(tile_rows, rows)
    if tile * hd * bpe <= _VMEM_BUDGET:
        return tile
    cap = max(8, (_VMEM_BUDGET // (hd * bpe)) // 8 * 8)
    for t in range(cap, max(8, cap // 2) - 1, -8):
        if rows % t == 0:
            return t
    return cap


def _dot_exact(a_f32, b_bf16, max_k: int = 1024):
    """Exact integer GEMM on the MXU via bf16 operands, f32 accumulation.

    ``a_f32``: int8-valued floats (any f32-register form); ``b_bf16``:
    int8-valued bf16 weights.  Splits K into <=``max_k`` chunks so each
    chunk's dot is exact f32 (worst case ``1024 * 127 * 127 < 2**24``).
    Chunk partials are accumulated in **int32**, not f32: each chunk sum is
    an exact integer, but with >=3 chunks (fc2 K=3072 DeiT-B / 4096 Swin-B)
    a cancelling intermediate f32 prefix could transiently exceed 2**24 and
    round even when the final total (audited by the engine's gemm_acc
    envelope tap) is in-envelope.  int32 accumulation is exact to 2**31.
    """
    k = a_f32.shape[-1]
    a = a_f32.astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    if k <= max_k:
        return jax.lax.dot_general(a, b_bf16, dims,
                                   preferred_element_type=jnp.float32)
    n_chunks = -(-k // max_k)
    step = -(-k // n_chunks)
    acc = None
    for i in range(0, k, step):
        part = jax.lax.dot_general(a[:, i:i + step], b_bf16[i:i + step], dims,
                                   preferred_element_type=jnp.float32)
        part = part.astype(jnp.int32)
        acc = part if acc is None else acc + part
    return acc.astype(jnp.float32)

# I-BERT polynomial constants (ops/ibert.py)
_IB_EXP_X0 = -0.6931
_IB_EXP_N = 30
_IB_EXP_A = 0.35815147
_IB_EXP_B = 0.96963238 / _IB_EXP_A
_IB_EXP_C = 1.0 / _IB_EXP_A
_IB_GELU_K = 1.4142
_IB_GELU_N = 6
_IB_GELU_A = -0.2888
_IB_GELU_B = -1.769
_IB_GELU_C = 1.0 / _IB_GELU_A


def _ibert_int_exp(x_int, s, fast_q=False, fast_poly=False):
    """I-BERT integer exp core in-kernel (ops/ibert.py int_exp).

    ``fast_poly``: freeze-gated plain mul-add polynomial (identical bits
    inside the f32-exact envelope — freeze._poly_fast_gate)."""
    x0 = jnp.floor(_rdiv(_IB_EXP_X0, s))
    x_int = jnp.maximum(x_int, _IB_EXP_N * x0)
    # floor(correctly-rounded quotient), matching ops/ibert.int_exp exactly;
    # fast_q swaps in the freeze-gated divide-free exact form
    if fast_q:
        q = _floor_div_int(x_int, x0)
    else:
        q = jnp.floor(_rdiv(x_int, x0))
    r = x_int - x0 * q
    b_int = jnp.floor(_rdiv(_IB_EXP_B, s))
    c_int = jnp.floor(_rdiv(_IB_EXP_C, (s * s)))
    if fast_poly:
        z = r * (r + b_int) + c_int
    else:
        z = _exact_fma(r, r + b_int, c_int)
    return jnp.clip(jnp.floor(z * _pow2(_IB_EXP_N - q)), 0, None)


def _ctx_dot(probs_f32, v_int8, sm_bit, mxu="int8"):
    """probs (non-negative ints held in f32) @ int8 ``v`` -> int32.

    Mosaic on real hardware has no mixed-width integer dot ("Mix int/int -
    NYI", found by scripts/validate_kernels_tpu.py), so the 16-bit-softmax
    path cannot feed an int16 probs matrix to the MXU directly.  Split it
    exactly into two s8 GEMMs: with p in [0, 2**15-1],
    ``p = 256*hi + (lo - 128) + 128`` where ``hi = p >> 8`` in [0, 127] and
    ``lo - 128`` in [-128, 127], so
    ``p @ v = ((hi @ v) << 8) + (lo - 128) @ v + 128 * (ones @ v)``.
    All three dots are s8 x s8 -> s32 (the proven Mosaic form) and the sum
    is exact in int32 (|true ctx| < 2**31 per the envelope audit), hence
    bit-identical to the unfused engine's int16 x int8 dot.
    """
    dims = (((1,), (0,)), ((), ()))
    if mxu == "bf16":
        # v arrives as int8-valued bf16; probs are int8-valued (or split
        # below into int8-valued halves) so every dot is exact bf16 x bf16
        # -> f32 (see _mxu_mode).  The int16-probs recombination runs in
        # int32 (hi<<8 reaches 2**30 where f32 adds would round); the final
        # ctx is f32-exact by the engine's gemm_acc envelope audit.
        if sm_bit <= 8:
            return jax.lax.dot_general(probs_f32.astype(jnp.bfloat16),
                                       v_int8, dims,
                                       preferred_element_type=jnp.float32)
        # dot_lo's worst case is n * 128 * 127 — exact in f32 only while the
        # contraction length stays under 2**24 // (128 * 127) ~ 1032 columns
        # (all current configs: ViT n<=200, Swin n=49).  Longer token
        # streams must chunk like _dot_exact; fail loudly instead of
        # silently rounding (ADVICE r2).
        assert probs_f32.shape[-1] <= 2**24 // (128 * 127), (
            f"bf16 int16-probs ctx dot exceeds the f32-exact envelope at "
            f"n={probs_f32.shape[-1]}; chunk the contraction")
        hi = jnp.floor(probs_f32 * (2.0**-8))
        lo = probs_f32 - hi * 256.0 - 128.0
        ones = jnp.ones(probs_f32.shape, jnp.bfloat16)
        dot_hi = jax.lax.dot_general(hi.astype(jnp.bfloat16), v_int8, dims,
                                     preferred_element_type=jnp.float32)
        dot_lo = jax.lax.dot_general(lo.astype(jnp.bfloat16), v_int8, dims,
                                     preferred_element_type=jnp.float32)
        colsum = jax.lax.dot_general(ones, v_int8, dims,
                                     preferred_element_type=jnp.float32)
        ctx = ((dot_hi.astype(jnp.int32) << 8) + dot_lo.astype(jnp.int32)
               + 128 * colsum.astype(jnp.int32))
        return ctx.astype(jnp.float32)
    if sm_bit <= 8:
        return jax.lax.dot_general(probs_f32.astype(jnp.int8), v_int8, dims,
                                   preferred_element_type=jnp.int32)
    p = probs_f32.astype(jnp.int32)
    hi = (p >> 8).astype(jnp.int8)
    lo = ((p & 255) - 128).astype(jnp.int8)
    ones = jnp.ones((probs_f32.shape[0], v_int8.shape[0]), jnp.int8)
    dot_hi = jax.lax.dot_general(hi, v_int8, dims,
                                 preferred_element_type=jnp.int32)
    dot_lo = jax.lax.dot_general(lo, v_int8, dims,
                                 preferred_element_type=jnp.int32)
    colsum = jax.lax.dot_general(ones, v_int8, dims,
                                 preferred_element_type=jnp.int32)
    return (dot_hi << 8) + dot_lo + 128 * colsum


def _head_pack(num_heads: int, dh: int) -> int:
    """Heads packed per MXU score/ctx dot (``IVIT_HEAD_PACK`` overrides).

    The per-(image, head) attention dots contract over ``dh`` (64 for ViT,
    32 for Swin) — the MXU pads every contraction to K=128, so a lone head
    wastes 2-4x of the array AND pays the per-dot weight-load latency that
    dominates at these sizes (round-2 VERDICT weak #5).  Packing
    ``P = 128 // dh`` heads into one block-diagonal dot fills K=128 with
    exactly the slots padding wasted (performed MACs unchanged) while
    cutting the dot count and growing M by P.  Zero blocks contribute exact
    zeros to integer accumulations, so the packed dots are bit-identical to
    the per-head ones (tests/test_pallas.py, tests/test_swin_engine.py).
    """
    env = os.environ.get("IVIT_HEAD_PACK")
    if env is not None:
        return max(1, int(env))
    return max(1, min(num_heads, 128 // dh))


def _score_dots(qkv, scores_ref, row0, band0, n, c, dh, num_heads, pack,
                ptype, pad_kv=True):
    """Score dots for one image/window: ``pack`` heads per MXU dot.

    ``qkv`` rows ``row0:row0+n`` hold this image's tokens; q/k for heads
    ``h0..h0+p`` are contiguous column slices.  The q operand is expanded
    block-diagonally to ``[p*n, p*dh]`` (head i's rows keep only its own
    ``dh`` columns) so one dot against the joint k slice ``[n, p*dh]``
    yields ``[p*n, n]`` — head-i scores in row band i, which is exactly the
    scores-scratch band layout, stored without any transpose.  Only the q
    side needs masking: k's cross-head columns meet q's exact zeros.

    The scratch lane dim is the 128 multiple of ``n`` (LUT gather slabs need
    aligned 128-lane slices); k is zero-row-padded so the dot emits the full
    lane width — pad columns are exact zeros (the MXU computed those padded
    lanes anyway), and the stores stay full-width (no masked sub-tile
    stores, the op class behind the round-2 Mosaic miscompile).
    """
    l_pad = scores_ref.shape[-1]
    rows = slice(row0, row0 + n)
    for h0 in range(0, num_heads, pack):
        p = min(pack, num_heads - h0)
        q_p = qkv[rows, h0 * dh:(h0 + p) * dh]
        k_p = qkv[rows, c + h0 * dh:c + (h0 + p) * dh]
        if l_pad != n and pad_kv:
            k_p = jnp.pad(k_p, ((0, l_pad - n), (0, 0)))
        if p > 1:
            ri = jax.lax.broadcasted_iota(jnp.int32, (p * n, p * dh), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (p * n, p * dh), 1)
            q_p = jnp.where((ri // n) == (ci // dh), jnp.tile(q_p, (p, 1)),
                            jnp.zeros((), q_p.dtype))
        s = jax.lax.dot_general(q_p, k_p, (((1,), (1,)), ((), ())),
                                preferred_element_type=ptype)
        if l_pad != n and not pad_kv:
            # partial-lane store; the pad lanes stay unwritten and every
            # consumer masks them (see _softmax_lut / n_valid handling)
            scores_ref[band0 + h0 * n:band0 + (h0 + p) * n, :n] = \
                s.astype(jnp.float32)
        else:
            scores_ref[band0 + h0 * n:band0 + (h0 + p) * n, :] = \
                s.astype(jnp.float32)


def _ctx_dots(qkv, scores_ref, ctx_ref, row0, band0, n, c, dh, num_heads,
              pack, sm_bit, mxu, pad_kv=True):
    """Ctx dots for one image/window: ``pack`` heads per MXU dot.

    The probs band ``[p*n, n]`` is already head-stacked in the scratch; one
    dense dot against the joint v slice ``[n, p*dh]`` computes all p*p
    (probs-head, v-head) blocks and the diagonal blocks — the real per-head
    ctx values, each an unmodified contraction over the same n terms, hence
    bit-identical and inside the same gemm_acc envelope — are sliced into
    the ctx scratch.  Off-diagonal blocks are discarded: p*p/p extra MACs
    traded for a p-fold cut in dot count (these dots are latency-bound, not
    MAC-bound — see kernel_microbench).
    """
    l_pad = scores_ref.shape[-1]
    rows = slice(row0, row0 + n)
    for h0 in range(0, num_heads, pack):
        p = min(pack, num_heads - h0)
        v_p = qkv[rows, 2 * c + h0 * dh:2 * c + (h0 + p) * dh]
        probs = scores_ref[band0 + h0 * n:band0 + (h0 + p) * n, :]
        if l_pad != n and pad_kv:
            # probs pad columns are exact zeros (softmax masks them), so
            # zero-row-padded v contributes exactly 0 to the contraction
            v_p = jnp.pad(v_p, ((0, l_pad - n), (0, 0)))
        elif l_pad != n:
            probs = probs[:, :n]
        ctx = _ctx_dot(probs, v_p, sm_bit, mxu)              # [p*n, p*dh]
        if p == 1:
            ctx_ref[rows, h0 * dh:(h0 + 1) * dh] = ctx.astype(jnp.float32)
        else:
            for i in range(p):
                ctx_ref[rows, (h0 + i) * dh:(h0 + i + 1) * dh] = ctx[
                    i * n:(i + 1) * n, i * dh:(i + 1) * dh].astype(jnp.float32)


def _pad_kv(flag, np_=0, c=0, dh=0, pack=1):
    """k/v zero-row padding vs partial-lane stores for the widened scores
    scratch (both bit-identical; compile behavior AND speed differ per
    geometry).

    In-kernel ``jnp.pad`` lowers to ``tpu.concatenate``, which Mosaic
    rejects with "result/input offset mismatch on non-concat dimension"
    whenever the sliced k/v operand's register layout has nonzero lane
    offsets (r4 hardware: Swin stage-96 and the small-image C=192 ViT
    validate geometry).  But where it compiles, padding beats the
    partial-lane stores: the r4 partial-store default cost the DeiT-S
    fused path ~2% (7,177 pad=0 vs 7,301 pad=1 img/s at hoist=0,
    runs/headline_ab_r5.log).  Default: pad on geometries whose k/v head
    slices are lane-aligned and hardware-proven (C a 128 multiple with
    dh=64 — DeiT-S/ViT-B/ViT-L, green since r3), partial stores
    elsewhere.  ``IVIT_PAD_KV`` overrides for A/Bs."""
    env = os.environ.get("IVIT_PAD_KV")
    if env is not None:
        return env not in ("", "0")
    if flag is not None:
        return bool(flag)
    # pack-aware: unpacked dh=64 slices sit at 64-lane offsets for odd
    # heads, which is exactly the nonzero-offset layout Mosaic rejects
    # under jnp.pad (r5 sweep: every head_pack=1 DeiT-S config compiled
    # ONLY with partial stores, runs/autotune_small_r5a.log)
    return (c % 128 == 0 and dh % 64 == 0 and np_ >= 128
            and (pack * dh) % 128 == 0)


def _lut_on() -> bool:
    """Freeze-time LUT paths: OFF by default after the r4 hardware A/B.

    The tables are bit-identical to the towers (validated on TPU:
    runs/val_tpu_r4.pkl, all five configs 0 bits), but Mosaic's
    DynamicGatherOp costs more than the freeze-gated fast towers it
    replaces: DeiT-S ibert fused dropped 7,146 -> 5,707 img/s (1.34x ->
    1.09x bf16, BENCH_MATRIX r4 first pass), DeiT-T/Swin-T were neutral,
    and the ViT-B LUT geometry crashed the compiler.  ``IVIT_LUT=1``
    re-enables for A/Bs on future hardware/toolchains where gather is
    cheaper."""
    return os.environ.get("IVIT_LUT", "0") not in ("", "0")


def _lut_banks(lut, r):
    """Materialize LUT banks for the same-shape lane gather.

    ``lut``: [nb, 128] table (VMEM input read as array).  Mosaic's
    DynamicGatherOp requires operand.shape == indices.shape, so each bank
    row is broadcast across the ``r`` gather rows (a sublane splat — one
    register-fill per bank, hoisted out of the slab loop)."""
    return [jnp.broadcast_to(lut[k:k + 1, :], (r, 128))
            for k in range(lut.shape[0])]


def _gather_banks(idx_slab, banks):
    """256-entry (nb-bank) lookup of one 128-lane slab.

    ``idx_slab``: [r, 128] f32-held ints in [0, nb*128); ``banks``: list of
    [r, 128] operands (broadcast table or per-row tables).  ~6 VPU ops per
    element at nb=2 — the replacement for the ~40-op exp towers
    (VERDICT r3 item 1)."""
    ii = idx_slab.astype(jnp.int32)
    lane = jnp.bitwise_and(ii, 127)
    val = jnp.take_along_axis(banks[0], lane, axis=1)
    for k in range(1, len(banks)):
        vk = jnp.take_along_axis(banks[k], lane, axis=1)
        val = jnp.where(ii >= 128 * k, vk, val)
    return val


def _lut_lookup(idx, banks):
    """Full-width LUT lookup: loop 128-lane slabs of ``idx`` [R, L].

    L must be a multiple of 128 (scores scratch is lane-padded to the
    128 multiple — physically free, VMEM tiles already pad lanes; MLP
    hidden dims are all multiples of 128)."""
    r, l = idx.shape
    assert l % 128 == 0, f"LUT lookup needs 128-multiple lanes, got {l}"
    if l == 128:
        return _gather_banks(idx, banks)
    outs = [_gather_banks(idx[:, s:s + 128], banks)
            for s in range(0, l, 128)]
    return jnp.concatenate(outs, axis=1)


def _softmax_lut(scores, lut, sm_base, sm_bit, n_valid, sum_i32,
                 exp_bits=16, sat=None, sat_mask=None):
    """LUT softmax — bit-identical to the tower forms by table construction
    (engine/luts.py: T[i] = tower(-i) over the full int8-difference domain).

    ``scores``: [R, L] f32-held ints, L a 128 multiple (lanes >= n_valid are
    pad/garbage and fully masked).  ``sat``/``sat_mask``: Swin shifted
    blocks — the additive shift mask pushes scores below the int8 domain;
    those positions' exp equal the freeze-verified saturation constant
    (the tower clamps at n*x0), selected directly.
    """
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, scores.ndim - 1)
    mask = col < n_valid
    x = jnp.where(mask, scores, -(2.0**23))
    x_max = jnp.max(x, axis=-1, keepdims=True)
    idx = jnp.clip(x_max - x, 0.0, 128.0 * lut.shape[0] - 1.0)
    banks = _lut_banks(lut, scores.shape[0])
    exp = _lut_lookup(idx, banks)
    if sat is not None:
        exp = jnp.where(sat_mask, sat, exp)
    exp = jnp.where(mask, exp, 0.0)
    if sm_base == "ivit":
        # sum gate (freeze: n * max(T) < 2**31): ONE exact int32 reduction;
        # the two-limb fallback + INT32_MAX clamp otherwise (identical
        # values — the gate bounds the true sum under the clamp)
        if sum_i32:
            exp_sum = jnp.sum(exp.astype(jnp.int32), axis=-1,
                              keepdims=True).astype(jnp.float32)
        else:
            exp_sum = jnp.minimum(_int_sum(exp), INT32_MAX)
        factor = jnp.floor(_rdiv(INT32_MAX, exp_sum))
        return jnp.floor(exp * factor * (2.0 ** -(31 - sm_bit + 1)))
    if sm_base == "ibert":
        # table already folds the internal 16-bit exp QuantAct: values in
        # [0, 2**15), so the int32 row sum is exact at any n <= 2**16
        exp_sum = jnp.sum(exp.astype(jnp.int32), axis=-1,
                          keepdims=True).astype(jnp.float32)
        factor = jnp.floor(_rdiv(2.0**32, exp_sum))
        return jnp.floor(exp * factor * (2.0 ** -(32 - sm_bit + 1)))
    # ppoly: table folds the exp_bits floor; plain f32 sum (exact: values
    # < 2**(exp_bits-1), n <= 512) + the engine's >=1 clamp
    exp_sum = jnp.clip(jnp.sum(exp, axis=-1, keepdims=True), 1.0, None)
    factor = jnp.floor(_rdiv(2.0**32, exp_sum))
    return jnp.floor(exp * factor * (2.0 ** -(32 - sm_bit + 1)))


def _shift_gelu_lut(x, lut, s_sig, output_bit=8, n=23, fast_q=False):
    """LUT ShiftGELU: per-row sigmoid table, then one gather per element.

    The tower's per-element ``floor(rdiv(INT32_MAX, exp + exp_max))`` is the
    kernel's costliest chain (~22 VPU ops each).  ``exp`` only takes the 256
    values T[i] (i = x_max - x), and ``exp_max`` is constant per row — so
    the whole sigmoid collapses to a per-row 256-entry table built once
    ([R, 256] vectorized, amortized over the hidden dim) and gathered.
    Every op matches the tower path elementwise, so values are identical
    (tests/test_lut.py)."""
    r = x.shape[0]
    x_max = jnp.max(x, axis=-1, keepdims=True)
    exp_max = _int_exp_shift(-x_max, s_sig, n, fast_q)        # [R, 1]
    sig_banks = []
    for k in range(lut.shape[0]):
        t1 = jnp.broadcast_to(lut[k:k + 1, :], (r, 128))
        esum = jnp.minimum(t1 + exp_max, INT32_MAX)
        factor = jnp.floor(_rdiv(INT32_MAX, esum))
        sig_banks.append(jnp.floor(t1 * factor
                                   * (2.0 ** -(31 - output_bit + 1))))
    idx = jnp.clip(x_max - x, 0.0, 128.0 * lut.shape[0] - 1.0)
    return x * _lut_lookup(idx, sig_banks)


def _ibert_gelu_lut(x, lut):
    """LUT ibert GELU: y = x * U[x + 128] with U = erf_int + shift folded
    at freeze (engine/luts.ibert_gelu_lut); input is the int8 fc1 requant."""
    idx = jnp.clip(x + 128.0, 0.0, 128.0 * lut.shape[0] - 1.0)
    return x * _lut_lookup(idx, _lut_banks(lut, x.shape[0]))


def _ppoly_gelu_lut(x, lut):
    """LUT ppoly GELU: the whole Horner + /2**sb + grid re-floor chain
    folded into U[x + 128] (engine/luts.ppoly_gelu_lut)."""
    idx = jnp.clip(x + 128.0, 0.0, 128.0 * lut.shape[0] - 1.0)
    return _lut_lookup(idx, _lut_banks(lut, x.shape[0]))


def _pack_ppoly(bounds, coeffs):
    """Flatten ppoly (bounds, coeffs) into one SMEM f32 array + static dims.

    Returns ``(packed [S-1 + S*(deg+1)], seg, deg)``; a 1-element dummy when
    the family is not ppoly (SMEM inputs are structural)."""
    if bounds is None or coeffs is None:
        return jnp.zeros((1,), jnp.float32), 0, 0
    seg, k = coeffs.shape
    packed = jnp.concatenate([
        jnp.asarray(bounds, jnp.float32).reshape(-1),
        jnp.asarray(coeffs, jnp.float32).reshape(-1)])
    return packed, seg, k - 1


def _ppoly_eval(x, pp_ref, seg, deg):
    """In-kernel ``ops.ppoly.eval_piecewise_poly`` (VERDICT r2 item 8).

    ``pp_ref``: SMEM f32 array ``[bounds (seg-1) | coeffs (seg*(deg+1))]``
    (coeffs highest power first, reference ppoly_backend.py:293-351).
    Segment selection is the same compare-count convention (segment ``s``
    covers ``bounds[s-1] <= x < bounds[s]``), realized as a select chain:
    start from segment 0's coefficients and overwrite whenever ``x`` clears
    the next boundary — pure selects, so every element ends up with exactly
    ``coeffs[seg_idx]`` (no arithmetic reconstruction that could round).
    Horner steps are the two-rounding ``mul_add_2r`` — bit-identical to the
    unfused engine in every compilation context (ops/quant.py doctrine).

    One boundary mask is live at a time (``deg+1`` running coefficient
    planes), keeping scoped VMEM comparable to the ibert branch.
    """
    nb = seg - 1
    cf = [jnp.zeros_like(x) + pp_ref[nb + k] for k in range(deg + 1)]
    for s in range(1, seg):
        ge = x >= pp_ref[s - 1]
        base = nb + s * (deg + 1)
        for k in range(deg + 1):
            cf[k] = jnp.where(ge, pp_ref[base + k], cf[k])
    r = cf[0]
    for k in range(1, deg + 1):
        r = _mul_add_2r(r, x, cf[k])
    return r


def _ppoly_softmax(x, pp_ref, seg, deg, exp_bits, output_bit, n_valid):
    """In-kernel ppoly softmax, bit-identical to engine ``_softmax_int``
    (engine/vit_int.py ppoly branch): max-shift + 127 offset, piecewise-poly
    exp on the 2**30 grid, floor onto the ``exp_bits`` grid, plain f32 row
    sum (exact: exp <= 2**(exp_bits-1), n <= 512), 2**32 factor divide."""
    mask = None
    if n_valid != x.shape[-1]:
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        mask = col < n_valid
        x = jnp.where(mask, x, -(2.0**23))
    x_max = jnp.max(x, axis=-1, keepdims=True)
    x_off = x - x_max + 127.0
    exp_int = jnp.clip(_ppoly_eval(x_off, pp_ref, seg, deg), 0.0, None)
    exp_int = jnp.floor(exp_int * (2.0 ** -(30 - exp_bits + 1)))
    if mask is not None:
        exp_int = jnp.where(mask, exp_int, 0.0)
    exp_sum = jnp.clip(jnp.sum(exp_int, axis=-1, keepdims=True), 1.0, None)
    factor = jnp.floor(_rdiv(2.0**32, exp_sum))
    return jnp.floor(exp_int * factor * (2.0 ** -(32 - output_bit + 1)))


def _ibert_gelu(x, s, fast_poly=False):
    """I-BERT GELU core in-kernel: y_int = x*(erf_int + shift)."""
    se = _rdiv(s, _IB_GELU_K)
    b_int = jnp.floor(_rdiv(_IB_GELU_B, se))
    c_int = jnp.floor(_rdiv(_IB_GELU_C, (se * se)))
    sign = jnp.sign(x)
    a = jnp.minimum(jnp.abs(x), -b_int)
    t = a + b_int
    y = sign * (t * t + c_int) if fast_poly else sign * _exact_fma(t, t, c_int)
    y = jnp.floor(y * (2.0 ** -_IB_GELU_N))
    sig_scale = se * se * _IB_GELU_A * (2.0 ** _IB_GELU_N)
    shift = jnp.floor(_rdiv(1.0, sig_scale))
    return x * (y + shift)


def _newton_sqrt(var, iters=10, k0=2.0**16):
    k = jnp.full_like(var, k0)
    for _ in range(iters):
        k = jnp.floor((k + jnp.floor(_rdiv(var, k))) * 0.5)
    return k


def _mask_pad_lanes(y, c_valid):
    """Zero the zero-padded feature lanes after mean subtraction.

    With ``x`` zero-padded on the lane axis (channel padding to the 128-lane
    tile), the mean/variance reductions stay exact only if the pad lanes —
    which hold ``-mean`` after centering — are masked back to 0 before the
    square-sum.  Valid lanes are untouched, so the LN output is bit-identical
    to the unpadded kernel on the real channels; pad lanes come out as the
    (zero-padded) LN bias and are sliced off by the caller."""
    lane = jax.lax.broadcasted_iota(jnp.int32, y.shape, y.ndim - 1)
    return jnp.where(lane < c_valid, y, 0.0)


def _i_layernorm(x, bias_int, c_valid=None, ablate=""):
    """ivit I-LayerNorm core on f32-held ints (ivit_modules.py:30-65).

    ``c_valid``: real channel count when ``x`` is lane-padded (see
    :func:`_mask_pad_lanes`); ``None`` = all lanes real.  ``ablate``
    stage-drop tokens (kernel_microbench diagnostics ONLY — NOT bit-exact):
    ``ln_sums`` plain f32 reductions, ``ln_newton`` f32 sqrt,
    ``ln_fdiv`` plain reciprocal multiplies for the rdivs."""
    # _rdiv mean, not jnp.mean: XLA/Mosaic strength-reduce divide-by-C into
    # a 1-ulp-sloppy reciprocal multiply, flipping round() ties vs the sim
    c = x.shape[-1] if c_valid is None else c_valid
    if "ln_sums" in ablate:
        s = jnp.sum(x, axis=-1, keepdims=True)
    else:
        s = _int_sum(x)
    if "ln_fdiv" in ablate:
        mean = jnp.round(s * (1.0 / jnp.float32(c)))
    else:
        mean = jnp.round(_rdiv(s, jnp.float32(c)))
    y = x - mean
    if c_valid is not None and c_valid != x.shape[-1]:
        y = _mask_pad_lanes(y, c_valid)
    if "ln_sums" in ablate:
        var = jnp.sum(y * y, axis=-1, keepdims=True)
    else:
        var = _sq_sum(y)
    if "ln_newton" in ablate:
        std = jnp.maximum(jnp.floor(jnp.sqrt(var)), 1.0)
    elif "ln_fdiv" in ablate:
        k = jnp.full_like(var, 2.0**16)
        for _ in range(10):
            k = jnp.floor((k + jnp.floor(var * (1.0 / k))) * 0.5)
        std = k
    else:
        std = _newton_sqrt(var)
    if "ln_fdiv" in ablate:
        factor = jnp.floor(INT32_MAX * (1.0 / std))
    else:
        factor = jnp.floor(_rdiv(INT32_MAX, std))
    return jnp.floor(y * factor * 0.5) + bias_int


def _ibert_layernorm(x, bias_int, pw_shift, c_valid=None):
    """ibert LayerNorm core, frozen shift (ibert_modules.py:112-158).

    ``pw_shift`` is the precomputed exact power 2**shift (freeze-time).
    ``c_valid``: real channel count under lane padding (see
    :func:`_mask_pad_lanes`)."""
    c = x.shape[-1] if c_valid is None else c_valid
    mean = jnp.round(_rdiv(_int_sum(x), jnp.float32(c)))
    y = x - mean
    if c_valid is not None and c_valid != x.shape[-1]:
        y = _mask_pad_lanes(y, c_valid)
    y_sh = jnp.floor(y * (1.0 / pw_shift))
    var = _sq_sum(y_sh)
    std = jnp.floor(jnp.sqrt(var)) * pw_shift
    factor = jnp.floor(_rdiv(2.0**31, std))
    return jnp.floor(y * factor * 0.5) + bias_int


def _requant(acc, m, bits):
    lim = 2.0 ** (bits - 1)
    return jnp.clip(jnp.round(acc * m), -lim, lim - 1)


def _ln_requant(y, sln, m, bits):
    """LN-edge requant on the exact LN integer (see
    engine/vit_int._ln_requant: the sim's LN edges now carry the exact int,
    so no lossy float-roundtrip replication remains — the round-2 version
    ran a correctly-rounded divide per element here).  ``sln`` unused."""
    del sln
    return _requant(y, m, bits)


def _shift_gelu(x, s_sig, output_bit=8, n=23, fast_q=False):
    x_max = jnp.max(x, axis=-1, keepdims=True)
    exp_int = _int_exp_shift(x - x_max, s_sig, n, fast_q)
    exp_max = _int_exp_shift(-x_max, s_sig, n, fast_q)
    exp_sum = jnp.minimum(exp_int + exp_max, INT32_MAX)
    factor = jnp.floor(_rdiv(INT32_MAX, exp_sum))
    sigmoid_int = jnp.floor(exp_int * factor * (2.0 ** -(31 - output_bit + 1)))
    return x * sigmoid_int


def _mlp_kernel(x_ref, lnin_ref, lnb_ref, sln_ref, mln_ref, w1_ref, b1_ref,
                m1_ref, w2_ref, b2_ref, m2_ref, sc_ref, pp_ref, glut_ref,
                o_ref, *,
                ln_base, gelu_base, mlp_bits, out_bits, fast_exp, fast_poly,
                mxu, pp_seg=0, pp_deg=0, pp_scale_bits=22, pp_fastdiv=False,
                pp_npatch=0, ablate="", c_valid=None, gelu_lut=False,
                hoisted_ln=False):
    bf16 = mxu == "bf16"
    x_in = x_ref[...].astype(jnp.float32)
    s_sig = sc_ref[0]       # s_gelu * 1.702
    m_gelu = sc_ref[1]
    m_res_x = sc_ref[2]
    m_res_id = sc_ref[3]
    pw_shift = sc_ref[4]
    s_pp_out = sc_ref[5]    # ppoly gelu output grid (freeze gelu_s_out)
    s_pp_c = sc_ref[6]      # fast-div multiplier (freeze gelu_s_out_c)

    # ``ablate`` is a perf-diagnostic switch for scripts/kernel_microbench.py
    # ONLY (never set by the engine): it drops a stage to attribute kernel
    # time between the MXU GEMMs and the VPU nonlinearity chains.
    if hoisted_ln:
        # LN + requant hoisted to XLA (engine _hoisted_ln8): the in-kernel
        # per-row Newton/rdiv chains are latency-bound (serial dependency
        # chain paid once per grid step — lane packing does NOT help, see
        # runs/ln_diag_tiny_r4.log); XLA runs ONE lane-packed chain for
        # all rows of the model instead.  Bit-identical: the hoisted form
        # is the unfused engine LN already asserted equal to the in-kernel
        # one (tests/test_engine.py, test_pallas.py).
        y = lnin_ref[...].astype(jnp.float32)
    elif "ln" in ablate and "ln_" not in ablate:
        y = jnp.clip(x_in, -128.0, 127.0)
    elif ln_base == "ivit":
        y = _i_layernorm(x_in, lnb_ref[...], c_valid, ablate)
        y = _ln_requant(y, sln_ref[...], mln_ref[...], 8)
    else:
        y = _ibert_layernorm(x_in, lnb_ref[...], pw_shift, c_valid)
        y = _ln_requant(y, sln_ref[...], mln_ref[...], 8)

    if "fc1gemm" in ablate:
        # per-GEMM-site attribution (kernel_microbench): cheap tile-copy
        # stand-in with the fc1 output shape
        reps = w1_ref.shape[1] // y.shape[1]
        h = jnp.clip(jnp.tile(y, (1, max(1, reps)))[:, :w1_ref.shape[1]],
                     -128.0, 127.0)
    elif bf16:
        acc = _dot_exact(y, w1_ref[...]) + b1_ref[...]
        h = _requant(acc, m1_ref[...], 8)
    else:
        acc = jax.lax.dot_general(y.astype(jnp.int8), w1_ref[...],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        acc = acc + b1_ref[...]
        h = _requant(acc.astype(jnp.float32), m1_ref[...], 8)

    if "gelu" in ablate:
        g = h
    else:
        if gelu_base == "ivit":
            if gelu_lut:
                g = _shift_gelu_lut(h, glut_ref[...], s_sig, fast_q=fast_exp)
            else:
                g = _shift_gelu(h, s_sig, fast_q=fast_exp)
        elif gelu_base == "ppoly":
            if gelu_lut:
                g = _ppoly_gelu_lut(h, glut_ref[...])
            elif pp_fastdiv:
                # engine fast-div branch bit-for-bit: ONE multiply + sparse
                # fixups, proven == floor(rdiv(y/2**sb, s_out)) over the
                # whole int8 input domain at freeze
                # (freeze._ppoly_fastdiv_gate) — replaces the per-element
                # Dekker divide that dominated the ppoly MLP kernel
                # (BENCH_MATRIX r4: 23.6ms vs ibert's 12.3)
                y_int = _ppoly_eval(h, pp_ref, pp_seg, pp_deg)
                g = jnp.floor(y_int * s_pp_c)
                for j in range(pp_npatch):
                    g = g + jnp.where(h == sc_ref[7 + 2 * j],
                                      sc_ref[8 + 2 * j], 0.0)
            else:
                # engine _gelu_int ppoly branch bit-for-bit: Horner ints on
                # the 2**scale_bits grid, exact /2**sb, floor onto the
                # backend grid
                y_int = _ppoly_eval(h, pp_ref, pp_seg, pp_deg)
                g = jnp.floor(_rdiv(y_int * (2.0 ** -pp_scale_bits),
                                    s_pp_out))
        else:
            # s_sig carries raw s_gelu for ibert
            if gelu_lut:
                g = _ibert_gelu_lut(h, glut_ref[...])
            else:
                g = _ibert_gelu(h, s_sig, fast_poly)
        g = _requant(g, m_gelu, 8)

    if "fc2gemm" in ablate:
        y2 = _requant(g[:, :x_in.shape[1]], m2_ref[...], mlp_bits)
    elif bf16:
        acc = _dot_exact(g, w2_ref[...]) + b2_ref[...]
        # fc2 requants into ITS OWN container (mlp_out bitwidth) before the
        # residual's wider clip — on Swin these differ (8 vs 16) and using
        # one width silently skipped the engine's 8-bit clamp
        y2 = _requant(acc, m2_ref[...], mlp_bits)
    else:
        acc = jax.lax.dot_general(g.astype(jnp.int8), w2_ref[...],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        acc = acc + b2_ref[...]
        y2 = _requant(acc.astype(jnp.float32), m2_ref[...], mlp_bits)

    lim = 2.0 ** (out_bits - 1)
    out = jnp.clip(jnp.round(y2 * m_res_x) + jnp.round(x_in * m_res_id),
                   -lim, lim - 1)
    o_ref[...] = out.astype(o_ref.dtype)


def mlp_block_p(x_int, *, ln_bias, s_ln, m_ln, ln_shift, fc1_w, fc1_b, m_fc1,
                s_gelu, m_gelu, fc2_w, fc2_b, m_fc2, m_res_x, m_res_id,
                ln_base="ivit", gelu_base="ivit", mlp_bits=8, out_bits=8,
                out_dtype=jnp.int8, fast_exp: bool = False,
                fast_poly: bool = False,
                gelu_bounds=None, gelu_coeffs=None, gelu_s_out=None,
                gelu_scale_bits: int = 22, gelu_fastdiv: bool = False,
                gelu_s_out_c=None, gelu_patch_h=None, gelu_patch_d=None,
                gelu_lut=None,
                tile_rows: int = 512, interpret: bool = False, ablate="",
                mxu: str | None = None, c_valid: int | None = None,
                ln_in=None):
    """Fused MLP half-block; ``x_int`` int8/int16 [R, C] token stream.

    Wait-free residual: the kernel re-reads its own input tile for the
    integer residual add, so the caller passes the *block input* once.

    ``gelu_base='ppoly'`` runs the in-kernel piecewise-poly Horner
    (``gelu_bounds``/``gelu_coeffs``/``gelu_s_out`` from the freeze step,
    reference ppoly_backend.py:293-351).

    ``c_valid``: real channel count when the caller zero-pads C onto the
    128-lane grid (Swin stage0/1, dims 96/192) — weights/bias/multipliers
    must be zero-padded to match; the LN reductions mask pad lanes
    (:func:`_mask_pad_lanes`), every later stage maps zeros to zeros, and
    the caller slices the output back to ``c_valid``.  Bit-identical to
    the unpadded path on the real channels (tests/test_swin_engine.py).
    """
    mxu = _mxu_mode() if mxu is None else mxu
    r, c = x_int.shape
    hd = fc1_w.shape[1]
    tile = _mlp_tile(tile_rows, r, hd, mxu, gelu_base)
    grid = (pl.cdiv(r, tile),)
    if mxu == "bf16":
        fc1_w, fc2_w = fc1_w.astype(jnp.bfloat16), fc2_w.astype(jnp.bfloat16)
        # biases are f32-exact ints by scheme (the sim adds them in f32)
        fc1_b, fc2_b = fc1_b.astype(jnp.float32), fc2_b.astype(jnp.float32)
    gelu_s = (jnp.reshape(s_gelu, ()).astype(jnp.float32) * 1.702
              if gelu_base == "ivit"
              else jnp.reshape(s_gelu, ()).astype(jnp.float32))
    scalars = jnp.stack([
        gelu_s,
        jnp.reshape(m_gelu, ()).astype(jnp.float32),
        jnp.reshape(m_res_x, ()).astype(jnp.float32),
        jnp.reshape(m_res_id, ()).astype(jnp.float32),
        jnp.exp2(jnp.round(jnp.reshape(ln_shift, ()))).astype(jnp.float32),
        (jnp.reshape(gelu_s_out, ()).astype(jnp.float32)
         if gelu_s_out is not None else jnp.float32(1.0)),
        (jnp.reshape(gelu_s_out_c, ()).astype(jnp.float32)
         if gelu_s_out_c is not None else jnp.float32(1.0)),
    ])
    use_fastdiv = bool(gelu_fastdiv and gelu_s_out_c is not None)
    n_patch = 0
    if use_fastdiv and gelu_patch_h is not None:
        # sparse fixup pairs (freeze gelu_patch_h/_d) interleaved after the
        # base scalars: sc_ref[7+2j] = h_j, sc_ref[8+2j] = d_j.  The patch
        # COUNT is static (kernel unrolls the compare-selects); freeze pads
        # to a fixed length, so one variant serves every block.
        ph = jnp.asarray(gelu_patch_h, jnp.float32).reshape(-1)
        pd = jnp.asarray(gelu_patch_d, jnp.float32).reshape(-1)
        n_patch = int(ph.shape[0])
        scalars = jnp.concatenate(
            [scalars, jnp.stack([ph, pd], axis=1).reshape(-1)])
    pp, pp_seg, pp_deg = _pack_ppoly(gelu_bounds, gelu_coeffs)
    use_glut = gelu_lut is not None and _lut_on()
    glut = (jnp.asarray(gelu_lut, jnp.float32).reshape(-1, 128)
            if use_glut else jnp.zeros((1, 128), jnp.float32))

    hoist = ln_in is not None
    # an ablate LN-drop token would be silently shadowed by a hoisted LN
    # (the kernel reads lnin_ref before the ablate branch), misattributing
    # microbench time (ADVICE r4)
    assert not (hoist and "ln" in ablate and "ln_" not in ablate), \
        "hoisted ln_in and an 'ln' ablate token are mutually exclusive"
    if not hoist:
        ln_in = jnp.zeros((1, c), jnp.int8)
    lnin_spec = (pl.BlockSpec((tile, c), lambda i: (i, 0),
                              memory_space=pltpu.VMEM) if hoist
                 else pl.BlockSpec((1, c), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM))
    interp = _interp(interpret)
    with _kernel_trace(interp):
        out = pl.pallas_call(
            functools.partial(_mlp_kernel, ln_base=ln_base, gelu_base=gelu_base,
                              mlp_bits=mlp_bits, out_bits=out_bits,
                              fast_exp=fast_exp, fast_poly=fast_poly,
                              mxu=mxu, pp_seg=pp_seg, pp_deg=pp_deg,
                              pp_scale_bits=gelu_scale_bits,
                              pp_fastdiv=use_fastdiv, pp_npatch=n_patch,
                              ablate=ablate,
                              c_valid=c_valid, gelu_lut=use_glut,
                              hoisted_ln=hoist),
            name="mlp_block_kernel",
            out_shape=jax.ShapeDtypeStruct((r, c), out_dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
                lnin_spec,
                pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((c, hd), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hd), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hd), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((hd, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((glut.shape[0], 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interp,
        )(x_int, ln_in,
          ln_bias.astype(jnp.float32).reshape(1, c),
          s_ln.astype(jnp.float32).reshape(1, c),
          m_ln.astype(jnp.float32).reshape(1, c),
          fc1_w, fc1_b.reshape(1, hd), m_fc1.astype(jnp.float32).reshape(1, hd),
          fc2_w, fc2_b.reshape(1, c), m_fc2.astype(jnp.float32).reshape(1, c),
          scalars, pp, glut)
    return out


# ---------------------------------------------------------------------------
# Fused attention half-block
# ---------------------------------------------------------------------------

def _attn_img_tile(img_tile: int, b: int, np_: int, c: int, num_heads: int,
                   sm_base: str) -> int:
    """Image-tile selection for the fused ViT attention kernel.

    Caps the tile by the Mosaic 16MB scoped-VMEM stack.  Live f32
    temporaries scale with the qkv chain ([t*Np, 3C], ~2 planes) and the
    softmax chain ([t*H*Np, Np] lane-padded to the 128 multiple) whose live
    plane count is family-dependent: the ivit shift-exp tower holds ~3.3
    planes, the ibert fast path ~1.5.  Constants bracket the real-TPU
    compile outcomes (runs/tpu_session.log vmem_geometries): PASS deit_small
    ivit t=2 / deit_base ibert t=2 / deit_tiny ivit t=4, FAIL deit_base
    ivit t=2 / vit_large both t=2 / deit_tiny t=8.
    tests/test_vmem_budget.py pins these; scripts/check_vmem_geometries.py
    compiles them on hardware.
    """
    lanes = -(-np_ // 128) * 128
    s_planes = 1.5 if sm_base == "ibert" else 3.3
    env = os.environ.get("IVIT_ATTN_SPLANES")
    if env:
        # hardware-sweep override (kernel_microbench): the LUT softmax keeps
        # fewer live planes than the towers; re-calibrate on real compiles
        # before changing the default constant
        s_planes = float(env)
    per_img = np_ * (3 * c) * 4 * 1.5 + num_heads * np_ * lanes * 4 * s_planes
    cap = max(1, int(_VMEM_BUDGET * 7 / 8 / per_img))
    return max(1, min(img_tile, cap, b))


def _shiftmax(x, s, output_bit, n_valid, fast_q=False):
    """In-kernel Shiftmax over the last axis with pad-column masking."""
    mask = None
    if n_valid != x.shape[-1]:
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        mask = col < n_valid
        x = jnp.where(mask, x, -(2.0**23))
    x_max = jnp.max(x, axis=-1, keepdims=True)
    exp_int = _int_exp_shift(x - x_max, s, 15, fast_q)
    if mask is not None:
        exp_int = jnp.where(mask, exp_int, 0.0)
    exp_sum = jnp.minimum(_int_sum(exp_int), INT32_MAX)
    factor = jnp.floor(_rdiv(INT32_MAX, exp_sum))
    return jnp.floor(exp_int * factor * (2.0 ** -(31 - output_bit + 1)))


def _ibert_softmax(x, s, m_exp_act, output_bit, n_valid, fast_q=False,
                   fast_poly=False):
    """In-kernel I-BERT softmax with the internal 16-bit exp requant.

    ``m_exp_act`` is the correctly-rounded f32 reciprocal of the exp
    QuantAct scale (computed once by the caller); the per-element requant
    is a single multiply, matching the sim (models/layers._ExpRangeAct)
    and unfused engine bit-for-bit.
    """
    mask = None
    if n_valid != x.shape[-1]:
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        mask = col < n_valid
        x = jnp.where(mask, x, -(2.0**23))
    x_max = jnp.max(x, axis=-1, keepdims=True)
    exp_int = _ibert_int_exp(x - x_max, s, fast_q, fast_poly)
    if mask is not None:
        exp_int = jnp.where(mask, exp_int, 0.0)
    exp16 = jnp.clip(jnp.round(exp_int * m_exp_act),
                     -(2.0**15), 2.0**15 - 1)
    # exp16 in [0, 2**15): a plain f32 sum is exact (== the engine's
    # two-limb exact_int_sum) while n * 2**15 < 2**24, i.e. n <= 512 —
    # all current configs (ViT n<=200, Swin n=49)
    if x.shape[-1] * 2.0**15 < 2.0**24:
        exp_sum = jnp.sum(exp16, axis=-1, keepdims=True)
    else:
        exp_sum = _int_sum(exp16)
    factor = jnp.floor(_rdiv(2.0**32, exp_sum))
    return jnp.floor(exp16 * factor * (2.0 ** -(32 - output_bit + 1)))


def _attn_kernel(x_ref, lnin_ref, lnb_ref, sln_ref, mln_ref, wqkv_ref,
                 bqkv_ref, mqkv_ref, wproj_ref, bproj_ref, mproj_ref, sc_ref,
                 pp_ref, smlut_ref, o_ref,
                 ctx_ref, scores_ref, *, ln_base, sm_base, num_heads, ablate,
                 n_valid, sm_bit, proj_bits, out_bits, attn_bits, fast_exp,
                 fast_poly, mxu, pp_seg=0, pp_deg=0, pp_exp_bits=16,
                 sm_lut=False, sm_sum_i32=False, pad_kv=True,
                 head_pack=None, hoisted_ln=False):
    bf16 = mxu == "bf16"
    t, np_, c = x_ref.shape
    dh = c // num_heads
    x_in = x_ref[...].astype(jnp.float32).reshape(t * np_, c)
    m_attn = sc_ref[0]
    s_attn = sc_ref[1]
    m_av = sc_ref[2]
    m_res_x = sc_ref[3]
    m_res_id = sc_ref[4]
    pw_shift = sc_ref[5]
    m_exp_act = sc_ref[6]

    # ``ablate``: perf-diagnostic stage dropping for kernel_microbench only
    if hoisted_ln:
        # LN + requant hoisted to XLA (see _mlp_kernel's hoisted_ln note)
        y = lnin_ref[...].astype(jnp.float32).reshape(t * np_, c)
    elif "ln" in ablate and "ln_" not in ablate:
        y = jnp.clip(x_in, -128.0, 127.0)
    elif ln_base == "ivit":
        y = _i_layernorm(x_in, lnb_ref[...], ablate=ablate)
        y = _ln_requant(y, sln_ref[...], mln_ref[...], 8)
    else:
        y = _ibert_layernorm(x_in, lnb_ref[...], pw_shift)
        y = _ln_requant(y, sln_ref[...], mln_ref[...], 8)

    if "qkvgemm" in ablate:
        # per-GEMM-site attribution (kernel_microbench): replace the qkv
        # dot with a cheap tile-copy of comparable output shape
        qkv = jnp.tile(y, (1, 3)).astype(jnp.int8)
    elif bf16:
        if n_valid != np_:
            # padding-token rows are all-zero -> LN variance 0 -> factor inf
            # -> NaN.  The int8 path launders those NaNs through the int8
            # cast (pad rows never reach valid outputs: softmax zeroes pad
            # columns so k/v pad rows always multiply by an exact 0), but
            # bf16 keeps NaN and 0.0 * NaN would poison the ctx contraction.
            # Zeroing pad rows here is value-neutral for every valid output.
            idx = jax.lax.broadcasted_iota(jnp.int32, (t * np_, 1), 0)
            tok = idx - (idx // np_) * np_
            y = jnp.where(tok < n_valid, y, 0.0)
        acc = _dot_exact(y, wqkv_ref[...]) + bqkv_ref[...]
        qkv = _requant(acc, mqkv_ref[...], 8).astype(jnp.bfloat16)
    else:
        acc = jax.lax.dot_general(y.astype(jnp.int8), wqkv_ref[...],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        acc = acc + bqkv_ref[...]
        qkv = _requant(acc.astype(jnp.float32),
                       mqkv_ref[...], 8).astype(jnp.int8)
    ptype = jnp.float32 if bf16 else jnp.int32

    # per-(image, head) score GEMMs land in one scratch so the requant +
    # softmax VPU chain (the exp tower dominates the elementwise cost) runs
    # ONCE over [t*H*Np, Np] instead of t*H times over [Np, Np] — shiftmax
    # is row-local, so the batched evaluation is bit-identical.
    pack = head_pack or _head_pack(num_heads, dh)
    if "qk" in ablate:
        # ablation: skip the per-head score dots AND their slice extractions
        scores_ref[...] = jnp.full(scores_ref.shape, 7.0, jnp.float32)
    else:
        for ti in range(t):
            _score_dots(qkv, scores_ref, ti * np_, ti * num_heads * np_,
                        np_, c, dh, num_heads, pack, ptype, pad_kv)

    lim_a = 2.0 ** (attn_bits - 1)
    scores = jnp.clip(jnp.round(scores_ref[...] * m_attn), -lim_a, lim_a - 1)
    if "softmax" in ablate:
        probs_all = jnp.clip(scores, 0.0, 127.0)
    elif sm_lut:
        probs_all = _softmax_lut(scores, smlut_ref[...], sm_base, sm_bit,
                                 n_valid, sm_sum_i32, exp_bits=pp_exp_bits)
    elif sm_base == "ivit":
        probs_all = _shiftmax(scores, s_attn, sm_bit, n_valid, fast_exp)
    elif sm_base == "ppoly":
        probs_all = _ppoly_softmax(scores, pp_ref, pp_seg, pp_deg,
                                   pp_exp_bits, sm_bit, n_valid)
    else:
        probs_all = _ibert_softmax(scores, s_attn, m_exp_act, sm_bit, n_valid,
                                   fast_exp, fast_poly)
    scores_ref[...] = probs_all

    # ctx scratch is f32 (8x128 tiles): int8 scratch (32x128 tiles) hit a
    # Mosaic masked-store miscompile on sub-tile stores (rows n-strided,
    # cols Dh-strided) — 36 dropped/corrupt elements on Swin-T stage1,
    # bisected by scripts/debug_swin_kernel_stage.py; f32 tiles store
    # exactly.  The requant output is already f32-held int8 values.
    if "av" in ablate:
        # ablation: skip the per-head ctx dots and slice/store strides
        ctx_ref[...] = qkv[:, :c].astype(jnp.float32)
    else:
        # raw ctx ints into the scratch; ONE batched requant afterwards
        # (elementwise, so bit-identical — avoids t*H tiny VPU op rounds)
        for ti in range(t):
            _ctx_dots(qkv, scores_ref, ctx_ref, ti * np_,
                      ti * num_heads * np_, np_, c, dh, num_heads, pack,
                      sm_bit, mxu, pad_kv)
        ctx_ref[...] = _requant(ctx_ref[...], m_av, 8)

    if "projgemm" in ablate:
        y2 = _requant(ctx_ref[...], mproj_ref[...], proj_bits)
    elif bf16:
        acc = _dot_exact(ctx_ref[...], wproj_ref[...]) + bproj_ref[...]
        y2 = _requant(acc, mproj_ref[...], proj_bits)
    else:
        acc = jax.lax.dot_general(ctx_ref[...].astype(jnp.int8),
                                  wproj_ref[...],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        acc = acc + bproj_ref[...]
        y2 = _requant(acc.astype(jnp.float32), mproj_ref[...], proj_bits)

    lim = 2.0 ** (out_bits - 1)
    out = jnp.clip(jnp.round(y2 * m_res_x) + jnp.round(x_in * m_res_id),
                   -lim, lim - 1)
    o_ref[...] = out.reshape(t, np_, c).astype(o_ref.dtype)


def attn_block_p(x_int, *, ln_bias, s_ln, m_ln, ln_shift, qkv_w, qkv_b, m_qkv,
                 m_attn, s_attn, m_av, proj_w, proj_b, m_proj,
                 m_res_x, m_res_id, num_heads, n_valid,
                 ln_base="ivit", sm_base="ivit", s_exp_act=None,
                 sm_bit=8, attn_bits=8, proj_bits=8, out_bits=8,
                 out_dtype=jnp.int8, fast_exp: bool = False,
                 fast_poly: bool = False,
                 sm_bounds=None, sm_coeffs=None, exp_bits: int = 16,
                 sm_lut=None, sm_sum_i32: bool = False,
                 img_tile: int = 2, head_pack: int | None = None,
                 interpret: bool = False, ablate="",
                 mxu: str | None = None, pad_kv: bool | None = None,
                 ln_in=None):
    """Fused attention half-block on the padded token stream.

    ``x_int``: int8/int16 [B, Np, C] with Np a multiple of 8 (token padding;
    ``n_valid`` real tokens).  Per grid program: LN -> qkv GEMM -> per-head
    int8 attention with in-VMEM softmax (ivit/ibert/ppoly families) -> proj
    GEMM -> integer residual.
    """
    mxu = _mxu_mode() if mxu is None else mxu
    b, np_, c = x_int.shape
    t = _attn_img_tile(img_tile, b, np_, c, num_heads, sm_base)
    grid = (pl.cdiv(b, t),)
    if mxu == "bf16":
        qkv_w, proj_w = qkv_w.astype(jnp.bfloat16), proj_w.astype(jnp.bfloat16)
        qkv_b, proj_b = qkv_b.astype(jnp.float32), proj_b.astype(jnp.float32)
    scalars = jnp.stack([
        jnp.reshape(m_attn, ()).astype(jnp.float32),
        jnp.reshape(s_attn, ()).astype(jnp.float32),
        jnp.reshape(m_av, ()).astype(jnp.float32),
        jnp.reshape(m_res_x, ()).astype(jnp.float32),
        jnp.reshape(m_res_id, ()).astype(jnp.float32),
        jnp.exp2(jnp.round(jnp.reshape(ln_shift, ()))).astype(jnp.float32),
        # correctly-rounded reciprocal of the exp QuantAct scale: the
        # per-element 16-bit exp requant is then one in-kernel multiply
        (_rdiv(1.0, jnp.reshape(s_exp_act, ()).astype(jnp.float32))
         if s_exp_act is not None else jnp.float32(1.0)),
    ])
    pp, pp_seg, pp_deg = _pack_ppoly(sm_bounds, sm_coeffs)
    use_smlut = sm_lut is not None and _lut_on()
    smlut = (jnp.asarray(sm_lut, jnp.float32).reshape(-1, 128)
             if use_smlut else jnp.zeros((1, 128), jnp.float32))
    l_pad = -(-np_ // 128) * 128   # scratch lane width: LUT slab alignment
    hoist = ln_in is not None
    # an ablate LN-drop token would be silently shadowed by a hoisted LN
    # (the kernel reads lnin_ref before the ablate branch), misattributing
    # microbench time (ADVICE r4)
    assert not (hoist and "ln" in ablate and "ln_" not in ablate), \
        "hoisted ln_in and an 'ln' ablate token are mutually exclusive"
    if not hoist:
        ln_in = jnp.zeros((1, 1, c), jnp.int8)
    lnin_spec = (pl.BlockSpec((t, np_, c), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM) if hoist
                 else pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM))
    interp = _interp(interpret)
    with _kernel_trace(interp):
        out = pl.pallas_call(
            functools.partial(_attn_kernel, ln_base=ln_base, sm_base=sm_base,
                              num_heads=num_heads, ablate=ablate,
                              n_valid=n_valid, sm_bit=sm_bit, proj_bits=proj_bits,
                              out_bits=out_bits, attn_bits=attn_bits,
                              fast_exp=fast_exp, fast_poly=fast_poly, mxu=mxu,
                              pp_seg=pp_seg, pp_deg=pp_deg,
                              pp_exp_bits=exp_bits, sm_lut=use_smlut,
                              sm_sum_i32=sm_sum_i32,
                              pad_kv=_pad_kv(
                                  pad_kv, np_, c, c // num_heads,
                                  head_pack or _head_pack(num_heads,
                                                          c // num_heads)),
                              head_pack=head_pack,
                              hoisted_ln=hoist),
            name="attn_block_kernel",
            out_shape=jax.ShapeDtypeStruct((b, np_, c), out_dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((t, np_, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                lnin_spec,
                pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((c, 3 * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((smlut.shape[0], 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((t, np_, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((t * np_, c), jnp.float32),
                            pltpu.VMEM((t * num_heads * np_, l_pad),
                                       jnp.float32)],
            interpret=interp,
        )(x_int, ln_in,
          ln_bias.astype(jnp.float32).reshape(1, c),
          s_ln.astype(jnp.float32).reshape(1, c),
          m_ln.astype(jnp.float32).reshape(1, c),
          qkv_w, qkv_b.reshape(1, 3 * c), m_qkv.astype(jnp.float32).reshape(1, 3 * c),
          proj_w, proj_b.reshape(1, c), m_proj.astype(jnp.float32).reshape(1, c),
          scalars, pp, smlut)
    return out


def _swin_win_tile(win_tile: int, bw: int, n: int, c: int, num_heads: int,
                   n_windows: int, has_mask: bool) -> int:
    """Window-tile selection for the fused Swin attention kernel.

    Windows are independent, so the tile may span images (stage3 has nW=1);
    only the shift mask couples a window to its within-image index, handled
    by tiling the mask when wt > nW.  The tile is capped by the Mosaic
    scoped-VMEM stack (16MB): live f32 temporaries scale with the qkv chain
    ([wt*n, 3c], ~3 planes) and the softmax chain ([wt*H*n, n] lane-padded
    to 128, ~4 planes).  The constants reproduce the measured 29.31M stack
    at (wt=8, n=56, c=768, H=24) — Swin-T stage3 — within ~10%;
    tests/test_vmem_budget.py walks every real stage geometry through this
    arithmetic and scripts/check_vmem_geometries.py compiles them on TPU.
    """
    per_win = n * (3 * c) * 4 * 3 + num_heads * n * 128 * 4 * 4
    wt_cap = max(1, _VMEM_BUDGET * 7 // 8 // per_win)
    for cand in range(min(win_tile, wt_cap, bw), 0, -1):
        if bw % cand == 0 and (not has_mask or n_windows % cand == 0
                               or cand % n_windows == 0):
            return cand
    return 1


def _swin_attn_kernel(x_ref, lnin_ref, lnb_ref, sln_ref, mln_ref, wqkv_ref,
                      bqkv_ref, mqkv_ref, rel_ref, mask_ref, wproj_ref,
                      bproj_ref, mproj_ref, sc_ref, pp_ref, smlut_ref, o_ref,
                      ctx_ref, scores_ref, *,
                      ln_base, sm_base, num_heads, sm_bit, mask_per_win,
                      fast_exp, fast_poly, mxu, n_valid, ablate="",
                      pp_seg=0, pp_deg=0, pp_exp_bits=16,
                      sm_lut=False, sm_sum_i32=False, pad_kv=True,
                      hoisted_ln=False):
    bf16 = mxu == "bf16"
    wt, n, c = x_ref.shape
    hd = c // num_heads
    x_in = x_ref[...].astype(jnp.float32).reshape(wt * n, c)
    m_attn = sc_ref[0]
    m_attn2 = sc_ref[1]
    s_attn = sc_ref[2]
    m_av = sc_ref[3]
    m_res_x = sc_ref[4]
    m_res_id = sc_ref[5]
    pw_shift = sc_ref[6]
    m_exp_act = sc_ref[7]

    if hoisted_ln:
        # LN + requant hoisted to XLA (see _mlp_kernel's hoisted_ln note)
        y = lnin_ref[...].astype(jnp.float32).reshape(wt * n, c)
    elif "ln" in ablate:
        y = jnp.clip(x_in, -128.0, 127.0)
    else:
        if ln_base == "ivit":
            y = _i_layernorm(x_in, lnb_ref[...])
        else:
            y = _ibert_layernorm(x_in, lnb_ref[...], pw_shift)
        y = _ln_requant(y, sln_ref[...], mln_ref[...], 8)

    if bf16:
        if n_valid != n:
            # zero-padded window rows -> LN var 0 -> factor inf -> NaN; the
            # int8 path launders NaN through the int8 cast (pad scores
            # columns are softmax-masked so pad k/v rows always meet exact
            # zeros), but bf16 would poison the ctx dot (see _attn_kernel)
            idx = jax.lax.broadcasted_iota(jnp.int32, (wt * n, 1), 0)
            tok = idx - (idx // n) * n
            y = jnp.where(tok < n_valid, y, 0.0)
        acc = _dot_exact(y, wqkv_ref[...]) + bqkv_ref[...]
        qkv = _requant(acc, mqkv_ref[...], 8).astype(jnp.bfloat16)
    else:
        acc = jax.lax.dot_general(y.astype(jnp.int8), wqkv_ref[...],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        acc = acc + bqkv_ref[...]
        qkv = _requant(acc.astype(jnp.float32),
                       mqkv_ref[...], 8).astype(jnp.int8)
    ptype = jnp.float32 if bf16 else jnp.int32

    # raw per-(window, head) score dots into one scratch (each dot is
    # f32-exact: |s32| <= hd * 127^2 < 2**24), then ONE batched epilogue:
    # requant, rel-pos bias BEFORE the int8 clip, shift mask AFTER it —
    # exactly the per-op engine order (engine/swin_int.py), elementwise, so
    # batching is bit-identical.  ``rel_ref``/``mask_ref`` arrive pre-tiled
    # to the scratch row layout [wt*H*n, n] (wrapper constants), which
    # removes every per-dot VPU round from the loop.
    pack = _head_pack(num_heads, hd)
    if "qk" in ablate:
        scores_ref[...] = jnp.full(scores_ref.shape, 7.0, jnp.float32)
    else:
        for w in range(wt):
            _score_dots(qkv, scores_ref, w * n, w * num_heads * n,
                        n, c, hd, num_heads, pack, ptype, pad_kv)
        s = jnp.clip(jnp.round(scores_ref[...] * m_attn), -128.0, 127.0)
        a = jnp.clip(jnp.round(s * m_attn2) + rel_ref[...], -128.0, 127.0)
        if mask_per_win:
            a = a + mask_ref[...]
        scores_ref[...] = a

    if "softmax" in ablate:
        probs = jnp.clip(scores_ref[...], 0.0, 127.0)
    elif sm_lut:
        # shifted blocks: the additive mask pushes scores below the int8
        # LUT domain; those positions' exp equal the freeze-verified
        # saturation constant sc_ref[8] (see engine/luts.py mask gate)
        sat = sc_ref[8] if mask_per_win else None
        sat_mask = (mask_ref[...] < 0.0) if mask_per_win else None
        probs = _softmax_lut(scores_ref[...], smlut_ref[...], sm_base,
                             sm_bit, n_valid, sm_sum_i32,
                             exp_bits=pp_exp_bits, sat=sat,
                             sat_mask=sat_mask)
    elif sm_base == "ivit":
        probs = _shiftmax(scores_ref[...], s_attn, sm_bit, n_valid, fast_exp)
    elif sm_base == "ppoly":
        probs = _ppoly_softmax(scores_ref[...], pp_ref, pp_seg, pp_deg,
                               pp_exp_bits, sm_bit, n_valid)
    else:
        probs = _ibert_softmax(scores_ref[...], s_attn, m_exp_act, sm_bit,
                               n_valid, fast_exp, fast_poly)
    scores_ref[...] = probs

    # f32 ctx scratch: see _attn_kernel — Mosaic int8 sub-tile stores
    # miscompile at Swin-T stage1 geometry (debug_swin_kernel_stage.py)
    if "av" in ablate:
        ctx_ref[...] = qkv[:, :c].astype(jnp.float32)
    else:
        # raw ctx ints land in the scratch; ONE batched requant afterwards
        # (requant is elementwise, so batching is bit-identical and avoids
        # wt*H tiny [n, hd] VPU op rounds)
        for w in range(wt):
            _ctx_dots(qkv, scores_ref, ctx_ref, w * n, w * num_heads * n,
                      n, c, hd, num_heads, pack, sm_bit, mxu, pad_kv)
        ctx_ref[...] = _requant(ctx_ref[...], m_av, 8)

    if bf16:
        acc = _dot_exact(ctx_ref[...], wproj_ref[...]) + bproj_ref[...]
        y2 = _requant(acc, mproj_ref[...], 16)
    else:
        acc = jax.lax.dot_general(ctx_ref[...].astype(jnp.int8),
                                  wproj_ref[...],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        acc = acc + bproj_ref[...]
        y2 = _requant(acc.astype(jnp.float32), mproj_ref[...], 16)

    # integer residual on the window-permuted layout: the residual add is
    # elementwise, so permute(residual(x)) == residual(permute(x)) and the
    # caller's window_reverse restores token order afterwards.
    out = jnp.clip(jnp.round(y2 * m_res_x) + jnp.round(x_in * m_res_id),
                   -(2.0**15), 2.0**15 - 1)
    o_ref[...] = out.reshape(wt, n, c).astype(o_ref.dtype)


def swin_attn_block_p(xw, *, ln_bias, s_ln, m_ln, ln_shift, qkv_w, qkv_b,
                      m_qkv,
                      m_attn, m_attn2, s_attn, rel_addend, mask_addend,
                      m_av, proj_w, proj_b, m_proj, m_res_x, m_res_id,
                      num_heads, n_windows,
                      ln_base="ivit", sm_base="ivit", s_exp_act=None,
                      sm_bit=8, fast_exp: bool = False,
                      fast_poly: bool = False,
                      sm_bounds=None, sm_coeffs=None, exp_bits: int = 16,
                      sm_lut=None, sm_sum_i32: bool = False, sm_sat=None,
                      win_tile: int = 8,
                      interpret: bool = False, mxu: str | None = None,
                      ablate: str = "", pad_kv: bool | None = None,
                      ln_in=None):
    """Fused Swin window-attention half-block (VERDICT round-1 item 3).

    ``xw``: int16 [B*nW, n, C] — the PRE-norm stage activations, already
    cyclically shifted and window-partitioned (both are token permutations,
    and every op in this half is token- or window-local, so fusing after the
    permutation is exact).  Per grid program (a tile of whole windows): LN
    -> qkv GEMM -> per-(window, head) int8 scores with rel-pos-bias and
    shift-mask addends -> ONE batched integer softmax -> ctx GEMMs -> proj
    GEMM -> integer residual.  Output is int16 in the same permuted layout;
    the caller window-reverses and un-rolls.

    Window rows are zero-padded here onto the 8-sublane grid (Swin's n=49
    -> 56) so every scratch row band starts 8-aligned — Mosaic otherwise
    emits masked sub-tile stores for the 49-strided score/ctx bands, the
    dominant overhead of the round-2 kernel.  Pad score columns are
    softmax-masked (``n_valid``), pad k/v rows therefore meet exact zero
    probabilities, and pad outputs are sliced off — bit-identical to the
    unpadded math (tests/test_swin_engine.py).

    ``mask_addend``: f32 [nW, n, n] for shifted blocks (per-window shift
    mask, reference swin_quant.py:223-247) or None.  ``rel_addend``:
    f32 [H, n, n] requantized relative-position-bias integers.

    ``ablate``: perf-diagnostic stage dropping for kernel_microbench only.
    """
    mxu = _mxu_mode() if mxu is None else mxu
    if mxu == "bf16":
        qkv_w, proj_w = qkv_w.astype(jnp.bfloat16), proj_w.astype(jnp.bfloat16)
        qkv_b, proj_b = qkv_b.astype(jnp.float32), proj_b.astype(jnp.float32)
    bw_, n_valid, c = xw.shape
    n = -(-n_valid // 8) * 8
    if n != n_valid:
        xw = jnp.pad(xw, ((0, 0), (0, n - n_valid), (0, 0)))
        if ln_in is not None:
            # pad-row ln values never reach a valid output (softmax pad-
            # column masking; pad outputs sliced below), so zero padding
            # is bit-neutral even though the in-kernel LN emits requant(
            # LN(0-row)) there
            ln_in = jnp.pad(ln_in, ((0, 0), (0, n - n_valid), (0, 0)))
        rel_addend = jnp.pad(jnp.asarray(rel_addend, jnp.float32),
                             ((0, 0), (0, n - n_valid), (0, n - n_valid)))
        if mask_addend is not None:
            mask_addend = jnp.pad(jnp.asarray(mask_addend, jnp.float32),
                                  ((0, 0), (0, n - n_valid),
                                   (0, n - n_valid)))
    nw = n_windows
    wt = _swin_win_tile(win_tile, bw_, n, c, num_heads, nw,
                        mask_addend is not None)
    grid = (pl.cdiv(bw_, wt),)
    mask_per_win = mask_addend is not None
    # scratch lane width: the LUT gather runs on aligned 128-lane slabs
    # (physically free — VMEM tiles already pad lanes to the 128 multiple)
    l_pad = -(-n // 128) * 128

    def _lp(a):
        return jnp.pad(a, ((0, 0), (0, l_pad - n))) if l_pad != n else a

    # rel/mask addends pre-tiled to the scratch row layout [wt*H*n, l_pad]
    # (row band (w*H + h)*n holds window w, head h) so the kernel applies
    # them in ONE batched epilogue instead of per-(window, head) rounds
    h_ = num_heads
    rel = _lp(jnp.tile(jnp.asarray(rel_addend, jnp.float32).reshape(h_ * n, n),
                       (wt, 1)))
    rel_spec = pl.BlockSpec((wt * h_ * n, l_pad), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    if mask_addend is None:
        mask = jnp.zeros((8, l_pad), jnp.float32)
        mask_spec = pl.BlockSpec((8, l_pad), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    elif wt >= nw:
        # tile covers whole images: window j of the tile uses mask[j % nW]
        m = jnp.tile(mask_addend.astype(jnp.float32), (wt // nw, 1, 1))
        mask = _lp(jnp.repeat(m, h_, axis=0).reshape(wt * h_ * n, n))
        mask_spec = pl.BlockSpec((wt * h_ * n, l_pad), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask = _lp(jnp.repeat(mask_addend.astype(jnp.float32),
                              h_, axis=0).reshape(nw * h_ * n, n))
        nblk = n_windows // wt
        mask_spec = pl.BlockSpec((wt * h_ * n, l_pad),
                                 lambda i: (i % nblk, 0),
                                 memory_space=pltpu.VMEM)
    scalars = jnp.stack([
        jnp.reshape(m_attn, ()).astype(jnp.float32),
        jnp.reshape(m_attn2, ()).astype(jnp.float32),
        jnp.reshape(s_attn, ()).astype(jnp.float32),
        jnp.reshape(m_av, ()).astype(jnp.float32),
        jnp.reshape(m_res_x, ()).astype(jnp.float32),
        jnp.reshape(m_res_id, ()).astype(jnp.float32),
        jnp.exp2(jnp.round(jnp.reshape(ln_shift, ()))).astype(jnp.float32),
        # correctly-rounded reciprocal of the exp QuantAct scale: the
        # per-element 16-bit exp requant is then one in-kernel multiply
        (_rdiv(1.0, jnp.reshape(s_exp_act, ()).astype(jnp.float32))
         if s_exp_act is not None else jnp.float32(1.0)),
        # freeze-verified exp saturation value for shift-masked positions
        (jnp.reshape(sm_sat, ()).astype(jnp.float32)
         if sm_sat is not None else jnp.float32(0.0)),
    ])
    pp, pp_seg, pp_deg = _pack_ppoly(sm_bounds, sm_coeffs)
    use_smlut = (sm_lut is not None and _lut_on()
                 and (not mask_per_win or sm_sat is not None))
    smlut = (jnp.asarray(sm_lut, jnp.float32).reshape(-1, 128)
             if use_smlut else jnp.zeros((1, 128), jnp.float32))
    hoist = ln_in is not None
    # an ablate LN-drop token would be silently shadowed by a hoisted LN
    # (the kernel reads lnin_ref before the ablate branch), misattributing
    # microbench time (ADVICE r4)
    assert not (hoist and "ln" in ablate and "ln_" not in ablate), \
        "hoisted ln_in and an 'ln' ablate token are mutually exclusive"
    if not hoist:
        ln_in = jnp.zeros((1, 1, c), jnp.int8)
    lnin_spec = (pl.BlockSpec((wt, n, c), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM) if hoist
                 else pl.BlockSpec((1, 1, c), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM))
    interp = _interp(interpret)
    with _kernel_trace(interp):
        out = pl.pallas_call(
            functools.partial(_swin_attn_kernel, ln_base=ln_base,
                              sm_base=sm_base, num_heads=num_heads,
                              sm_bit=sm_bit, mask_per_win=mask_per_win,
                              fast_exp=fast_exp, fast_poly=fast_poly,
                              mxu=mxu, n_valid=n_valid, ablate=ablate,
                              pp_seg=pp_seg, pp_deg=pp_deg,
                              pp_exp_bits=exp_bits, sm_lut=use_smlut,
                              sm_sum_i32=sm_sum_i32,
                              pad_kv=_pad_kv(False if pad_kv is None
                                             else pad_kv),
                              hoisted_ln=hoist),
            name="swin_attn_block_kernel",
            out_shape=jax.ShapeDtypeStruct((bw_, n, c), jnp.int16),
            grid=grid,
            in_specs=[
                pl.BlockSpec((wt, n, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                lnin_spec,
                pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((c, 3 * c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                rel_spec,
                mask_spec,
                pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((smlut.shape[0], 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((wt, n, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((wt * n, c), jnp.float32),
                            pltpu.VMEM((wt * num_heads * n, l_pad),
                                       jnp.float32)],
            interpret=interp,
        )(xw, ln_in,
          ln_bias.astype(jnp.float32).reshape(1, c),
          s_ln.astype(jnp.float32).reshape(1, c),
          m_ln.astype(jnp.float32).reshape(1, c),
          qkv_w, qkv_b.reshape(1, 3 * c),
          m_qkv.astype(jnp.float32).reshape(1, 3 * c),
          rel,
          mask,
          proj_w, proj_b.reshape(1, c),
          m_proj.astype(jnp.float32).reshape(1, c),
          scalars, pp, smlut)
    return out[:, :n_valid] if n != n_valid else out
