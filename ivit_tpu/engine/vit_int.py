"""Integer-only ViT forward (the deployment engine's compute graph).

The TPU replacement for the reference's TVM Relay graph
(``/root/reference/TVM_benchmark/models/quantized_vit.py``): every GEMM runs
as int8 x int8 -> int32 on the MXU (``lax.dot_general`` with
``preferred_element_type=int32``; Pallas kernels swap in underneath for the
fused epilogues), every requantization is a single f32 multiply by the
freeze-time dyadic multiplier, and the nonlinearities are the integer cores
from ``ivit_tpu.ops`` operating on raw integer values.

Activations travel as int8 between GEMMs and as f32-held integers inside the
elementwise chains (XLA fuses those into the surrounding GEMM epilogues;
float32 is integer-exact for every in-envelope intermediate — see
ops/quant.py design notes).  Zero float *semantics* in the inner loop: all
f32 values are integers by construction; the only true float math is the
final ``logits = acc * head_scale``.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

from ..ops import ibert as ibert_ops
from ..ops import ivit as ivit_ops
from ..ops.pallas import block as pblk
from ..ops.pallas import nonlinear as pk
from ..ops.ppoly import eval_piecewise_poly
from ..ops.quant import exact_int_sum, exact_sq_sum, pack_rows, rdiv
from .freeze import EngineSpec

_DN = (((1,), (0,)), ((), ()))


def _use_pallas(pallas):
    if pallas == "ops":
        # hybrid mode: XLA runs the GEMMs (batched, epilogue-fused), Pallas
        # runs only the standalone nonlinearity kernels — no block fusion
        return True
    if pallas is not None:
        return pallas
    return jax.default_backend() == "tpu"


def _int16_kernels_on() -> bool:
    """INT16-softmax fused kernels: ON by default.

    Hardware-validated bit-exact on the TPU v5e (scripts/
    validate_kernels_tpu.py, 2026-08-18: mosaic == interpret == unfused,
    0 bits, both fast_exp forms) via the split s8xs8 context dot in
    ops/pallas/block._ctx_dot (real Mosaic has no mixed-width integer
    dot).  Set IVIT_INT16_KERNELS=0 to force the unfused path."""
    import os
    return os.environ.get("IVIT_INT16_KERNELS", "1") not in ("", "0")


# ---------------------------------------------------------------------------
# Envelope audit (the datapath-sizing check of SURVEY §4.3; the reference's
# analogue is the io-stats hook table consumed by scripts/analyze_io_stats.py,
# reference quant_modules.py:20-125).  When a capture is active, every
# integer site records its extrema together with the bound its container —
# or the f32-exactness envelope the sim relies on — imposes.
# ---------------------------------------------------------------------------

_AUDIT = None  # type: list | None

# f32 can hold every integer in (-2**24, 2**24) exactly.  GEMM accumulators
# and integer-domain adds run as int32 in the engine but as f32 in the QAT
# sim; their bit-equality (tests/test_engine.py) is only guaranteed while
# the values stay inside this envelope.
F32_EXACT = 2.0**24


@contextlib.contextmanager
def audit_capture():
    """Collect per-site integer extrema during (eager) engine evaluation.

    Yields a list of records ``{site, kind, min, max, lo_bound, hi_bound}``.
    Taps live on the unfused path: run with ``pallas=False`` (the Pallas
    kernels are bit-identical to it — tests/test_pallas.py — so its envelopes
    are theirs).  Use without ``jax.jit`` so the extrema are concrete.
    """
    global _AUDIT
    _AUDIT = records = []
    try:
        yield records
    finally:
        _AUDIT = None


def _tap(kind, val, lo, hi, sat=False):
    if _AUDIT is None:
        return
    rec = {"site": f"{kind}#{len(_AUDIT)}", "kind": kind,
           "min": jnp.min(val).astype(jnp.float32),
           "max": jnp.max(val).astype(jnp.float32),
           "lo_bound": float(lo), "hi_bound": float(hi)}
    if sat:
        # requant sites clamp by design (QuantAct calibration maps the
        # observed range onto the container; outliers saturate).  Record how
        # much actually clips so the audit can bound it.
        rec["sat_frac"] = jnp.mean(((val < lo) | (val > hi))
                                   .astype(jnp.float32))
    _AUDIT.append(rec)


def audit_violations(records):
    """Records whose extrema escape their declared bounds (empty == sized)."""
    bad = []
    for r in records:
        lo, hi = float(r["min"]), float(r["max"])
        if lo < r["lo_bound"] or hi > r["hi_bound"]:
            bad.append({**r, "min": lo, "max": hi})
    return bad


def fusion_report(cfg, pallas=None) -> dict:
    """Which execution path this config takes (VERDICT: no silent slow path).

    Mirrors the gates in :func:`engine_forward` / the nonlinearity helpers;
    ``Engine`` logs it once and ``scripts/bench_matrix.py`` records it next
    to every throughput number.
    """
    on = _use_pallas(pallas)
    sm, ge = cfg.base_type("softmax"), cfg.base_type("gelu")
    ln = cfg.base_type("ln")
    reasons = []
    if not on:
        reasons.append("pallas disabled (non-TPU backend or forced off)")
    if sm not in ("ivit", "ibert", "ppoly"):
        reasons.append(f"softmax family {sm!r} has no fused block kernel")
    if ge not in ("ivit", "ibert", "ppoly"):
        reasons.append(f"gelu family {ge!r} has no fused block kernel")
    if ln not in ("ivit", "ibert"):
        reasons.append(f"ln family {ln!r} has no fused block kernel")
    if cfg.bitwidths.softmax > 8 and not _int16_kernels_on():
        reasons.append(f"softmax_bw={cfg.bitwidths.softmax} (int16-prob "
                       "kernels await Mosaic int16-dot hardware validation; "
                       "bit-exact in interpret mode — test_pallas.py; "
                       "IVIT_INT16_KERNELS=1 enables)")
    fused_blocks = on and not reasons
    return {
        "fused_blocks": fused_blocks,
        "fused_softmax": fused_blocks or (on and sm == "ivit"),
        "fused_gelu": fused_blocks or (on and ge == "ivit"),
        "lut_nonlinearities": bool(fused_blocks
                                   and getattr(cfg, "use_lut", False)
                                   and pblk._lut_on()),
        "unfused_reasons": reasons,
    }


def _dot_i8(a_int, w_int8):
    """int8 x int8 -> int32 GEMM over the last axis (hits the MXU)."""
    a8 = a_int.astype(jnp.int8)
    nd = a_int.ndim
    dn = (((nd - 1,), (0,)), ((), ()))
    return jax.lax.dot_general(a8, w_int8, dn,
                               preferred_element_type=jnp.int32)


def _container(bits):
    """Narrowest signed container for a `bits`-clamped integer activation.

    Activations materialize in HBM between fused stages; storing them at
    their true width (int8/int16 instead of f32) cuts the elementwise memory
    traffic 4x — the dominant cost of the unfused engine (see the profiler
    breakdown in git history).
    """
    return jnp.int8 if bits <= 8 else (jnp.int16 if bits <= 16 else jnp.int32)


def _f32(x):
    return x.astype(jnp.float32)


def _gemm_bias(a_int, w_int8, b_int32):
    """Tapped int8 GEMM + int32 bias: the sim computes this same value in
    f32, so bit-equality requires it inside the f32-exact envelope."""
    acc = _dot_i8(a_int, w_int8) + b_int32
    _tap("gemm_acc", acc, -F32_EXACT, F32_EXACT)
    return acc


def _requant(acc, m, bits, addend=None):
    """round(acc * m) (+ addend) clamped + stored in the `bits` container."""
    n = 2 ** (bits - 1) - 1
    y = jnp.round(_f32(acc) * m)
    if addend is not None:
        y = y + addend
    _tap(f"requant{bits}", y, -n - 1, n, sat=True)
    return jnp.clip(y, -n - 1, n).astype(_container(bits))


def _ln_requant(y_int, s_pre, m, bits):
    """Requant of LayerNorm-output ints, bit-identical to the sim.

    LN cores emit ints ~2**30 — beyond the f32-exact 2**24 envelope — so
    round 2 replicated the sim's lossy float roundtrip here (a correctly-
    rounded divide PER ELEMENT, ~40% of DeiT-T engine time).  The sim's
    LN->QuantAct edges now hand the exact integer through instead
    (ops/quant._requant_exact), so sim, engine and kernels all compute the
    plain ``round(y_int * m)`` directly from the same exact int.  ``s_pre``
    is retained in the signature for the freeze-spec ABI but unused.
    """
    del s_pre
    return _requant(y_int, m, bits)


def _hoist_ln_on(ln_base: str = "ivit") -> bool:
    """LN hoisted out of the fused block kernels: ON for ivit LN only.

    The ivit in-kernel per-row LayerNorm chain (mean round, 10-iter Newton
    sqrt, reciprocal factor) is LATENCY-bound — a serial f32 dependency
    chain paid once per grid step, ~24-27% of the fused kernels' time on
    DeiT-T (runs/ln_diag_tiny_r4.log); lane-packing inside the kernel does
    not help (runs/probe_ln_pack_r5.log: packed == base).  Hoisting
    computes LN + its requant with the unfused-engine functions in XLA —
    one lane-packed chain for ALL rows of the model — and hands the int8
    result to the kernel, which keeps reading ``x`` for the residual.

    The ibert LN core is a single f32 sqrt (no Newton chain), so hoisting
    buys nothing and *costs* the extra HBM round trip of the ln_in tensor:
    the r4 hoist-everywhere default was the round's 3% headline regression
    (DeiT-S ibert 6,933 hoisted vs 7,177 in-kernel img/s,
    runs/headline_ab_r5.log).  Default: hoist iff ``ln_base == 'ivit'``.

    Bit-identical either way: the unfused LN is asserted equal to the
    in-kernel one at full model size (tests/test_pallas.py parametrizes
    IVIT_HOIST_LN over {0,1}; scripts/tpu_validate.py dumps both).
    ``IVIT_HOIST_LN`` overrides for A/Bs.
    """
    import os
    env = os.environ.get("IVIT_HOIST_LN")
    if env is not None:
        return env not in ("", "0")
    return ln_base == "ivit"


def _hoisted_ln8(cfg, x_int, bias_int, shift, s_ln, m_ln):
    """XLA-side LN + requant producing the fused kernels' ``ln_in`` int8.

    ibert LN on all-zero pad rows emits NaN (factor = 2**31/0); those rows
    never reach a valid output (softmax pad-column masking), but the
    NaN->int8 conversion is backend-defined, so pin it to 0 for a
    deterministic cross-backend artifact.
    """
    y = _layernorm_int(cfg, x_int, bias_int, shift)
    if cfg.base_type("ln") == "ibert":
        y = jnp.where(jnp.isnan(y), 0.0, y)
    return _ln_requant(y, s_ln, m_ln, 8).astype(jnp.int8)


def _xla_lut_on(cfg) -> bool:
    """LUT nonlinearities on the unfused XLA path (jnp.take).

    Bit-identical to the towers (the tables ARE the towers' outputs,
    engine/luts.py) but OFF by default: XLA:TPU lowers the 256-entry
    ``jnp.take`` pathologically (measured 7,678 ms/batch vs 42.8 for the
    towers on DeiT-T — runs/path_compare_tiny_r4.log), unlike Mosaic's
    native lane gather in the fused kernels.  ``IVIT_XLA_LUT=1`` enables
    for A/Bs."""
    import os
    return (getattr(cfg, "use_lut", False) and pblk._lut_on()
            and os.environ.get("IVIT_XLA_LUT", "0") not in ("", "0"))


def _softmax_int_lut(cfg, blk, scores_int):
    """LUT softmax on the unfused path — engine/vit_int._softmax_int
    bit-for-bit with the exp tower replaced by one table take."""
    base = cfg.base_type("softmax")
    bit = cfg.bitwidths.softmax
    ct = _container(bit)
    lut = blk["sm_lut"]
    sf = _f32(scores_int)
    x_max = jnp.max(sf, axis=-1, keepdims=True)
    idx = jnp.clip(x_max - sf, 0.0, lut.shape[0] - 1.0).astype(jnp.int32)
    exp = jnp.take(lut, idx)
    if base == "ivit":
        if cfg.sm_sum_i32:
            exp_sum = jnp.sum(exp.astype(jnp.int32), axis=-1,
                              keepdims=True).astype(jnp.float32)
        else:
            exp_sum = jnp.minimum(exact_int_sum(exp), 2.0**31 - 1)
        factor = jnp.floor(rdiv(2.0**31 - 1, exp_sum))
        return jnp.floor(exp * factor / 2 ** (31 - bit + 1)).astype(ct)
    if base == "ibert":
        exp_sum = jnp.sum(exp.astype(jnp.int32), axis=-1,
                          keepdims=True).astype(jnp.float32)
        factor = jnp.floor(rdiv(2.0**32, exp_sum))
        return jnp.floor(exp * factor / 2 ** (32 - bit + 1)).astype(ct)
    # ppoly: folded exp grid; plain f32 sum + >=1 clamp (engine semantics)
    exp_sum = jnp.clip(jnp.sum(exp, axis=-1, keepdims=True), 1.0, None)
    factor = jnp.floor(rdiv(2.0**32, exp_sum))
    return jnp.floor(exp * factor / 2 ** (32 - bit + 1)).astype(ct)


def _softmax_int(cfg, blk, scores_int, pallas=None, allow_lut=True):
    """int container scores -> int container probs.

    ``allow_lut=False``: the caller's scores leave the int8 LUT domain
    (Swin's additive shift mask) — keep the tower forms there.
    """
    base = cfg.base_type("softmax")
    bit = cfg.bitwidths.softmax
    ct = _container(bit)
    if (allow_lut and base in ("ivit", "ibert", "ppoly") and "sm_lut" in blk
            and not _use_pallas(pallas) and _xla_lut_on(cfg)):
        return _softmax_int_lut(cfg, blk, scores_int)
    if base == "ivit":
        if _use_pallas(pallas):
            return pk.shiftmax_p(scores_int.astype(jnp.int8),
                                 blk["s_attn"], bit, fast_q=cfg.fast_exp)
        probs, _ = ivit_ops.shiftmax_int(_f32(scores_int), blk["s_attn"], bit,
                                         fast_q=cfg.fast_exp)
        return probs.astype(ct)
    if base == "ibert":
        exp_int, _ = ibert_ops.ibert_softmax_exp_int(_f32(scores_int),
                                                     blk["s_attn"],
                                                     fast_q=cfg.fast_exp,
                                                     fast_poly=cfg.fast_poly)
        # internal 16-bit QuantAct on the raw exp ints (ibert:262,310-311);
        # multiply form — same m as the sim (models/layers._ExpRangeAct)
        exp16 = jnp.clip(jnp.round(exp_int * rdiv(1.0, blk["s_exp_act"])),
                         -(2.0**15), 2.0**15 - 1)
        exp_sum = exact_int_sum(exp16)
        _tap("exp_sum", exp_sum, 1.0, 2.0**31 - 1)
        factor = pack_rows(lambda s: jnp.floor(rdiv(2.0**32, s)), exp_sum)
        return jnp.floor(exp16 * factor / 2 ** (32 - bit + 1)).astype(ct)
    if base == "ppoly":
        params = cfg.type_params("softmax")
        exp_bits = int(params.get("exp_bits", 16))
        sf = _f32(scores_int)
        x_max = jnp.max(sf, axis=-1, keepdims=True)
        x_off = sf - x_max + 127
        exp_int = jnp.clip(
            eval_piecewise_poly(x_off, blk["sm_bounds"].astype(jnp.float32),
                                blk["sm_coeffs"]), 0, None)
        exp_int = jnp.floor(exp_int / 2 ** (30 - exp_bits + 1))
        exp_sum = jnp.clip(jnp.sum(exp_int, axis=-1, keepdims=True), 1.0, None)
        factor = pack_rows(lambda s: jnp.floor(rdiv(2.0**32, s)), exp_sum)
        return jnp.floor(exp_int * factor / 2 ** (32 - bit + 1)).astype(ct)
    if base == "float":
        probs = jax.nn.softmax(_f32(scores_int) * blk["s_attn"], axis=-1)
        qmax = 2 ** (bit - 1) - 1
        return jnp.clip(jnp.floor(probs / (2.0 / 2**bit)), 0, qmax).astype(ct)
    raise ValueError(f"unknown softmax family {base!r}")


def _gelu_requant_int(cfg, blk, x_int, out_bits, pallas=None):
    """GELU followed by the dyadic requant to the next activation scale.

    The ivit family fuses both into one Pallas kernel (int8 -> int8)."""
    base = cfg.base_type("gelu")
    if base == "ivit" and _use_pallas(pallas):
        return pk.shift_gelu_requant_p(x_int.astype(jnp.int8), blk["s_gelu"],
                                       blk["m_gelu"], 8, out_bits=out_bits,
                                       fast_q=cfg.fast_exp)
    y = _gelu_int(cfg, blk, _f32(x_int))
    return _requant(y, blk["m_gelu"], out_bits)


def _gelu_int_lut(cfg, blk, x_int):
    """LUT GELU on the unfused path (jnp.take; values == the towers).

    ivit: exp from the table, ``exp(-max)`` tower per row, then the
    reference sigmoid chain (the per-element divide stays — the fused
    kernel's per-row sigmoid table is the full optimization).
    """
    base = cfg.base_type("gelu")
    lut = blk["gelu_lut"]
    if base == "ivit":
        x_max = jnp.max(x_int, axis=-1, keepdims=True)
        idx = jnp.clip(x_max - x_int, 0.0, lut.shape[0] - 1.0)
        exp_int = jnp.take(lut, idx.astype(jnp.int32))
        s_sig = blk["s_gelu"] * 1.702
        exp_max, _ = ivit_ops.int_exp_shift(-x_max, s_sig, n=23,
                                            fast_q=cfg.fast_exp)
        exp_sum = jnp.minimum(exp_int + exp_max, 2.0**31 - 1)
        factor = jnp.floor(rdiv(2.0**31 - 1, exp_sum))
        sigmoid_int = jnp.floor(exp_int * factor / 2 ** (31 - 8 + 1))
        return x_int * sigmoid_int
    if base == "ibert":
        idx = jnp.clip(x_int + 128.0, 0.0, lut.shape[0] - 1.0)
        return x_int * jnp.take(lut, idx.astype(jnp.int32))
    # ppoly: fully folded table
    idx = jnp.clip(x_int + 128.0, 0.0, lut.shape[0] - 1.0)
    return jnp.take(lut, idx.astype(jnp.int32))


def _gelu_int(cfg, blk, x_int):
    base = cfg.base_type("gelu")
    if (base in ("ivit", "ibert", "ppoly") and "gelu_lut" in blk
            and _xla_lut_on(cfg)):
        return _gelu_int_lut(cfg, blk, x_int)
    if base == "ivit":
        y_int, _ = ivit_ops.shift_gelu_int(x_int, blk["s_gelu"], 8,
                                           fast_q=cfg.fast_exp)
        return y_int
    if base == "ibert":
        y_int, _ = ibert_ops.ibert_gelu_int(x_int, blk["s_gelu"],
                                            fast_poly=cfg.fast_poly)
        return y_int
    if base == "ppoly":
        params = cfg.type_params("gelu")
        scale_bits = int(params.get("scale_bits", 22))
        backend = str(params.get("backend", "ibert"))
        y_int = eval_piecewise_poly(x_int, blk["gelu_bounds"].astype(jnp.float32),
                                    blk["gelu_coeffs"])
        # ppoly emits y*2**N; re-floor onto the backend's output grid (the
        # sim's out_scale, models/layers.py PPolyGELU), folded into m_gelu
        # at freeze.  ibert backend: the IBERT composite scale; float
        # backend: s / 2**N (the reference's ppoly_modules.py:84-92 split).
        # The grid comes precomputed from freeze (blk["gelu_s_out"]) so no
        # traced scale chain is exposed to XLA constant folding.
        del backend
        if getattr(cfg, "ppoly_fastdiv", False):
            # one multiply + sparse fixups, proven == floor(rdiv(y/2**sb,
            # s_out)) over the entire int8 input domain at freeze
            # (_ppoly_fastdiv_gate); replaces the per-element Dekker divide
            g = jnp.floor(y_int * blk["gelu_s_out_c"])
            ph, pd = blk["gelu_patch_h"], blk["gelu_patch_d"]
            for j in range(ph.shape[0]):
                g = g + jnp.where(x_int == ph[j], pd[j], 0.0)
            return g
        s_out = blk["gelu_s_out"]
        y = y_int / 2.0**scale_bits          # float value (exact /2**k)
        return jnp.floor(rdiv(y, s_out))     # ints on the backend grid
    if base == "float":
        y = jax.nn.gelu(x_int * blk["s_gelu"], approximate=False)
        qmax = 2 ** 7 - 1
        return jnp.clip(jnp.floor(y / blk["s_gelu"]), -128, qmax)
    raise ValueError(f"unknown gelu family {base!r}")


def _layernorm_int(cfg, x_int, bias_int, shift):
    base = cfg.base_type("ln")
    x_int = _f32(x_int)
    if base == "ivit":
        # rdiv mean + factor, mirroring the sim's i_layernorm_int op-for-op
        # (ops/ivit.py) so sim and engine stay bit-identical in every
        # compilation context.  pack_rows: per-row scalar chains run
        # lane-packed (bit-identical relayout, see ops/quant.pack_rows).
        mean_int = pack_rows(
            lambda s: jnp.round(rdiv(s, jnp.float32(x_int.shape[-1]))),
            exact_int_sum(x_int))
        y_int = x_int - mean_int
        # two-limb variance is exact iff C * (|y|/2**8)**2 < 2**31
        y_bound = 2.0**8 * (2.0**31 / x_int.shape[-1]) ** 0.5
        _tap("ln_centered", y_int, -y_bound, y_bound)
        var_int = exact_sq_sum(y_int)
        factor = pack_rows(
            lambda v: jnp.floor(rdiv(ivit_ops.INT32_MAX,
                                     ivit_ops.int_newton_sqrt(v))), var_int)
        return jnp.floor(y_int * factor / 2) + bias_int
    if base == "float":
        raise ValueError(
            "the integer engine does not run the float golden LayerNorm; "
            "use the QAT sim for float-family evaluation")
    if base == "ibert":
        params = cfg.type_params("ln")
        use_int_sqrt = bool(params.get("use_int_sqrt", False))
        y_int, _, _ = ibert_ops.ibert_layernorm_int(
            x_int, jnp.ones(x_int.shape[-1]), jnp.zeros(x_int.shape[-1]),
            shift, overflow_handling=False, use_int_sqrt=use_int_sqrt)
        # ibert core folds (bias/weight)/base with weight=1,bias=0 -> 0;
        # add the real folded bias from the freeze step instead
        return y_int + bias_int
    raise ValueError(f"unknown layernorm family {base!r}")


def engine_forward(spec: EngineSpec, images, pallas=None, tune=None):
    """images: f32 NHWC [B, img, img, 3] -> float logits [B, classes].

    ``pallas``: None = auto (fused kernels on TPU), True/False to force.
    ``tune``: per-geometry fused-kernel params (img_tile / mlp_tile); None
    resolves through the autotune table (engine/dispatch.TUNED).
    """
    cfg = spec.config
    if tune is None:
        from . import dispatch
        tune = dispatch.kernel_tune(cfg)
    p = spec.params
    bw = cfg.bitwidths
    B = images.shape[0]
    ps = cfg.patch_size
    g = cfg.img_size // ps
    C = cfg.embed_dim
    H = cfg.num_heads
    Dh = cfg.head_dim
    N = cfg.num_patches + 1
    # fused block kernels cover the ivit softmax/gelu families with
    # ivit/ibert LayerNorm; other families run the unfused per-op path
    use_blocks = (_use_pallas(pallas) and pallas != "ops"
                  and cfg.base_type("softmax") in ("ivit", "ibert", "ppoly")
                  and cfg.base_type("gelu") in ("ivit", "ibert", "ppoly")
                  and cfg.base_type("ln") in ("ivit", "ibert")
                  and (bw.softmax <= 8 or _int16_kernels_on()))
    n_pad = ((N + 7) // 8) * 8 if use_blocks else N

    # input quantization (SymmetricQuantFunction on the raw image)
    x = jnp.clip(jnp.round(rdiv(images, p["s_input"])), -128, 127).astype(jnp.int8)

    # patch embedding as one int8 GEMM over extracted patches
    x = x.reshape(B, g, ps, g, ps, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, g * g, ps * ps * 3)
    acc = _gemm_bias(x, p["patch"]["w"], p["patch"]["b"])
    x = _requant(acc, p["patch"]["m"], bw.patch_embed)          # i8 [B,196,C]

    # cls concat (shares patch scale) + positional add at s_block0
    cls = jnp.broadcast_to(p["cls_int"].astype(jnp.int32), (B, 1, C))
    x = jnp.concatenate([cls, x.astype(jnp.int32)], axis=1)      # ints at s_patch
    x = jnp.clip(jnp.round(_f32(x) * p["m_x0"]) + p["pos_addend"],
                 -(2.0 ** (bw.block_input - 1)),
                 2.0 ** (bw.block_input - 1) - 1
                 ).astype(_container(bw.block_input))

    def _residual_requant(y, my, xr, mx, bits):
        raw = jnp.round(_f32(y) * my) + jnp.round(_f32(xr) * mx)
        _tap(f"residual{bits}", raw,
             -(2.0 ** (bits - 1)), 2.0 ** (bits - 1) - 1, sat=True)
        out = jnp.clip(raw, -(2.0 ** (bits - 1)), 2.0 ** (bits - 1) - 1)
        return out.astype(_container(bits))

    if use_blocks:
        ln_base = cfg.base_type("ln")
        sm_base = cfg.base_type("softmax")
        gelu_base = cfg.base_type("gelu")
        sm_exp_bits = (int(cfg.type_params("softmax").get("exp_bits", 16))
                       if sm_base == "ppoly" else 16)
        gelu_sb = (int(cfg.type_params("gelu").get("scale_bits", 22))
                   if gelu_base == "ppoly" else 22)
        if n_pad != N:
            x = jnp.pad(x, ((0, 0), (0, n_pad - N), (0, 0)))
        lut = cfg.use_lut
        hoist = _hoist_ln_on(ln_base)
        img_tile = int(tune.get("img_tile", 2))
        mlp_tile = int(tune.get("mlp_tile", 512))
        head_pack = tune.get("head_pack")
        for blk in p["blocks"]:
            ln1 = (_hoisted_ln8(cfg, x, blk["ln1_bias_int"], blk["ln1_shift"],
                                blk["s_ln1"], blk["m_ln1"]) if hoist else None)
            x = pblk.attn_block_p(
                x, ln_in=ln1,
                ln_bias=blk["ln1_bias_int"], s_ln=blk["s_ln1"],
                m_ln=blk["m_ln1"],
                ln_shift=blk["ln1_shift"], qkv_w=blk["qkv_w"],
                qkv_b=blk["qkv_b"], m_qkv=blk["m_qkv"],
                m_attn=blk["m_attn"], s_attn=blk["s_attn"], m_av=blk["m_av"],
                proj_w=blk["proj_w"], proj_b=blk["proj_b"],
                m_proj=blk["m_proj"], m_res_x=blk["m_res1_x"],
                m_res_id=blk["m_res1_id"], num_heads=H, n_valid=N,
                ln_base=ln_base, sm_base=sm_base,
                s_exp_act=blk.get("s_exp_act"), sm_bit=bw.softmax,
                attn_bits=8, proj_bits=bw.attention_out,
                out_bits=bw.norm2_in,
                out_dtype=_container(bw.norm2_in), fast_exp=cfg.fast_exp,
                fast_poly=cfg.fast_poly,
                sm_bounds=blk.get("sm_bounds"),
                sm_coeffs=blk.get("sm_coeffs"), exp_bits=sm_exp_bits,
                sm_lut=blk.get("sm_lut") if lut else None,
                sm_sum_i32=cfg.sm_sum_i32, img_tile=img_tile,
                head_pack=head_pack)
            xf = x.reshape(B * n_pad, C)
            ln2 = (_hoisted_ln8(cfg, xf, blk["ln2_bias_int"],
                                blk["ln2_shift"], blk["s_ln2"], blk["m_ln2"])
                   if hoist else None)
            xf = pblk.mlp_block_p(
                xf, ln_in=ln2,
                ln_bias=blk["ln2_bias_int"], s_ln=blk["s_ln2"],
                m_ln=blk["m_ln2"],
                ln_shift=blk["ln2_shift"], fc1_w=blk["fc1_w"],
                fc1_b=blk["fc1_b"], m_fc1=blk["m_fc1"],
                s_gelu=blk["s_gelu"], m_gelu=blk["m_gelu"],
                fc2_w=blk["fc2_w"], fc2_b=blk["fc2_b"], m_fc2=blk["m_fc2"],
                m_res_x=blk["m_res2_x"], m_res_id=blk["m_res2_id"],
                ln_base=ln_base, gelu_base=gelu_base,
                mlp_bits=bw.mlp_out, out_bits=bw.att_block_out,
                out_dtype=_container(bw.att_block_out), fast_exp=cfg.fast_exp,
                fast_poly=cfg.fast_poly,
                gelu_bounds=blk.get("gelu_bounds"),
                gelu_coeffs=blk.get("gelu_coeffs"),
                gelu_s_out=blk.get("gelu_s_out"), gelu_scale_bits=gelu_sb,
                gelu_fastdiv=getattr(cfg, "ppoly_fastdiv", False),
                gelu_s_out_c=blk.get("gelu_s_out_c"),
                gelu_patch_h=blk.get("gelu_patch_h"),
                gelu_patch_d=blk.get("gelu_patch_d"),
                gelu_lut=blk.get("gelu_lut") if lut else None,
                tile_rows=mlp_tile)
            x = xf.reshape(B, n_pad, C)
        y = _layernorm_int(cfg, x[:, :1], p["lnf_bias_int"], p["lnf_shift"])
        y = _ln_requant(y, p["s_lnf"], p["m_lnf"], 8)
        acc = _gemm_bias(y[:, 0], p["head_w"], p["head_b"])
        return acc.astype(jnp.float32) * p["head_scale"]

    for blk in p["blocks"]:
        # --- attention half ---
        y = _layernorm_int(cfg, x, blk["ln1_bias_int"], blk["ln1_shift"])
        y = _ln_requant(y, blk["s_ln1"], blk["m_ln1"], 8)
        acc = _gemm_bias(y, blk["qkv_w"], blk["qkv_b"])
        y = _requant(acc, blk["m_qkv"], 8)                       # i8 [B,N,3C]

        # transpose-free attention: slice heads, contract via dot_general
        qkv = y.reshape(B, N, 3, H, Dh)                          # i8 view
        q_, k_, v_ = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]    # [B,N,H,Dh]
        scores = jax.lax.dot_general(
            q_, k_, (((3,), (3,)), ((0, 2), (0, 2))),
            preferred_element_type=jnp.int32)                    # [B,H,N,N]
        _tap("gemm_acc", scores, -F32_EXACT, F32_EXACT)
        scores = _requant(scores, blk["m_attn"], 8)

        probs = _softmax_int(cfg, blk, scores, pallas=pallas)    # intN >=0
        # probs [B,H,Nq,Nk] x v [B,Nk,H,Dh], batched over (B, H).
        # 16-bit softmax configs keep int16 probs (the reference's INT16
        # runs); the MXU takes mixed int16 x int8 via int32 accumulation.
        ctx = jax.lax.dot_general(
            probs, v_, (((3,), (1,)), ((0, 1), (0, 2))),
            preferred_element_type=jnp.int32)                    # [B,H,Nq,Dh]
        _tap("gemm_acc", ctx, -F32_EXACT, F32_EXACT)
        y = _requant(ctx, blk["m_av"], 8)                        # i8 [B,H,N,Dh]
        # proj contracts (H, Dh) jointly -> no transpose back
        proj_w3 = blk["proj_w"].reshape(H, Dh, C)
        acc = jax.lax.dot_general(
            y, proj_w3, (((1, 3), (0, 1)), ((), ())),
            preferred_element_type=jnp.int32) + blk["proj_b"]    # [B,N,C]
        _tap("gemm_acc", acc, -F32_EXACT, F32_EXACT)
        y = _requant(acc, blk["m_proj"], bw.attention_out)

        # residual add #1 (integer-domain dual requant)
        x = _residual_requant(y, blk["m_res1_x"], x, blk["m_res1_id"],
                              bw.norm2_in)

        # --- MLP half ---
        y = _layernorm_int(cfg, x, blk["ln2_bias_int"], blk["ln2_shift"])
        y = _ln_requant(y, blk["s_ln2"], blk["m_ln2"], 8)
        acc = _gemm_bias(y, blk["fc1_w"], blk["fc1_b"])
        y = _requant(acc, blk["m_fc1"], 8)
        y = _gelu_requant_int(cfg, blk, y, 8, pallas=pallas)
        acc = _gemm_bias(y, blk["fc2_w"], blk["fc2_b"])
        y = _requant(acc, blk["m_fc2"], bw.mlp_out)

        # residual add #2
        x = _residual_requant(y, blk["m_res2_x"], x, blk["m_res2_id"],
                              bw.att_block_out)

    # final norm -> cls token -> head.  Only the cls token feeds the head
    # (the sim slices x[:, 0] before its final QuantAct, vit.py:292), so the
    # engine norms/requants just that row — the final scale was calibrated on
    # cls alone and the other 196 rows would both waste compute and saturate.
    y = _layernorm_int(cfg, x[:, :1], p["lnf_bias_int"], p["lnf_shift"])
    y = _ln_requant(y, p["s_lnf"], p["m_lnf"], 8)[:, 0]
    acc = _gemm_bias(y, p["head_w"], p["head_b"])
    return acc.astype(jnp.float32) * p["head_scale"]


class Engine:
    """Callable integer inference engine for one frozen model (ViT or Swin
    spec — dispatches on the spec type, like ServingEngine).

    ``pallas=None`` resolves through the cost-aware dispatch
    (engine/dispatch.py, VERDICT r3 item 2): the hardware A/B calibration
    table picks fused vs unfused per geometry, and ``probe_images`` runs a
    one-time timed probe of both compiled paths instead.  The choice and
    its evidence land in ``self.fusion["path_choice"]``.
    """

    def __init__(self, spec: EngineSpec, pallas=None, probe_images=None):
        from . import dispatch
        from .swin_int import (SwinEngineSpec, swin_engine_forward,
                               swin_fusion_report)
        self.spec = spec
        spec_cls = type(spec)
        is_swin = isinstance(spec, SwinEngineSpec)
        fwd = swin_engine_forward if is_swin else engine_forward

        stage_paths = None

        def _jit(path, stages=None):
            if is_swin:
                return jax.jit(lambda params, images: fwd(
                    spec_cls(self.spec.config, params), images, pallas=path,
                    stage_paths=stages))
            return jax.jit(lambda params, images: fwd(
                spec_cls(self.spec.config, params), images, pallas=path))

        path_choice = {"source": "caller", "pallas": repr(pallas)}
        if pallas is None and jax.default_backend() == "tpu":
            if probe_images is not None:
                fused, path_choice = dispatch.timed_choice(
                    lambda a: _jit(True)(spec.params, a),
                    lambda a: _jit(False)(spec.params, a), probe_images)
                pallas = bool(fused)
            elif is_swin:
                # per-stage mix (VERDICT r4 item 3): stage dims span the
                # widths where fused wins AND loses on ViT
                stage_paths, path_choice = dispatch.swin_stage_choice(
                    spec.config)
                pallas = True
            else:
                fused, path_choice = dispatch.static_choice(spec.config)
                pallas = bool(fused)

        if is_swin:
            self.fusion = swin_fusion_report(spec.config, pallas,
                                             stage_paths=stage_paths)
            fused = self.fusion["fused_window_attention"]
        else:
            self.fusion = fusion_report(spec.config, pallas)
            fused = self.fusion["fused_blocks"]
        self.fusion["path_choice"] = path_choice
        # Pin the params to the default device ONCE: the jitted forward
        # takes them as arguments, and host-resident arrays (e.g. a spec
        # frozen under utils.hostdev.host_init) would otherwise be
        # re-transferred on EVERY call — measured 10x on the tunnel
        # (runs/engine_class_smoke_r5.log: 998 img/s vs 9,235 with
        # device-resident params).
        self._params = jax.device_put(spec.params)
        import logging
        log = logging.getLogger("ivit_tpu.engine")
        if fused:
            log.info("engine path: fused Pallas block kernels (%s)",
                     path_choice.get("source"))
        else:
            log.warning("engine path: UNFUSED per-op graph (%s; choice: %s)",
                        "; ".join(self.fusion["unfused_reasons"]) or "by "
                        "dispatch", path_choice)
        self._jitted = _jit(pallas, stage_paths)

    def __call__(self, images):
        return self._jitted(self._params, images)
