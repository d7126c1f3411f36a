"""Integer-only Swin forward + freeze (windowed-attention engine).

Extends the deployment engine to the Swin family (BASELINE config:
"Swin-Tiny INT8 windowed attention, relative position bias, patch
merging").  Same doctrine as ``vit_int.py``: int8 MXU GEMMs, f32 dyadic
requant epilogues, integer nonlinearity cores, int8/int16 containers.

Swin-specific freeze-time constants:
* the quantized relative-position-bias addend — the reference adds the
  (QuantAct-quantized) bias table through identity fusion
  (swin_quant.py:142-149); the engine precomputes the whole dyadic-requanted
  [nH, N, N] addend per block,
* the shifted-window mask as integer offsets ``round(-100 / s_attn)``
  (swin_quant.py:151-158); the sim quantizes its mask onto the same grid
  (models/swin.py) so the two addends are bit-identical,
* PatchMerging slice/concat is pure integer data movement.

Numerics note: Swin's residual stream is 16-bit, so LayerNorm variances
(sum of y^2 with y up to 2**16) exceed float32 integer exactness.  The
two-limb exact reductions (``ops.quant.exact_sq_sum``) make them
order-independent, and the LN-edge requant replicates the sim's float
roundtrip (``_ln_requant``), so the engine now matches the QAT sim
BIT-EXACTLY on 16-bit paths too (tests/test_swin_engine.py asserts
array equality at full model size).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..models.swin import (SwinTransformer, attention_mask,
                           relative_position_index)
from ..models.vit import BitWidths as _BitWidths
from .freeze import (EngineConfig, _act_scale, _linear, _ln_site, _np,
                     _quant_w, _sym_scale, requant_const, requant_multiplier)
from ..ops.pallas import block as pblk
from ..ops.quant import exact_int_sum, rdiv
from .vit_int import (_container, _dot_i8, _f32, _gelu_int, _gemm_bias,
                      _hoist_ln_on, _hoisted_ln8, _int16_kernels_on,
                      _layernorm_int, _ln_requant, _requant, _softmax_int,
                      _use_pallas)

import dataclasses


@dataclasses.dataclass(frozen=True)
class SwinEngineConfig(EngineConfig):
    """Swin adds stage structure on top of the base engine config.

    ``layout`` carries the static per-entry structure of ``params["blocks"]``:
    ``("block", stage, shift)`` or ``("merge", stage)`` — kept out of the
    traced parameter tree so the jitted forward sees Python ints."""

    depths: tuple = (2, 2, 6, 2)
    stage_heads: tuple = (3, 6, 12, 24)
    window_size: int = 7
    layout: tuple = ()


@dataclasses.dataclass
class SwinEngineSpec:
    config: SwinEngineConfig
    params: Dict[str, Any]


def freeze_swin_model(model: SwinTransformer, variables: dict) -> SwinEngineSpec:
    """Calibrated Swin QAT variables -> integer engine spec."""
    variables = jax.device_get(variables)
    cfg = SwinEngineConfig(
        img_size=model.img_size, patch_size=model.patch_size,
        embed_dim=model.embed_dim, depth=sum(model.depths),
        num_heads=model.num_heads[0], mlp_ratio=model.mlp_ratio,
        num_classes=model.num_classes, bitwidths=_BitWidths(),
        gelu_type=model.gelu_type, softmax_type=model.softmax_type,
        layernorm_type=model.layernorm_type,
        depths=tuple(model.depths), stage_heads=tuple(model.num_heads),
        window_size=model.window_size)
    P = variables["params"]
    Q = variables["quant_stats"]
    sm_base = cfg.base_type("softmax")
    layout: list = []

    p: Dict[str, Any] = {}
    s_input = _act_scale(Q, "qact_input", 8)
    p["s_input"] = s_input

    # patch embed (4x4 conv as GEMM) + patch-norm + qact
    conv = P["patch_embed"]["proj"]
    kernel = _np(conv["kernel"]).astype(np.float32)
    kh, kw, cin, D = kernel.shape
    wf = kernel.reshape(-1, D)
    w_scale = _sym_scale(8, wf.min(axis=0), wf.max(axis=0))
    w_int = _quant_w(wf, 8, w_scale[None, :]).astype(np.int8)
    conv_out_scale = (w_scale.astype(np.float64)
                      * np.float64(s_input)).astype(np.float32)
    b_int = _quant_w(_np(conv["bias"]), 32, conv_out_scale).astype(np.int32)
    s_bn = _act_scale(Q["patch_embed"], "qact_before_norm", 8)
    pn_bias, pn_scale, pn_shift = _ln_site(
        P["patch_embed"]["norm"], D, Q["patch_embed"].get("norm"))
    s_patch = _act_scale(Q["patch_embed"], "qact", 8)
    s0 = _act_scale(Q, "qact1", 16)
    p["patch"] = {
        "w": w_int, "b": b_int,
        "m": requant_multiplier(conv_out_scale, s_bn),     # conv -> pre-norm
        "pn_bias_int": pn_bias, "pn_shift": pn_shift,
        "s_pn": pn_scale,
        "m_norm": requant_multiplier(pn_scale, s_patch),   # norm -> qact
        "m_x0": requant_multiplier(s_patch, s0),           # qact1 (16-bit)
    }

    blocks: List[Dict[str, Any]] = []
    s_in = s0
    fast_exp = True
    fast_poly = True
    use_lut = True
    sm_sum_i32 = True
    ppoly_fastdiv = True
    grid = cfg.img_size // cfg.patch_size
    for i_layer, depth in enumerate(cfg.depths):
        dim = int(cfg.embed_dim * 2 ** i_layer)
        heads = cfg.stage_heads[i_layer]
        res = grid // (2 ** i_layer)
        ws = min(cfg.window_size, res)
        n = ws * ws
        for d in range(depth):
            bq = Q[f"layers_{i_layer}_blocks_{d}"]
            bp = P[f"layers_{i_layer}_blocks_{d}"]
            blk: Dict[str, Any] = {}

            ln1_bias, ln1_scale, ln1_shift = _ln_site(bp["norm1"], dim,
                                                      bq.get("norm1"))
            s_a1 = _act_scale(bq, "qact1", 8)
            blk["ln1_bias_int"] = ln1_bias
            blk["ln1_shift"] = ln1_shift
            blk["s_ln1"] = ln1_scale
            blk["m_ln1"] = requant_multiplier(ln1_scale, s_a1)

            aq, ap = bq["attn"], bp["attn"]
            qkv_w, qkv_b, qkv_scale = _linear(ap["qkv"], s_a1, "qkv")
            s_q = _act_scale(aq, "qact1", 8)
            blk["qkv_w"], blk["qkv_b"] = qkv_w, qkv_b
            blk["m_qkv"] = requant_multiplier(qkv_scale, s_q)

            head_dim = dim // heads
            s_attn1 = _act_scale(aq, "qact_attn1", 8)
            # f32 op-for-op as the sim (quant_matmul s1*s1, then `s*scale`)
            s_scores = np.float32(np.float32(s_q * s_q)
                                  * np.float32(head_dim ** -0.5))
            blk["m_attn"] = requant_multiplier(s_scores, s_attn1)

            # relative position bias: quantize table, requant onto s_attn2
            s_table = _act_scale(aq, "qact_table", 8)
            table = _np(ap["relative_position_bias_table"]).astype(np.float32)
            table_int = _quant_w(table, 8, s_table)        # [(2w-1)^2, nH]
            s_attn2 = _act_scale(aq, "qact2", 8)
            rel_idx = relative_position_index(ws)
            bias_int = table_int[rel_idx.reshape(-1)].reshape(n, n, heads)
            bias_int = bias_int.transpose(2, 0, 1)          # [nH, N, N]
            blk["rel_bias_addend"] = requant_const(
                bias_int, s_table, s_attn2).astype(np.float32)
            blk["m_attn2"] = requant_multiplier(s_attn1, s_attn2)
            blk["s_attn"] = np.float32(s_attn2)

            shift = 0 if d % 2 == 0 else ws // 2
            if res <= cfg.window_size:
                shift = 0
            layout.append(("block", i_layer, shift))
            if shift > 0:
                mask = attention_mask((res, res), ws, shift)
                blk["mask_int"] = np.round(
                    mask / np.float32(s_attn2)).astype(np.float32)

            if sm_base == "ibert":
                blk["s_exp_act"] = _act_scale(aq["int_softmax"], "act", 16)
            elif sm_base == "ppoly":
                smq = aq["int_softmax"]
                from .freeze import _require_fitted
                _require_fitted(smq, f"layers_{i_layer}_blocks_{d}.attn"
                                     ".int_softmax")
                blk["sm_bounds"] = _np(smq["bounds"]).astype(np.int32)
                blk["sm_coeffs"] = _np(smq["coeffs"]).astype(np.float32)
            s_sm = (np.float32(2.0 / 2**8) if sm_base != "ivit"
                    else np.float32(1.0 / 2**7))

            s_a3 = _act_scale(aq, "qact3", 8)
            blk["m_av"] = requant_multiplier(np.float32(s_sm * s_q), s_a3)
            proj_w, proj_b, proj_scale = _linear(ap["proj"], s_a3, "proj")
            s_a4 = _act_scale(aq, "qact4", 16)
            blk["proj_w"], blk["proj_b"] = proj_w, proj_b
            blk["m_proj"] = requant_multiplier(proj_scale, s_a4)

            s_res1 = _act_scale(bq, "qact2", 16)
            blk["m_res1_x"] = requant_multiplier(s_a4, s_res1)
            blk["m_res1_id"] = requant_multiplier(s_in, s_res1)

            ln2_bias, ln2_scale, ln2_shift = _ln_site(bp["norm2"], dim,
                                                      bq.get("norm2"))
            s_m1 = _act_scale(bq, "qact3", 8)
            blk["ln2_bias_int"] = ln2_bias
            blk["ln2_shift"] = ln2_shift
            blk["s_ln2"] = ln2_scale
            blk["m_ln2"] = requant_multiplier(ln2_scale, s_m1)

            mp, mq = bp["mlp"], bq["mlp"]
            fc1_w, fc1_b, fc1_scale = _linear(mp["fc1"], s_m1, "fc1")
            s_g = _act_scale(mq, "qact_gelu", 8)
            blk["fc1_w"], blk["fc1_b"] = fc1_w, fc1_b
            blk["m_fc1"] = requant_multiplier(fc1_scale, s_g)
            blk["s_gelu"] = np.float32(s_g)
            if cfg.base_type("gelu") == "ppoly":
                gq = mq["act"]
                from .freeze import _require_fitted
                _require_fitted(gq, f"layers_{i_layer}_blocks_{d}.mlp.act")
                blk["gelu_bounds"] = _np(gq["bounds"]).astype(np.int32)
                blk["gelu_coeffs"] = _np(gq["coeffs"]).astype(np.float32)
            gelu_params = cfg.type_params("gelu")
            if cfg.base_type("gelu") == "ivit":
                s_gelu_out = np.float32(s_g) / np.float32(2.0**7)
            elif (cfg.base_type("gelu") == "ppoly"
                  and str(gelu_params.get("backend", "ibert")) != "ibert"):
                # float-backend ppoly grid (see freeze.py s_gelu_out)
                sb = int(gelu_params.get("scale_bits", 22))
                s_gelu_out = np.float32(np.float32(s_g) / np.float32(2.0**sb))
            else:
                # f32 op-for-op as ibert_gelu_int (see freeze.py)
                from ..ops.ibert import GELU_A, GELU_K, GELU_N
                sk = np.float32(np.float32(s_g) / np.float32(GELU_K))
                sig = np.float32(np.float32(np.float32(sk * sk)
                                            * np.float32(GELU_A))
                                 * np.float32(2.0**GELU_N))
                s_gelu_out = np.float32(np.float32(np.float32(s_g) * sig)
                                        / np.float32(2.0))
            s_m2 = _act_scale(mq, "qact1", 8)
            blk["m_gelu"] = requant_multiplier(s_gelu_out, s_m2)
            if cfg.base_type("gelu") == "ppoly":
                # precomputed poly-output grid (see freeze.py gelu_s_out)
                blk["gelu_s_out"] = np.float32(s_gelu_out)
                from .freeze import _ppoly_fastdiv_gate
                pf_ok, pf_c, pf_h, pf_d = _ppoly_fastdiv_gate(
                    blk["gelu_bounds"], blk["gelu_coeffs"],
                    int(gelu_params.get("scale_bits", 22)), s_gelu_out)
                ppoly_fastdiv = ppoly_fastdiv and pf_ok
                blk["gelu_s_out_c"] = pf_c
                blk["gelu_patch_h"] = pf_h
                blk["gelu_patch_d"] = pf_d
            fc2_w, fc2_b, fc2_scale = _linear(mp["fc2"], s_m2, "fc2")
            s_mlp = _act_scale(mq, "qact2", 8)
            blk["fc2_w"], blk["fc2_b"] = fc2_w, fc2_b
            blk["m_fc2"] = requant_multiplier(fc2_scale, s_mlp)

            s_out = _act_scale(bq, "qact4", 16)
            blk["m_res2_x"] = requant_multiplier(s_mlp, s_out)
            blk["m_res2_id"] = requant_multiplier(s_res1, s_out)
            from .freeze import _block_luts, _exp_fast_gate, _poly_fast_gate
            fast_exp = fast_exp and _exp_fast_gate(
                sm_base, cfg.base_type("gelu"), blk["s_attn"], blk["s_gelu"])
            fast_poly = fast_poly and _poly_fast_gate(
                sm_base, cfg.base_type("gelu"), blk["s_attn"], blk["s_gelu"])
            ok, s_ok = _block_luts(cfg, blk, sm_base, cfg.base_type("gelu"),
                                   blk["s_attn"], blk["s_gelu"], n)
            use_lut = use_lut and ok
            sm_sum_i32 = sm_sum_i32 and s_ok
            if shift > 0 and "sm_lut" in blk:
                # shift-masked positions saturate the exp tower — verify
                # over the full masked range and store the constant; if
                # not flat, this block's kernel keeps the tower path
                # (block.swin_attn_block_p falls back when sm_sat is None)
                from .luts import swin_shift_sat
                sat_ok, sat = swin_shift_sat(sm_base, blk["s_attn"],
                                             float(blk["mask_int"].min()),
                                             blk.get("s_exp_act"))
                if sat_ok:
                    blk["sm_sat"] = sat
            blocks.append(blk)
            s_in = s_out

        if i_layer < len(cfg.depths) - 1:
            dq = Q[f"layers_{i_layer}_downsample"]
            dp = P[f"layers_{i_layer}_downsample"]
            mg: Dict[str, Any] = {}
            layout.append(("merge", i_layer, 0))
            nb, nscale, nshift = _ln_site(dp["norm"], 4 * dim,
                                          dq.get("norm"))
            s_n = _act_scale(dq, "qact1", 8)
            mg["norm_bias_int"] = nb
            mg["norm_shift"] = nshift
            mg["s_norm"] = nscale
            mg["m_norm"] = requant_multiplier(nscale, s_n)
            red_w, red_b, red_scale = _linear(dp["reduction"], s_n, "red")
            s_r = _act_scale(dq, "qact2", 8)
            mg["red_w"] = red_w
            mg["m_red"] = requant_multiplier(red_scale, s_r)
            blocks.append({"merge": mg})
            s_in = s_r

    p["blocks"] = blocks

    lnf_bias, lnf_scale, lnf_shift = _ln_site(
        P["norm"], int(cfg.embed_dim * 2 ** (len(cfg.depths) - 1)),
        Q.get("norm"))
    s_cls = _act_scale(Q, "qact2", 8)
    p["lnf_bias_int"] = lnf_bias
    p["lnf_shift"] = lnf_shift
    p["s_lnf"] = lnf_scale
    p["m_lnf"] = requant_multiplier(lnf_scale, s_cls)
    s_pool = _act_scale(Q, "qact3", 8)
    p["m_pool"] = requant_multiplier(s_cls, s_pool)
    head_w, head_b, head_scale = _linear(P["head"], s_pool, "head")
    p["head_w"], p["head_b"] = head_w, head_b
    p["head_scale"] = head_scale

    from .freeze import _to_device
    cfg = dataclasses.replace(cfg, layout=tuple(layout), fast_exp=fast_exp,
                              fast_poly=fast_poly, use_lut=use_lut,
                              sm_sum_i32=sm_sum_i32,
                              ppoly_fastdiv=ppoly_fastdiv)
    return SwinEngineSpec(config=cfg, params=_to_device(p))


def _wide_relayout() -> bool:
    """Run the window permutations (partition/reverse/roll) on int32:
    measured SLOWER, default OFF.

    Hypothesis: the token streams are int8/int16, and XLA:TPU transposes of
    PACKED subword types move data at sub-word granularity (the r5 profile
    shows the stage-1 int16 partition/reverse copies at ~1,062 us for a
    19 MB tensor, ~11x the HBM bound — runs/tpu_batch3_r5.log, 'copy' =
    20.6% of the mixed-path model), so widening to int32 (value-exact)
    should let the copies move whole words.  Measured
    (runs/swin_relayout_ab_r5.log): the extra cast passes cost MORE than
    the subword relayout saves — mixed path 1,617 img/s widened vs 1,650
    base.  Kept as an env A/B knob (``IVIT_WIDE_RELAYOUT=1``); the window
    permutation cost is pinned as an XLA relayout property, not fixable by
    operand widening."""
    import os
    return os.environ.get("IVIT_WIDE_RELAYOUT", "0") not in ("", "0")


def _roll_i(x, shifts, axes):
    """jnp.roll with the same int32 widening as the partitions (rolls are
    slice+concat copies of the packed stream; see _wide_relayout)."""
    dt = x.dtype
    if _wide_relayout() and dt in (jnp.int8, jnp.int16):
        return jnp.roll(x.astype(jnp.int32), shifts, axes).astype(dt)
    return jnp.roll(x, shifts, axes)


def _window_partition_i(x, ws):
    b, h, w, c = x.shape
    dt = x.dtype
    if _wide_relayout() and dt in (jnp.int8, jnp.int16):
        x = x.astype(jnp.int32)
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    out = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
    return out.astype(dt)


def _window_reverse_i(wins, ws, h, w):
    b = wins.shape[0] // (h * w // ws // ws)
    dt = wins.dtype
    if _wide_relayout() and dt in (jnp.int8, jnp.int16):
        wins = wins.astype(jnp.int32)
    x = wins.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1).astype(dt)


def swin_fusion_report(cfg, pallas=None, stage_paths=None) -> dict:
    """Execution-path report for the Swin engine (no silent slow path).

    Mirrors the gates in :func:`swin_engine_forward`: window attention fuses
    into ``swin_attn_block_p`` (ivit/ibert softmax+ln, int8 probs); the FFN
    half fuses into ``mlp_block_p`` on lane-aligned stages.
    """
    on = _use_pallas(pallas)
    ge, ln = cfg.base_type("gelu"), cfg.base_type("ln")
    sm = cfg.base_type("softmax")
    reasons = []
    if not on:
        reasons.append("pallas disabled (non-TPU backend or forced off)")
    if ge not in ("ivit", "ibert", "ppoly"):
        reasons.append(f"gelu family {ge!r} has no fused kernel")
    if ln not in ("ivit", "ibert"):
        reasons.append(f"ln family {ln!r} has no fused kernel")
    fuse_mlp = on and not reasons
    attn_reasons = []
    if sm not in ("ivit", "ibert", "ppoly"):
        attn_reasons.append(f"softmax family {sm!r} has no fused kernel")
    if cfg.bitwidths.softmax > 8 and not _int16_kernels_on():
        attn_reasons.append(f"softmax_bw={cfg.bitwidths.softmax} (int16-prob "
                            "kernels await Mosaic int16-dot validation; "
                            "IVIT_INT16_KERNELS=1 enables)")
    fuse_attn = (on and ln in ("ivit", "ibert") and not attn_reasons)
    dims = [cfg.embed_dim * 2**i for i in range(len(cfg.depths))]
    # non-lane-aligned stages fuse via zero channel-padding onto the
    # 128-lane grid — the measured default alongside fused attention
    # (runs/swin_path_compare_r3d.log; "mlp_nopad" fuse_parts disables)
    stages = {f"stage{i}(dim={d})"
              + ("" if d % 128 == 0
                 else f" [C padded to {-(-d // 128) * 128}]"):
              bool(fuse_mlp and (stage_paths is None or stage_paths[i]))
              for i, d in enumerate(dims)}
    return {"fused_mlp_stages": stages,
            "fused_window_attention": bool(
                fuse_attn and (stage_paths is None or any(stage_paths))),
            "fused_attn_stages": [bool(fuse_attn and (stage_paths is None
                                                      or stage_paths[i]))
                                  for i in range(len(dims))],
            "lut_nonlinearities": bool((fuse_attn or fuse_mlp)
                                       and getattr(cfg, "use_lut", False)
                                       and pblk._lut_on()),
            "unfused_reasons": reasons + attn_reasons}


def _swin_attn_unfused(cfg, blk, x, B, res, dim, heads, ws, n, shift):
    """Per-op XLA window-attention half-block (the fused kernel's reference;
    kept as the fallback for families/bitwidths without a fused kernel)."""
    head_dim = dim // heads
    y = _layernorm_int(cfg, x, blk["ln1_bias_int"], blk["ln1_shift"])
    y = _ln_requant(y, blk["s_ln1"], blk["m_ln1"], 8)
    yw = y.reshape(B, res, res, dim)
    if shift > 0:
        yw = _roll_i(yw, (-shift, -shift), (1, 2))
    yw = _window_partition_i(yw, ws)            # [B*nW, n, dim] i8

    acc = _gemm_bias(yw, blk["qkv_w"], blk["qkv_b"])
    q8 = _requant(acc, blk["m_qkv"], 8)          # [B*nW, n, 3C]
    bw_ = q8.shape[0]
    qkv = q8.reshape(bw_, n, 3, heads, head_dim)
    q_, k_, v_ = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scores = jax.lax.dot_general(
        q_, k_, (((3,), (3,)), ((0, 2), (0, 2))),
        preferred_element_type=jnp.int32)        # [B*nW, nH, n, n]
    scores = _requant(scores, blk["m_attn"], 8)
    # + quantized relative position bias (identity-fused requant)
    attn = jnp.round(_f32(scores) * blk["m_attn2"]) \
        + blk["rel_bias_addend"][None]
    attn = jnp.clip(attn, -128, 127)
    if shift > 0:
        nw = (res // ws) ** 2
        attn = attn.reshape(B, nw, heads, n, n) \
            + blk["mask_int"][None, :, None]
        attn = attn.reshape(-1, heads, n, n)
    # allow_lut only for unshifted blocks: the additive shift mask pushes
    # scores below the int8 LUT domain (the fused kernel handles masked
    # positions via the freeze-verified saturation constant instead)
    probs = _softmax_int(cfg, blk, attn.astype(jnp.int32), pallas=False,
                         allow_lut=(shift == 0))
    ctx = jax.lax.dot_general(
        probs.astype(jnp.int8), v_, (((3,), (1,)), ((0, 1), (0, 2))),
        preferred_element_type=jnp.int32)        # [B*nW, nH, n, hd]
    ctx = _requant(ctx, blk["m_av"], 8)
    proj_w3 = blk["proj_w"].reshape(heads, head_dim, dim)
    acc = jax.lax.dot_general(
        ctx, proj_w3, (((1, 3), (0, 1)), ((), ())),
        preferred_element_type=jnp.int32) + blk["proj_b"]
    yo = _requant(acc, blk["m_proj"], 16)        # [B*nW, n, dim]

    yo = _window_reverse_i(yo.reshape(-1, ws, ws, dim), ws, res, res)
    if shift > 0:
        yo = _roll_i(yo, (shift, shift), (1, 2))
    yo = yo.reshape(B, res * res, dim)

    return jnp.clip(jnp.round(_f32(yo) * blk["m_res1_x"])
                    + jnp.round(_f32(x) * blk["m_res1_id"]),
                    -(2.0**15), 2.0**15 - 1).astype(jnp.int16)


def swin_engine_forward(spec: SwinEngineSpec, images, pallas=None,
                        fuse_parts=("attn", "mlp"), stage_paths=None):
    """images f32 NHWC -> float logits; all integer inner loop.

    ``pallas``: fuse the window-attention half into swin_attn_block_p and
    the row-local FFN half into mlp_block_p (ivit/ibert/ppoly families).
    ``fuse_parts``: A/B switch for scripts/swin_path_compare.py — restrict
    fusion to a subset of {"attn", "mlp"} (both paths are bit-identical,
    so this is perf-diagnostic only).
    ``stage_paths``: per-stage fused/unfused mix (VERDICT r4 item 3) — a
    tuple of one bool per stage; ``None`` follows ``pallas`` everywhere.
    The geometry argument is per-stage (stage dims 96..768 span exactly
    the widths where the fused kernels lose and win on ViT), so the
    dispatch table routes each stage independently; all mixes are
    bit-identical (tests/test_swin_engine.py).
    """
    cfg = spec.config
    p = spec.params
    # Padded FFN fusion on non-lane-aligned stages is the measured default
    # when attention is also fused (42.41 vs 46.98 ms/batch,
    # runs/swin_path_compare_r3d.log): standalone unfused FFN chains lose
    # the XLA fusion partners they had in the all-unfused graph.
    # "mlp_nopad" restricts fusion to lane-aligned stages for A/Bs.
    pad_ffn = "mlp_nopad" not in fuse_parts or "mlp_pad" in fuse_parts
    fuse_mlp = (_use_pallas(pallas)
                and ("mlp" in fuse_parts or "mlp_pad" in fuse_parts)
                and cfg.base_type("gelu") in ("ivit", "ibert", "ppoly")
                and cfg.base_type("ln") in ("ivit", "ibert"))
    fuse_attn = (_use_pallas(pallas) and "attn" in fuse_parts
                 and cfg.base_type("softmax") in ("ivit", "ibert", "ppoly")
                 and cfg.base_type("ln") in ("ivit", "ibert")
                 and (cfg.bitwidths.softmax <= 8 or _int16_kernels_on()))
    B = images.shape[0]
    ps = cfg.patch_size
    grid = cfg.img_size // ps

    x = jnp.clip(jnp.round(rdiv(images, p["s_input"])), -128, 127).astype(jnp.int8)
    x = x.reshape(B, grid, ps, grid, ps, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, grid * grid, ps * ps * 3)
    acc = _gemm_bias(x, p["patch"]["w"], p["patch"]["b"])
    x = _requant(acc, p["patch"]["m"], 8)
    # patch norm (ivit/ibert core) then qact, then the 16-bit stage input
    y = _layernorm_int(cfg, x, p["patch"]["pn_bias_int"],
                       p["patch"]["pn_shift"])
    x = _ln_requant(y, p["patch"]["s_pn"], p["patch"]["m_norm"], 8)
    x = jnp.clip(jnp.round(_f32(x) * p["patch"]["m_x0"]),
                 -(2.0**15), 2.0**15 - 1).astype(jnp.int16)

    res = grid
    dim = cfg.embed_dim
    for (kind, stage, shift), blk in zip(cfg.layout, p["blocks"]):
        if kind == "merge":
            mg = blk["merge"]
            h = w = res
            xm = x.reshape(B, h, w, dim)
            xm = jnp.concatenate([xm[:, 0::2, 0::2], xm[:, 1::2, 0::2],
                                  xm[:, 0::2, 1::2], xm[:, 1::2, 1::2]],
                                 axis=-1)
            xm = xm.reshape(B, -1, 4 * dim)
            y = _layernorm_int(cfg, xm, mg["norm_bias_int"],
                               mg["norm_shift"])
            y = _ln_requant(y, mg["s_norm"], mg["m_norm"], 8)
            acc = _dot_i8(y, mg["red_w"])
            x = _requant(acc, mg["m_red"], 8)
            res //= 2
            dim *= 2
            continue

        heads = cfg.stage_heads[stage]
        head_dim = dim // heads
        ws = min(cfg.window_size, res)
        n = ws * ws

        st_on = stage_paths is None or bool(stage_paths[stage])
        if fuse_attn and st_on:
            # fused half-block: only the (token-permutation) shift/partition
            # runs outside the kernel; LN, qkv, per-window scores with
            # bias/mask addends, batched softmax, ctx, proj and the integer
            # residual all happen in one pallas_call — bit-identical to the
            # per-op path below (tests/test_swin_engine.py).
            xw = x.reshape(B, res, res, dim)
            if shift > 0:
                xw = _roll_i(xw, (-shift, -shift), (1, 2))
            xw = _window_partition_i(xw, ws)        # [B*nW, n, dim] i16
            nw = (res // ws) ** 2
            ln1 = (_hoisted_ln8(cfg, xw, blk["ln1_bias_int"],
                                blk["ln1_shift"], blk["s_ln1"], blk["m_ln1"])
                   if _hoist_ln_on(cfg.base_type("ln")) else None)
            yo = pblk.swin_attn_block_p(
                xw, ln_in=ln1,
                ln_bias=blk["ln1_bias_int"], s_ln=blk["s_ln1"],
                m_ln=blk["m_ln1"],
                ln_shift=blk["ln1_shift"], qkv_w=blk["qkv_w"],
                qkv_b=blk["qkv_b"], m_qkv=blk["m_qkv"],
                m_attn=blk["m_attn"], m_attn2=blk["m_attn2"],
                s_attn=blk["s_attn"], rel_addend=blk["rel_bias_addend"],
                mask_addend=blk.get("mask_int") if shift > 0 else None,
                m_av=blk["m_av"], proj_w=blk["proj_w"],
                proj_b=blk["proj_b"], m_proj=blk["m_proj"],
                m_res_x=blk["m_res1_x"], m_res_id=blk["m_res1_id"],
                num_heads=heads, n_windows=nw,
                ln_base=cfg.base_type("ln"), sm_base=cfg.base_type("softmax"),
                s_exp_act=blk.get("s_exp_act"), sm_bit=cfg.bitwidths.softmax,
                fast_exp=cfg.fast_exp, fast_poly=cfg.fast_poly,
                sm_bounds=blk.get("sm_bounds"), sm_coeffs=blk.get("sm_coeffs"),
                exp_bits=(int(cfg.type_params("softmax").get("exp_bits", 16))
                          if cfg.base_type("softmax") == "ppoly" else 16),
                sm_lut=blk.get("sm_lut") if cfg.use_lut else None,
                sm_sum_i32=cfg.sm_sum_i32,
                sm_sat=(blk.get("sm_sat")
                        if cfg.use_lut and shift > 0 else None),
                # stage0/1: 16-window tiles amortize the per-program LN
                # Newton serial chain (runs/swin_mb_r3.log); stage2+
                # regresses at 16 (and stage3 is VMEM-capped anyway)
                win_tile=16 if dim < 256 else 8)
            yo = _window_reverse_i(yo.reshape(-1, ws, ws, dim), ws, res, res)
            if shift > 0:
                yo = _roll_i(yo, (shift, shift), (1, 2))
            x = yo.reshape(B, res * res, dim)
        else:
            x = _swin_attn_unfused(cfg, blk, x, B, res, dim, heads, ws,
                                   n, shift)

        if fuse_mlp and st_on and (dim % 128 == 0 or pad_ffn):
            # non-lane-aligned stages (dims 96/192) zero-pad C onto the
            # 128-lane grid: the kernel's LN masks pad lanes
            # (ops/pallas/block._mask_pad_lanes), zero-padded weights/
            # multipliers map pads to zeros, and the output is sliced back —
            # bit-identical to the unfused path (tests/test_swin_engine.py).
            dpad = -dim % 128

            def _pc(a):
                return jnp.pad(a, (0, dpad)) if dpad else a

            xf = x.reshape(B * res * res, dim)
            # hoisted LN runs on the UNPADDED channels (the sim's shapes);
            # zero-padding the int8 result matches the in-kernel pad-lane
            # values exactly (masked-to-0 center, zero-padded bias)
            ln2 = (_hoisted_ln8(cfg, xf, blk["ln2_bias_int"],
                                blk["ln2_shift"], blk["s_ln2"], blk["m_ln2"])
                   if _hoist_ln_on(cfg.base_type("ln")) else None)
            if dpad:
                xf = jnp.pad(xf, ((0, 0), (0, dpad)))
                if ln2 is not None:
                    ln2 = jnp.pad(ln2, ((0, 0), (0, dpad)))
            xf = pblk.mlp_block_p(
                xf, ln_in=ln2,
                ln_bias=_pc(blk["ln2_bias_int"]), s_ln=_pc(blk["s_ln2"]),
                m_ln=_pc(blk["m_ln2"]),
                ln_shift=blk["ln2_shift"],
                fc1_w=(jnp.pad(blk["fc1_w"], ((0, dpad), (0, 0)))
                       if dpad else blk["fc1_w"]),
                fc1_b=blk["fc1_b"], m_fc1=blk["m_fc1"],
                s_gelu=blk["s_gelu"], m_gelu=blk["m_gelu"],
                fc2_w=(jnp.pad(blk["fc2_w"], ((0, 0), (0, dpad)))
                       if dpad else blk["fc2_w"]),
                fc2_b=_pc(blk["fc2_b"]),
                m_fc2=_pc(blk["m_fc2"]), m_res_x=blk["m_res2_x"],
                m_res_id=blk["m_res2_id"], ln_base=cfg.base_type("ln"),
                gelu_base=cfg.base_type("gelu"), mlp_bits=8, out_bits=16,
                out_dtype=jnp.int16, fast_exp=cfg.fast_exp,
                fast_poly=cfg.fast_poly,
                gelu_bounds=blk.get("gelu_bounds"),
                gelu_coeffs=blk.get("gelu_coeffs"),
                gelu_s_out=blk.get("gelu_s_out"),
                gelu_fastdiv=getattr(cfg, "ppoly_fastdiv", False),
                gelu_s_out_c=blk.get("gelu_s_out_c"),
                gelu_patch_h=blk.get("gelu_patch_h"),
                gelu_patch_d=blk.get("gelu_patch_d"),
                gelu_scale_bits=(int(cfg.type_params("gelu")
                                     .get("scale_bits", 22))
                                 if cfg.base_type("gelu") == "ppoly" else 22),
                gelu_lut=blk.get("gelu_lut") if cfg.use_lut else None,
                c_valid=dim if dpad else None,
                # the LN Newton chain is a fixed serial cost per grid
                # program — prefer the largest tile the scoped-VMEM cap
                # admits (_mlp_tile caps by hd; 1024 binds only at hd<=512)
                tile_rows=1024)
            if dpad:
                xf = xf[:, :dim]
            x = xf.reshape(B, res * res, dim)
        else:
            y = _layernorm_int(cfg, x, blk["ln2_bias_int"],
                               blk["ln2_shift"])
            y = _ln_requant(y, blk["s_ln2"], blk["m_ln2"], 8)
            acc = _gemm_bias(y, blk["fc1_w"], blk["fc1_b"])
            y = _requant(acc, blk["m_fc1"], 8)
            y = _gelu_int(cfg, blk, _f32(y))
            y = _requant(y, blk["m_gelu"], 8)
            acc = _gemm_bias(y, blk["fc2_w"], blk["fc2_b"])
            y = _requant(acc, blk["m_fc2"], 8)
            x = jnp.clip(jnp.round(_f32(y) * blk["m_res2_x"])
                         + jnp.round(_f32(x) * blk["m_res2_id"]),
                         -(2.0**15), 2.0**15 - 1).astype(jnp.int16)

    y = _layernorm_int(cfg, x, p["lnf_bias_int"], p["lnf_shift"])
    y = _ln_requant(y, p["s_lnf"], p["m_lnf"], 8)
    # exact-int avgpool, bit-mirroring the sim (models/swin.py): two-limb
    # int32 token sum, correctly-rounded divide by N, round once
    y = jnp.round(rdiv(exact_int_sum(jnp.swapaxes(_f32(y), 1, 2)),
                       jnp.float32(y.shape[1])))[..., 0]
    y = _requant(y, p["m_pool"], 8)
    acc = _gemm_bias(y, p["head_w"], p["head_b"])
    return acc.astype(jnp.float32) * p["head_scale"]
