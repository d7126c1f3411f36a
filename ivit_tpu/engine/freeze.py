"""Model freeze: QAT variables -> integer-only engine spec.

This is the TPU analogue of the reference's TVM conversion step
(``/root/reference/TVM_benchmark/convert_model.py``): it walks the trained
variables, quantizes every weight to int8 / bias to int32, and builds the
**static scale graph** — one dyadic requantization multiplier per edge —
exactly as ``load_qconfig`` does (convert_model.py:69-148), computed once on
the host.

The result is an :class:`EngineSpec`: a pytree of device arrays (int8
weights, int32 biases, f32 requant multipliers, precomputed integer
constants) plus a static :class:`EngineConfig`.  ``ivit_tpu.engine.vit_int``
traces the integer forward from it.

Fidelity note: requant multipliers are applied as float32 ``round(z * M)``
where ``M`` is the correctly-rounded f32 scale ratio — bit-identical to what
the QAT sim computes on device (``ops/quant.py::_requant_value``), and every
freeze-time scale product replicates the sim's f32 op sequence, so sim and
engine agree bit-for-bit (tests/test_engine.py asserts exact array
equality).  Vs the
reference's float64 dyadic evaluation the multiplier is within 2**-24
relative, flipping rounding only at exact ties (~1e-5 of elements).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.registry import parse_layer_name
from ..models.vit import BitWidths, VisionTransformer

F32_EPS = float(np.finfo(np.float32).eps)


def _np(x):
    return np.asarray(x)


def _sym_scale(num_bits: int, x_min, x_max):
    """float32 scale exactly as the reference/trainer computes it."""
    n = np.float32(2 ** (num_bits - 1) - 1)
    mag = np.maximum(-_np(x_min).astype(np.float32),
                     _np(x_max).astype(np.float32))
    return np.maximum(mag / n, np.float32(F32_EPS))


def _quant_w(w, num_bits: int, scale):
    """clamp(round(w / s)) in float32 (matches torch rounding), as int."""
    n = 2 ** (num_bits - 1) - 1
    z = np.round(_np(w).astype(np.float32) / scale)
    return np.clip(z, -n - 1, n)


def requant_multiplier(s_in, s_out) -> np.ndarray:
    """Correctly-rounded f32 ratio ``s_in / s_out`` — the dyadic multiplier.

    Must replicate what the QAT sim computes on device
    (``ops/quant.py::_requant_value``: ``rdiv(pre_scale, out_scale)`` of f32
    scales).  numpy f32/f32 division is correctly rounded, as is ``rdiv`` on
    every backend, so casting both operands to f32 *before* dividing gives
    the identical bit pattern.  The f32 ratio is losslessly representable on
    the reference's 31-bit ``frexp31`` grid (quant_utils.py:151-175), so
    this stays a faithful dyadic requant multiplier.
    """
    return (_np(s_in).astype(np.float32)
            / _np(s_out).astype(np.float32)).astype(np.float32)


# backwards-compatible alias (round-1 name)
dyadic_multiplier = requant_multiplier  # round-1 alias


def requant_const(z_int, s_in, s_out):
    """Freeze-time constant requant: f32 ``round(z * M)``, matching what the
    sim's identity branch computes elementwise on device."""
    m = requant_multiplier(s_in, s_out)
    return np.round(_np(z_int).astype(np.float32) * m)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Static architecture + approximation selection of a frozen engine."""

    img_size: int
    patch_size: int
    embed_dim: int
    depth: int
    num_heads: int
    mlp_ratio: float
    num_classes: int
    bitwidths: BitWidths
    gelu_type: str
    softmax_type: str
    layernorm_type: str
    qk_scale: Optional[float] = None
    # freeze-time gate: every per-element exp-chain quotient may run as the
    # divide-free exact floor_div_int (ops/quant.exp_fastdiv_ok on every
    # block's x0) — identical bits, ~3x cheaper on the VPU hot path
    fast_exp: bool = False
    # freeze-time gate: the ibert 2nd-order polynomials (int_exp's
    # a(r+b)r+c, int_erf's t**2+c) may run as plain mul-adds instead of the
    # Dekker exact_fma — identical bits while every operand, product and
    # sum is inside the f32-exact 2**24 envelope (_poly_fast_gate)
    fast_poly: bool = False
    # freeze-time LUT paths (engine/luts.py): every hot nonlinearity input
    # is an int8 integer, so the exp/erf/poly towers collapse to 256-entry
    # tables computed at freeze — bit-identical by construction
    use_lut: bool = False
    # softmax exp row sums fit ONE exact int32 reduction
    # (n * max(table) < 2**31 on every block)
    sm_sum_i32: bool = False
    # freeze-time gate: the ppoly GELU's per-element grid re-floor
    # ``floor(rdiv(poly(x)/2**sb, s_out))`` may run as ONE multiply
    # ``floor(poly(x) * c)`` — proven identical by exhaustive evaluation
    # over the full int8 input domain at freeze (_ppoly_fastdiv_gate)
    ppoly_fastdiv: bool = False

    @property
    def head_dim(self):
        return self.embed_dim // self.num_heads

    @property
    def num_patches(self):
        return (self.img_size // self.patch_size) ** 2

    @property
    def attn_scale(self):
        return self.qk_scale or self.head_dim ** -0.5

    def base_type(self, which: str) -> str:
        name = {"gelu": self.gelu_type, "softmax": self.softmax_type,
                "ln": self.layernorm_type}[which]
        return parse_layer_name(name)[0]

    def type_params(self, which: str) -> dict:
        name = {"gelu": self.gelu_type, "softmax": self.softmax_type,
                "ln": self.layernorm_type}[which]
        return parse_layer_name(name)[1]


@dataclasses.dataclass
class EngineSpec:
    """Frozen integer network: static config + device-array parameter tree."""

    config: EngineConfig
    params: Dict[str, Any]


def _exp_fast_gate(sm_base: str, gelu_base: str, s_attn, s_gelu) -> bool:
    """May every exp-chain quotient in a block use ``floor_div_int``?

    Recomputes each site's ``x0`` exactly as the traced code does (numpy f32
    division is correctly rounded, bit-matching ``rdiv``) and applies
    ``ops.quant.exp_fastdiv_ok``'s divergence-free bound.  ivit softmax uses
    n=15, ivit GELU n=23 on the 1.702-scaled input, ibert exp n=30; ibert
    GELU's erf has no per-element division.
    """
    from ..ops import ibert as _ib
    from ..ops.quant import exp_fastdiv_ok
    ok = True
    if sm_base == "ivit":
        x0 = np.floor(np.float32(-1.0) / np.float32(s_attn))
        ok = ok and exp_fastdiv_ok(x0, 15)
    elif sm_base == "ibert":
        x0 = np.floor(np.float32(_ib.EXP_X0) / np.float32(s_attn))
        ok = ok and exp_fastdiv_ok(x0, _ib.EXP_N)
    if gelu_base == "ivit":
        s_sig = np.float32(np.float32(s_gelu) * np.float32(1.702))
        x0 = np.floor(np.float32(-1.0) / s_sig)
        ok = ok and exp_fastdiv_ok(x0, 23)
    return bool(ok)


PPOLY_FASTDIV_PATCHES = 8


def _ppoly_fastdiv_gate(bounds, coeffs, scale_bits: int, s_out) -> tuple:
    """Exhaustive proof that the ppoly GELU epilogue divide is one multiply
    plus (at most) a few sparse fixups.

    The engine computes ``g = floor(rdiv(poly(x)/2**sb, s_out))`` per
    element (engine _gelu_int ppoly branch) — a Dekker correctly-rounded
    divide on the hidden tensor, the costliest chain in the ppoly MLP
    kernel (BENCH_MATRIX r4: ppoly mlp 23.6ms vs ibert 12.3ms).  But the
    input ``x`` is the int8 fc1 requant: only 256 values exist, so freeze
    evaluates BOTH forms over the entire domain:

        fast:  g = floor(poly(x) * c),  c = fl(fl(1/s_out) * 2**-sb)

    (power-of-two scalings are exact, so ``c`` carries exactly the
    correctly-rounded reciprocal; any XLA reassociation of the two exact
    scalings is value-neutral).  Quotients of magnitude 2**q carry an f32
    product grid of ulp 2**(q-24), so a handful of inputs whose true
    quotient sits within an ulp of an integer can floor differently — those
    are repaired with per-input patches ``g += (x == h_j) * d_j`` derived
    from the same exhaustive table (measured: 0-3 bad inputs per block).
    Gate passes when <= PPOLY_FASTDIV_PATCHES inputs need patching;
    returns ``(ok, c, patch_h [P], patch_d [P])`` (unused slots h=2**30
    never match an int8 input).
    """
    from . import luts
    truth = luts.ppoly_gelu_lut(bounds, coeffs, scale_bits, s_out)
    minv = np.float32(np.float32(1.0) / np.float32(s_out))
    c = np.float32(minv * np.float32(2.0 ** -scale_bits))
    from ..ops.ppoly import eval_piecewise_poly
    x = np.arange(256, dtype=np.float32) - 128.0
    with luts._on_cpu():
        y_int = np.asarray(eval_piecewise_poly(
            jnp.asarray(x), jnp.asarray(bounds, jnp.float32),
            jnp.asarray(coeffs, jnp.float32)))
    fast = np.floor(y_int * c)
    bad = np.nonzero(truth != fast)[0]
    P = PPOLY_FASTDIV_PATCHES
    patch_h = np.full((P,), 2.0**30, np.float32)
    patch_d = np.zeros((P,), np.float32)
    if len(bad) > P:
        return False, c, patch_h, patch_d
    patch_h[:len(bad)] = x[bad]
    patch_d[:len(bad)] = (truth - fast)[bad]
    return True, c, patch_h, patch_d


def _poly_fast_gate(sm_base: str, gelu_base: str, s_attn, s_gelu) -> bool:
    """May the block's ibert polynomials use the plain mul-add form?

    Recomputes the integer constants exactly as the traced code does (numpy
    f32 division is correctly rounded, bit-matching ``rdiv``) and bounds
    every product/sum in the polynomial against the f32-exact 2**24
    envelope; inside it, FMA contraction and association are value-neutral,
    so the plain form equals ``exact_fma`` in every compilation context.
    """
    from ..ops import ibert as _ib
    LIM = 2.0**24
    ok = True
    if sm_base == "ibert":
        s = np.float32(s_attn)
        x0 = abs(np.floor(np.float32(_ib.EXP_X0) / s))
        b = np.floor(np.float32(_ib.EXP_B) / s)
        c = abs(np.floor(np.float32(_ib.EXP_C) / np.float32(s * s)))
        ok = ok and bool(x0 * (x0 + abs(b)) + c < LIM)
    if gelu_base == "ibert":
        se = np.float32(np.float32(s_gelu) / np.float32(_ib.GELU_K))
        b = abs(np.floor(np.float32(_ib.GELU_B) / se))
        c = abs(np.floor(np.float32(_ib.GELU_C) / np.float32(se * se)))
        ok = ok and bool(b * b + c < LIM)
    return bool(ok)


def _block_luts(cfg, blk, sm_base, gelu_base, s_attn, s_gelu,
                n_softmax: int) -> tuple:
    """Attach the freeze-time nonlinearity LUTs to one block (VERDICT r3
    item 1; engine/luts.py).  Every softmax/GELU input is an int8 integer
    (the preceding requants clamp to 8 bits), so the full reachable domain
    is enumerable and the tables are bit-identical to the towers by
    construction.

    Returns ``(lut_ok, sum_i32_ok)``: whether both sites have a table, and
    whether the ivit softmax row sum fits one exact int32 reduction
    (``n_softmax * max(T) < 2**31``; non-ivit families are always safe —
    their tables are 16-bit-bounded).
    """
    from . import luts
    lut_ok = True
    sum_ok = True
    if sm_base == "ivit":
        t = luts.shiftmax_exp_lut(s_attn)
        blk["sm_lut"] = t
        sum_ok = luts.sum_fits_int32(t, n_softmax)
    elif sm_base == "ibert":
        blk["sm_lut"] = luts.ibert_softmax_exp16_lut(s_attn,
                                                     blk["s_exp_act"])
    elif sm_base == "ppoly":
        eb = int(cfg.type_params("softmax").get("exp_bits", 16))
        blk["sm_lut"] = luts.ppoly_softmax_exp_lut(blk["sm_bounds"],
                                                   blk["sm_coeffs"], eb)
    else:
        lut_ok = False
    if gelu_base == "ivit":
        blk["gelu_lut"] = luts.shift_gelu_exp_lut(s_gelu)
    elif gelu_base == "ibert":
        blk["gelu_lut"] = luts.ibert_gelu_lut(s_gelu)
    elif gelu_base == "ppoly":
        sb = int(cfg.type_params("gelu").get("scale_bits", 22))
        blk["gelu_lut"] = luts.ppoly_gelu_lut(blk["gelu_bounds"],
                                              blk["gelu_coeffs"], sb,
                                              blk["gelu_s_out"])
    else:
        lut_ok = False
    return lut_ok, sum_ok


def _require_fitted(qs: dict, site: str):
    """ppoly tables must be host-fitted before freezing.

    Until ``train.ppoly_fit.fit_ppoly_tables`` runs, the sim evaluates the
    golden backend (the ``fitted`` flag gates it, models/layers.py) while a
    freeze would bake the all-zero placeholder coefficients into the
    engine — a silent sim/engine divergence (r4: the first ppoly bench
    row shipped rel_err 1.29 this way).  Fail loudly instead.
    """
    if "fitted" in qs and float(_np(qs["fitted"]).reshape(-1)[0]) <= 0:
        raise ValueError(
            f"ppoly site {site!r} is not fitted; run "
            "ivit_tpu.train.ppoly_fit.fit_ppoly_tables(model, variables) "
            "after calibration, before freezing")


def _act_scale(qs: dict, name: str, bits: int) -> np.float32:
    st = qs[name]
    return _sym_scale(bits, st["x_min"], st["x_max"]).reshape(-1)[0]


def _linear(params_tree, qs_scale_in, name_w: str, weight_bit=8, bias_bit=32):
    """Quantize one linear site; returns (w_int8[I,O], b_int32[O], s_out[O])."""
    kernel = _np(params_tree["kernel"]).astype(np.float32)
    w_min = kernel.min(axis=0)
    w_max = kernel.max(axis=0)
    w_scale = _sym_scale(weight_bit, w_min, w_max)          # [O]
    w_int = _quant_w(kernel, weight_bit, w_scale[None, :]).astype(np.int8)
    bias_scale = (w_scale.astype(np.float64) * np.float64(qs_scale_in)).astype(np.float32)
    if "bias" in params_tree:
        b_int = _quant_w(_np(params_tree["bias"]), bias_bit, bias_scale).astype(np.int32)
    else:
        b_int = np.zeros(kernel.shape[1], np.int32)
    return w_int, b_int, bias_scale


def _ln_site(params_tree, dim: int, qs: Optional[dict] = None):
    """LayerNorm freeze: integer bias + per-channel output scale.

    out_scale = sqrt(C)/2**30 * gamma; bias_int = floor((beta/gamma)/base)
    (ivit_modules.py:53-62 / ibert_modules.py:148-155).
    """
    gamma = _np(params_tree["weight"]).astype(np.float32)
    beta = _np(params_tree["bias"]).astype(np.float32)
    base = np.float32(np.sqrt(dim) / 2.0**30)
    bias_int = np.floor((beta / gamma) / base)
    out_scale = base * gamma
    shift = _np(qs["shift"]).reshape(-1)[0] if qs and "shift" in qs else np.float32(0)
    return bias_int.astype(np.float32), out_scale, shift


def freeze_model(model: VisionTransformer, variables: dict) -> EngineSpec:
    """Build the integer engine spec from a calibrated/trained QAT model."""
    # one bulk device->host transfer (per-leaf fetches through the TPU
    # tunnel cost ~1s each; a DeiT freeze would otherwise take minutes)
    variables = jax.device_get(variables)
    cfg = EngineConfig(
        img_size=model.img_size, patch_size=model.patch_size,
        embed_dim=model.embed_dim, depth=model.depth,
        num_heads=model.num_heads, mlp_ratio=model.mlp_ratio,
        num_classes=model.num_classes, bitwidths=model.bitwidths,
        gelu_type=model.gelu_type, softmax_type=model.softmax_type,
        layernorm_type=model.layernorm_type, qk_scale=model.qk_scale)
    bw = cfg.bitwidths
    P = variables["params"]
    Q = variables["quant_stats"]
    ln_base = cfg.base_type("ln")
    sm_base = cfg.base_type("softmax")
    gelu_base = cfg.base_type("gelu")
    sm_bit = bw.softmax

    p: Dict[str, Any] = {}

    # --- input quantization ---
    s_input = _act_scale(Q, "qact_input", 8)
    p["s_input"] = s_input

    # --- patch embedding (conv as GEMM over flattened patches) ---
    conv = P["patch_embed"]["proj"]
    kernel = _np(conv["kernel"]).astype(np.float32)       # [kh,kw,cin,D]
    kh, kw, cin, D = kernel.shape
    wf = kernel.reshape(-1, D)
    w_scale = _sym_scale(8, wf.min(axis=0), wf.max(axis=0))
    w_int = _quant_w(wf, 8, w_scale[None, :]).astype(np.int8)
    conv_out_scale = (w_scale.astype(np.float64) * np.float64(s_input)).astype(np.float32)
    b_int = _quant_w(_np(conv["bias"]), 32, conv_out_scale).astype(np.int32)
    s_patch = _act_scale(Q["patch_embed"], "qact", bw.patch_embed)
    p["patch"] = {
        "w": w_int, "b": b_int,
        "m": requant_multiplier(conv_out_scale, s_patch),   # [D]
    }
    p["s_patch"] = s_patch

    # --- cls token + positional embedding (freeze-time integer constants) ---
    # f32 arithmetic throughout: the sim quantizes the raw cls param at the
    # patch scale via rdiv (correctly-rounded f32), vit.py:264-272
    cls = _np(P["cls_token"]).astype(np.float32)
    p["cls_int"] = np.round(cls / s_patch.astype(np.float32))
    s_pos = _act_scale(Q, "qact_pos", bw.pos_encoding)
    s_block0 = _act_scale(Q, "qact1", bw.block_input)
    pos = _np(P["pos_embed"]).astype(np.float32)
    pos_int8 = _quant_w(pos, bw.pos_encoding, s_pos)
    p["pos_addend"] = requant_const(pos_int8, s_pos, s_block0).astype(np.float32)
    p["m_x0"] = requant_multiplier(s_patch, s_block0)      # scalar
    p["s_block0"] = s_block0

    # --- blocks ---
    blocks: List[Dict[str, Any]] = []
    s_block_in = s_block0
    fast_exp = True
    fast_poly = True
    use_lut = True
    sm_sum_i32 = True
    ppoly_fastdiv = True
    for i in range(cfg.depth):
        bp = P[f"blocks_{i}"]
        bq = Q[f"blocks_{i}"]
        blk: Dict[str, Any] = {}

        # norm1 -> qact1 -> qkv
        ln1_bias, ln1_scale, ln1_shift = _ln_site(bp["norm1"], cfg.embed_dim,
                                                  bq.get("norm1"))
        s_a1 = _act_scale(bq, "qact1", 8)
        blk["ln1_bias_int"] = ln1_bias
        blk["ln1_shift"] = ln1_shift
        blk["s_ln1"] = ln1_scale                             # [C]
        blk["m_ln1"] = requant_multiplier(ln1_scale, s_a1)   # [C]

        aq = bq["attn"]
        ap = bp["attn"]
        qkv_w, qkv_b, qkv_scale = _linear(ap["qkv"], s_a1, "qkv")
        s_q = _act_scale(aq, "qact1", 8)
        blk["qkv_w"] = qkv_w
        blk["qkv_b"] = qkv_b
        blk["m_qkv"] = requant_multiplier(qkv_scale, s_q)    # [3C]

        # scores: s_q^2 * attn_scale -> qact_attn1 -> softmax
        # f32 op-for-op as the sim computes it (quant_matmul's s_a*s_b, then
        # vit.py:153-154's `s * scale`), so the ratio matches bit-for-bit
        s_attn = _act_scale(aq, "qact_attn1", 8)
        s_scores = np.float32(np.float32(s_q * s_q)
                              * np.float32(cfg.attn_scale))
        blk["m_attn"] = requant_multiplier(s_scores, s_attn)
        blk["s_attn"] = np.float32(s_attn)

        if sm_base == "ibert":
            blk["s_exp_act"] = _act_scale(aq["int_softmax"], "act", 16)
        elif sm_base == "ppoly":
            smq = aq["int_softmax"]
            _require_fitted(smq, f"blocks_{i}.attn.int_softmax")
            blk["sm_bounds"] = _np(smq["bounds"]).astype(np.int32)
            blk["sm_coeffs"] = _np(smq["coeffs"]).astype(np.float32)
        s_sm = (np.float32(2.0 / 2**sm_bit) if sm_base in ("ibert", "ppoly", "float")
                else np.float32(1.0 / 2 ** (sm_bit - 1)))

        # attn @ v -> qact2 -> proj -> qact3
        s_a2 = _act_scale(aq, "qact2", 8)
        blk["m_av"] = requant_multiplier(np.float32(s_sm * s_q), s_a2)
        proj_w, proj_b, proj_scale = _linear(ap["proj"], s_a2, "proj")
        s_a3 = _act_scale(aq, "qact3", bw.attention_out)
        blk["proj_w"] = proj_w
        blk["proj_b"] = proj_b
        blk["m_proj"] = requant_multiplier(proj_scale, s_a3)  # [C]

        # residual add #1 (qact2 of the Block)
        s_res1 = _act_scale(bq, "qact2", bw.norm2_in)
        blk["m_res1_x"] = requant_multiplier(s_a3, s_res1)
        blk["m_res1_id"] = requant_multiplier(s_block_in, s_res1)

        # norm2 -> qact3 -> mlp
        ln2_bias, ln2_scale, ln2_shift = _ln_site(bp["norm2"], cfg.embed_dim,
                                                  bq.get("norm2"))
        s_m1 = _act_scale(bq, "qact3", 8)
        blk["ln2_bias_int"] = ln2_bias
        blk["ln2_shift"] = ln2_shift
        blk["s_ln2"] = ln2_scale
        blk["m_ln2"] = requant_multiplier(ln2_scale, s_m1)

        mp, mq = bp["mlp"], bq["mlp"]
        fc1_w, fc1_b, fc1_scale = _linear(mp["fc1"], s_m1, "fc1")
        s_g = _act_scale(mq, "qact_gelu", 8)
        blk["fc1_w"] = fc1_w
        blk["fc1_b"] = fc1_b
        blk["m_fc1"] = requant_multiplier(fc1_scale, s_g)
        blk["s_gelu"] = np.float32(s_g)

        if gelu_base == "ppoly":
            gq = mq["act"]
            _require_fitted(gq, f"blocks_{i}.mlp.act")
            blk["gelu_bounds"] = _np(gq["bounds"]).astype(np.int32)
            blk["gelu_coeffs"] = _np(gq["coeffs"]).astype(np.float32)

        # gelu output scale by family — f32 op-for-op as the sim's wrappers
        # compute it, so the requant ratio matches the sim bit-for-bit
        gelu_params = cfg.type_params("gelu")
        ppoly_float = (gelu_base == "ppoly"
                       and str(gelu_params.get("backend", "ibert")) != "ibert")
        if gelu_base == "ivit":
            s_gelu_out = np.float32(s_g) / np.float32(2.0**7)  # exact shift
        elif ppoly_float:
            # float-backend ppoly: out grid is s / 2**scale_bits
            # (models/layers.py PPolyGELU, ref ppoly_modules.py:84-92)
            sb = int(gelu_params.get("scale_bits", 22))
            s_gelu_out = np.float32(np.float32(s_g) / np.float32(2.0**sb))
        elif gelu_base in ("ibert", "ppoly"):
            # ibert_ops.ibert_gelu_int: s/K -> int_erf's s**2 * A * 2**N ->
            # s * sig / 2 (ops/ibert.py:66-89), every step rounded in f32
            from ..ops.ibert import GELU_A, GELU_K, GELU_N
            sk = np.float32(np.float32(s_g) / np.float32(GELU_K))
            sig = np.float32(np.float32(np.float32(sk * sk)
                                        * np.float32(GELU_A))
                             * np.float32(2.0**GELU_N))
            s_gelu_out = np.float32(np.float32(np.float32(s_g) * sig)
                                    / np.float32(2.0))
        else:  # float golden: quantized on the input grid
            s_gelu_out = np.float32(s_g)
        s_m2 = _act_scale(mq, "qact1", 8)
        blk["m_gelu"] = requant_multiplier(s_gelu_out, s_m2)
        if gelu_base == "ppoly":
            # the engine re-floors the poly output onto this grid; computed
            # HERE (np f32, bit-matching the sim's traced chain) so the
            # engine never recomputes it in-trace, where XLA's constant
            # folding can reassociate the two-mul composite (measured 1-ulp
            # flips when the spec is closed over as a jit constant)
            blk["gelu_s_out"] = np.float32(s_gelu_out)
            sb_pp = int(gelu_params.get("scale_bits", 22))
            pf_ok, pf_c, pf_h, pf_d = _ppoly_fastdiv_gate(
                blk["gelu_bounds"], blk["gelu_coeffs"], sb_pp, s_gelu_out)
            ppoly_fastdiv = ppoly_fastdiv and pf_ok
            blk["gelu_s_out_c"] = pf_c
            blk["gelu_patch_h"] = pf_h
            blk["gelu_patch_d"] = pf_d

        fc2_w, fc2_b, fc2_scale = _linear(mp["fc2"], s_m2, "fc2")
        s_mlp_out = _act_scale(mq, "qact2", bw.mlp_out)
        blk["fc2_w"] = fc2_w
        blk["fc2_b"] = fc2_b
        blk["m_fc2"] = requant_multiplier(fc2_scale, s_mlp_out)

        # residual add #2 (qact4)
        s_block_out = _act_scale(bq, "qact4", bw.att_block_out)
        blk["m_res2_x"] = requant_multiplier(s_mlp_out, s_block_out)
        blk["m_res2_id"] = requant_multiplier(s_res1, s_block_out)

        fast_exp = fast_exp and _exp_fast_gate(sm_base, gelu_base, s_attn, s_g)
        fast_poly = fast_poly and _poly_fast_gate(sm_base, gelu_base,
                                                  s_attn, s_g)
        ok, s_ok = _block_luts(cfg, blk, sm_base, gelu_base, s_attn, s_g,
                               cfg.num_patches + 1)
        use_lut = use_lut and ok
        sm_sum_i32 = sm_sum_i32 and s_ok
        blocks.append(blk)
        s_block_in = s_block_out

    cfg = dataclasses.replace(cfg, fast_exp=fast_exp, fast_poly=fast_poly,
                              use_lut=use_lut, sm_sum_i32=sm_sum_i32,
                              ppoly_fastdiv=ppoly_fastdiv)
    p["blocks"] = blocks

    # --- final norm -> cls select -> qact2 -> head ---
    lnf_bias, lnf_scale, lnf_shift = _ln_site(P["norm"], cfg.embed_dim,
                                              Q.get("norm"))
    s_cls = _act_scale(Q, "qact2", 8)
    p["lnf_bias_int"] = lnf_bias
    p["lnf_shift"] = lnf_shift
    p["s_lnf"] = lnf_scale
    p["m_lnf"] = requant_multiplier(lnf_scale, s_cls)
    head_w, head_b, head_scale = _linear(P["head"], s_cls, "head")
    p["head_w"] = head_w
    p["head_b"] = head_b
    p["head_scale"] = head_scale      # [num_classes] float output scale

    return EngineSpec(config=cfg, params=_to_device(p))


def _to_device(tree):
    if isinstance(tree, dict):
        return {k: _to_device(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_to_device(v) for v in tree]
    arr = np.asarray(tree)
    if arr.dtype in (np.int8, np.int32):
        return jnp.asarray(arr)
    return jnp.asarray(arr, dtype=jnp.float32)
