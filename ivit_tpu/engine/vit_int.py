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

import jax
import jax.numpy as jnp

from ..ops import ibert as ibert_ops
from ..ops import ivit as ivit_ops
from ..ops.ppoly import eval_piecewise_poly
from .freeze import EngineSpec

_DN = (((1,), (0,)), ((), ()))


def _dot_i8(a_int, w_int8):
    """int8 x int8 -> int32 GEMM over the last axis (hits the MXU)."""
    a8 = a_int.astype(jnp.int8)
    nd = a_int.ndim
    dn = (((nd - 1,), (0,)), ((), ()))
    return jax.lax.dot_general(a8, w_int8, dn,
                               preferred_element_type=jnp.int32)


def _requant(acc, m, bits, addend=None):
    """round(acc * m) (+ addend) clamped to the signed `bits` envelope."""
    n = 2 ** (bits - 1) - 1
    y = jnp.round(acc.astype(jnp.float32) * m)
    if addend is not None:
        y = y + addend
    return jnp.clip(y, -n - 1, n)


def _softmax_int(cfg, blk, scores_int):
    base = cfg.base_type("softmax")
    bit = cfg.bitwidths.softmax
    if base == "ivit":
        probs, _ = ivit_ops.shiftmax_int(scores_int, blk["s_attn"], bit)
        return probs
    if base == "ibert":
        exp_int, _ = ibert_ops.ibert_softmax_exp_int(scores_int, blk["s_attn"])
        # internal 16-bit QuantAct on the raw exp ints (ibert:262,310-311)
        exp16 = jnp.clip(jnp.round(exp_int / blk["s_exp_act"]),
                         -(2.0**15), 2.0**15 - 1)
        exp_sum = jnp.sum(exp16, axis=-1, keepdims=True)
        factor = jnp.floor(2.0**32 / exp_sum)
        return jnp.floor(exp16 * factor / 2 ** (32 - bit + 1))
    if base == "ppoly":
        params = cfg.type_params("softmax")
        exp_bits = int(params.get("exp_bits", 16))
        x_max = jnp.max(scores_int, axis=-1, keepdims=True)
        x_off = scores_int - x_max + 127
        exp_int = jnp.clip(
            eval_piecewise_poly(x_off, blk["sm_bounds"].astype(jnp.float32),
                                blk["sm_coeffs"]), 0, None)
        exp_int = jnp.floor(exp_int / 2 ** (30 - exp_bits + 1))
        exp_sum = jnp.clip(jnp.sum(exp_int, axis=-1, keepdims=True), 1.0, None)
        factor = jnp.floor(2.0**32 / exp_sum)
        return jnp.floor(exp_int * factor / 2 ** (32 - bit + 1))
    if base == "float":
        probs = jax.nn.softmax(scores_int * blk["s_attn"], axis=-1)
        qmax = 2 ** (bit - 1) - 1
        return jnp.clip(jnp.floor(probs / (2.0 / 2**bit)), 0, qmax)
    raise ValueError(f"unknown softmax family {base!r}")


def _gelu_int(cfg, blk, x_int):
    base = cfg.base_type("gelu")
    if base == "ivit":
        y_int, _ = ivit_ops.shift_gelu_int(x_int, blk["s_gelu"], 8)
        return y_int
    if base == "ibert":
        y_int, _ = ibert_ops.ibert_gelu_int(x_int, blk["s_gelu"])
        return y_int
    if base == "ppoly":
        params = cfg.type_params("gelu")
        scale_bits = int(params.get("scale_bits", 22))
        y_int = eval_piecewise_poly(x_int, blk["gelu_bounds"].astype(jnp.float32),
                                    blk["gelu_coeffs"])
        # ppoly emits y*2**N; its composite out-scale (ibert backend) is
        # folded into m_gelu at freeze; convert to the backend's int domain
        from ..ops.ibert import GELU_A, GELU_K, GELU_N
        s = blk["s_gelu"]
        so = (s / GELU_K) ** 2 * GELU_A * 2.0**GELU_N
        s_out = s * so / 2
        y = y_int / 2.0**scale_bits          # float value
        return jnp.floor(y / s_out)          # ints on the composite grid
    if base == "float":
        y = jax.nn.gelu(x_int * blk["s_gelu"], approximate=False)
        qmax = 2 ** 7 - 1
        return jnp.clip(jnp.floor(y / blk["s_gelu"]), -128, qmax)
    raise ValueError(f"unknown gelu family {base!r}")


def _layernorm_int(cfg, x_int, bias_int, shift):
    base = cfg.base_type("ln")
    if base == "ivit":
        mean_int = jnp.round(jnp.mean(x_int, axis=-1, keepdims=True))
        y_int = x_int - mean_int
        var_int = jnp.sum(y_int * y_int, axis=-1, keepdims=True)
        std_int = ivit_ops.int_newton_sqrt(var_int)
        factor = jnp.floor(ivit_ops.INT32_MAX / std_int)
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


def engine_forward(spec: EngineSpec, images):
    """images: f32 NHWC [B, img, img, 3] -> float logits [B, classes]."""
    cfg = spec.config
    p = spec.params
    bw = cfg.bitwidths
    B = images.shape[0]
    ps = cfg.patch_size
    g = cfg.img_size // ps
    C = cfg.embed_dim
    H = cfg.num_heads
    Dh = cfg.head_dim
    N = cfg.num_patches + 1

    # input quantization (SymmetricQuantFunction on the raw image)
    x = jnp.clip(jnp.round(images / p["s_input"]), -128, 127)

    # patch embedding as one int8 GEMM over extracted patches
    x = x.reshape(B, g, ps, g, ps, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, g * g, ps * ps * 3)
    acc = _dot_i8(x, p["patch"]["w"]) + p["patch"]["b"]
    x = _requant(acc, p["patch"]["m"], bw.patch_embed)          # [B,196,C]

    # cls concat (shares patch scale) + positional add at s_block0
    cls = jnp.broadcast_to(p["cls_int"], (B, 1, C))
    x = jnp.concatenate([cls, x], axis=1)                        # ints at s_patch
    x = jnp.clip(jnp.round(x * p["m_x0"]) + p["pos_addend"],
                 -(2.0 ** (bw.block_input - 1)), 2.0 ** (bw.block_input - 1) - 1)

    for blk in p["blocks"]:
        # --- attention half ---
        y = _layernorm_int(cfg, x, blk["ln1_bias_int"], blk["ln1_shift"])
        y = _requant(y, blk["m_ln1"], 8)
        acc = _dot_i8(y, blk["qkv_w"]) + blk["qkv_b"]
        y = _requant(acc, blk["m_qkv"], 8)                       # [B,N,3C]

        qkv = y.reshape(B, N, 3, H, Dh).transpose(2, 0, 3, 1, 4)
        q_, k_, v_ = qkv[0], qkv[1], qkv[2]                      # [B,H,N,Dh]
        scores = jax.lax.dot_general(
            q_.astype(jnp.int8), k_.astype(jnp.int8),
            (((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32)                    # [B,H,N,N]
        scores = _requant(scores, blk["m_attn"], 8)

        probs = _softmax_int(cfg, blk, scores)                   # ints, >=0
        ctx = jax.lax.dot_general(
            probs.astype(jnp.int8), v_.astype(jnp.int8),
            (((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32)                    # [B,H,N,Dh]
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, N, C)
        y = _requant(ctx, blk["m_av"], 8)
        acc = _dot_i8(y, blk["proj_w"]) + blk["proj_b"]
        y = _requant(acc, blk["m_proj"], bw.attention_out)

        # residual add #1 (integer-domain dual requant)
        x = jnp.clip(jnp.round(y * blk["m_res1_x"])
                     + jnp.round(x * blk["m_res1_id"]),
                     -(2.0 ** (bw.norm2_in - 1)), 2.0 ** (bw.norm2_in - 1) - 1)

        # --- MLP half ---
        y = _layernorm_int(cfg, x, blk["ln2_bias_int"], blk["ln2_shift"])
        y = _requant(y, blk["m_ln2"], 8)
        acc = _dot_i8(y, blk["fc1_w"]) + blk["fc1_b"]
        y = _requant(acc, blk["m_fc1"], 8)
        y = _gelu_int(cfg, blk, y)
        y = _requant(y, blk["m_gelu"], 8)
        acc = _dot_i8(y, blk["fc2_w"]) + blk["fc2_b"]
        y = _requant(acc, blk["m_fc2"], bw.mlp_out)

        # residual add #2
        x = jnp.clip(jnp.round(y * blk["m_res2_x"])
                     + jnp.round(x * blk["m_res2_id"]),
                     -(2.0 ** (bw.att_block_out - 1)),
                     2.0 ** (bw.att_block_out - 1) - 1)

    # final norm -> cls token -> head
    y = _layernorm_int(cfg, x, p["lnf_bias_int"], p["lnf_shift"])
    y = _requant(y, p["m_lnf"], 8)
    y = y[:, 0]
    acc = _dot_i8(y, p["head_w"]) + p["head_b"]
    return acc.astype(jnp.float32) * p["head_scale"]


class Engine:
    """Callable integer inference engine for one frozen model."""

    def __init__(self, spec: EngineSpec):
        self.spec = spec
        self._jitted = jax.jit(lambda params, images: engine_forward(
            EngineSpec(self.spec.config, params), images))

    def __call__(self, images):
        return self._jitted(self.spec.params, images)
