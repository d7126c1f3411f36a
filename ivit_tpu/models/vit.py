"""Quantized Vision Transformer (DeiT/ViT) in flax.linen.

TPU-native re-implementation of the reference model graph
(``/root/reference/models/vit_quant.py`` and ``layers_quant.py``): every edge
is a ``(tensor, scaling_factor)`` pair, residual adds happen *inside*
``QuantAct`` via the identity-fusion path (integer-domain requant-add), and
the attention head scale ``head_dim**-0.5`` is folded into the scaling factor
(vit_quant.py:74-75) so the integer tensor is untouched.

Layout notes (TPU-first): activations are channels-last throughout; the patch
embedding runs as an NHWC conv in the QAT graph and lowers to one int8 GEMM in
the engine.  Inputs are NHWC ``[B, 224, 224, 3]``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import registry
from .layers import QuantAct, QuantConv2d, QuantLinear, quant_matmul


@dataclasses.dataclass(frozen=True)
class BitWidths:
    """The 8-position bitwidth vector (ref quant_train.py:151-157,295-319)."""

    patch_embed: int = 8
    pos_encoding: int = 8
    block_input: int = 8
    attention_out: int = 8
    softmax: int = 8
    mlp_out: int = 8
    norm2_in: int = 8
    att_block_out: int = 8

    @classmethod
    def from_spec(cls, spec) -> "BitWidths":
        """Parse ``8`` / ``"8"`` / ``"8,8,8,8,8,8,8,8"``."""
        if isinstance(spec, BitWidths):
            return spec
        if isinstance(spec, int):
            return cls(*([spec] * 8))
        parts = [int(p) for p in str(spec).split(",")]
        if len(parts) == 1:
            return cls(*([parts[0]] * 8))
        if len(parts) != 8:
            raise ValueError(f"bitwidth spec needs 1 or 8 values, got {spec!r}")
        return cls(*parts)

    def to_list(self) -> Sequence[int]:
        return [self.patch_embed, self.pos_encoding, self.block_input,
                self.attention_out, self.softmax, self.mlp_out,
                self.norm2_in, self.att_block_out]


class DropPath(nn.Module):
    """Per-sample stochastic depth (ref layers_quant.py:84-113)."""

    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.drop_prob == 0.0 or not train:
            return x
        keep_prob = 1.0 - self.drop_prob
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jnp.floor(keep_prob + jax.random.uniform(rng, shape, x.dtype))
        return x / keep_prob * mask


class Mlp(nn.Module):
    """fc1 -> GELU family -> fc2, all through QuantActs (layers_quant.py:116-154)."""

    hidden_features: int
    out_features: int
    act_factory: Any
    drop: float = 0.0
    bitwidth_out: int = 8

    @nn.compact
    def __call__(self, x, act_scaling_factor, *, running_stat=False, train=False):
        x, s = QuantLinear(self.hidden_features, name="fc1")(x, act_scaling_factor)
        x, s = QuantAct(name="qact_gelu")(x, s, running_stat=running_stat)
        x, s = self.act_factory(name="act")(x, s, running_stat=running_stat)
        x, s = QuantAct(name="qact1")(x, s, running_stat=running_stat)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x, s = QuantLinear(self.out_features, name="fc2")(x, s)
        x, s = QuantAct(self.bitwidth_out, name="qact2")(x, s, running_stat=running_stat)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        return x, s


class PatchEmbed(nn.Module):
    """Image -> patch tokens via strided QuantConv2d (layers_quant.py:157-204)."""

    patch_size: int = 16
    embed_dim: int = 768
    bitwidth_out: int = 8
    norm_factory: Any = None  # Swin uses a norm after projection

    @nn.compact
    def __call__(self, x, act_scaling_factor, *, running_stat=False):
        p = self.patch_size
        if x.ndim != 4 or x.shape[-1] not in (1, 3):
            raise ValueError(
                f"PatchEmbed expects NHWC input [B, H, W, C]; got {x.shape}. "
                "(Torch-style NCHW must be transposed to channels-last.)")
        x, s = QuantConv2d(self.embed_dim, (p, p), (p, p), name="proj")(
            x, act_scaling_factor)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        if self.norm_factory is not None:
            x, s = QuantAct(name="qact_before_norm")(x, s, running_stat=running_stat)
            x, s, x_int = self.norm_factory(c, name="norm")(x, s, running_stat=running_stat)
            x, s = QuantAct(self.bitwidth_out, name="qact")(
                x, s, running_stat=running_stat, exact_int=x_int)
        else:
            x, s = QuantAct(self.bitwidth_out, name="qact")(x, s, running_stat=running_stat)
        return x, s


class Attention(nn.Module):
    """Integer multi-head attention (vit_quant.py:23-90)."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    qk_scale: float = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    bitwidth_out: int = 8
    bitwidth_softmax: int = 8
    softmax_factory: Any = None

    @nn.compact
    def __call__(self, x, act_scaling_factor, *, running_stat=False, train=False):
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale or head_dim**-0.5

        x, s = QuantLinear(self.dim * 3, use_bias=self.qkv_bias, name="qkv")(
            x, act_scaling_factor)
        x, s1 = QuantAct(name="qact1")(x, s, running_stat=running_stat)
        qkv = x.reshape(b, n, 3, self.num_heads, head_dim)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))  # [3, B, H, N, Dh]
        q_, k_, v_ = qkv[0], qkv[1], qkv[2]

        attn, s = quant_matmul(q_, s1, jnp.swapaxes(k_, -2, -1), s1)
        # head scale folded into the scaling factor (vit_quant.py:74-75)
        attn = attn * scale
        s = s * scale
        attn, s = QuantAct(name="qact_attn1")(attn, s, running_stat=running_stat)

        attn, s = self.softmax_factory(name="int_softmax")(
            attn, s, running_stat=running_stat)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)

        x, s = quant_matmul(attn, s, v_, s1)
        x = jnp.swapaxes(x, 1, 2).reshape(b, n, c)

        x, s = QuantAct(name="qact2")(x, s, running_stat=running_stat)
        x, s = QuantLinear(self.dim, name="proj")(x, s)
        x, s = QuantAct(self.bitwidth_out, name="qact3")(x, s, running_stat=running_stat)
        x = nn.Dropout(self.proj_drop, deterministic=not train)(x)
        return x, s


class Block(nn.Module):
    """Pre-norm transformer block with integer residual adds (vit_quant.py:93-155)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: float = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    gelu_factory: Any = None
    softmax_factory: Any = None
    norm_factory: Any = None
    attention_out_bw: int = 8
    softmax_bw: int = 8
    mlp_out_bw: int = 8
    norm2_in_bw: int = 8
    att_block_out_bw: int = 8

    @nn.compact
    def __call__(self, x_1, s_1, *, running_stat=False, train=False):
        x, s, x_int = self.norm_factory(self.dim, name="norm1")(
            x_1, s_1, running_stat=running_stat)
        x, s = QuantAct(name="qact1")(x, s, running_stat=running_stat,
                                      exact_int=x_int)
        x, s = Attention(
            self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale, attn_drop=self.attn_drop,
            proj_drop=self.drop, bitwidth_out=self.attention_out_bw,
            bitwidth_softmax=self.softmax_bw,
            softmax_factory=self.softmax_factory, name="attn")(
                x, s, running_stat=running_stat, train=train)
        x = DropPath(self.drop_path, name="drop_path")(x, train=train)
        # residual add #1: integer-domain identity-fused requant (vit:147)
        x_2, s_2 = QuantAct(self.norm2_in_bw, name="qact2")(
            x, s, identity=x_1, identity_scale=s_1, running_stat=running_stat)

        x, s, x_int = self.norm_factory(self.dim, name="norm2")(
            x_2, s_2, running_stat=running_stat)
        x, s = QuantAct(name="qact3")(x, s, running_stat=running_stat,
                                      exact_int=x_int)
        x, s = Mlp(int(self.dim * self.mlp_ratio), self.dim,
                   act_factory=self.gelu_factory, drop=self.drop,
                   bitwidth_out=self.mlp_out_bw, name="mlp")(
                       x, s, running_stat=running_stat, train=train)
        x = DropPath(self.drop_path, name="drop_path2")(x, train=train)
        # residual add #2 (vit:153)
        x, s = QuantAct(self.att_block_out_bw, name="qact4")(
            x, s, identity=x_2, identity_scale=s_2, running_stat=running_stat)
        return x, s


class VisionTransformer(nn.Module):
    """Quantized ViT/DeiT (vit_quant.py:158-312).

    Inputs NHWC ``[B, img, img, 3]``; returns float logits.
    """

    img_size: int = 224
    patch_size: int = 16
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    bitwidths: BitWidths = BitWidths()
    gelu_type: str = "ivit"
    softmax_type: str = "ivit"
    layernorm_type: str = "ivit"

    @nn.compact
    def __call__(self, x, *, running_stat: bool = False, train: bool = False):
        bw = self.bitwidths
        gelu_factory = registry.get_gelu(self.gelu_type)
        softmax_factory = registry.get_softmax(self.softmax_type, bw.softmax)
        norm_factory = registry.get_layernorm(self.layernorm_type)

        b = x.shape[0]
        num_patches = (self.img_size // self.patch_size) ** 2

        x, s = QuantAct(name="qact_input")(x, running_stat=running_stat)
        x, s = PatchEmbed(self.patch_size, self.embed_dim, bw.patch_embed,
                          name="patch_embed")(x, s, running_stat=running_stat)

        cls_token = self.param("cls_token", nn.initializers.truncated_normal(0.02),
                               (1, 1, self.embed_dim))
        pos_embed = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                               (1, num_patches + 1, self.embed_dim))

        # cls token shares the patch scale (vit:290-293)
        x = jnp.concatenate([jnp.broadcast_to(cls_token, (b, 1, self.embed_dim)), x],
                            axis=1)

        x_pos, s_pos = QuantAct(bw.pos_encoding, name="qact_pos")(
            pos_embed, running_stat=running_stat)
        x, s = QuantAct(bw.block_input, name="qact1")(
            x, s, identity=jnp.broadcast_to(x_pos, x.shape),
            identity_scale=s_pos, running_stat=running_stat)
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)

        import numpy as _np
        dpr = [float(r) for r in _np.linspace(0, self.drop_path_rate, self.depth)]
        for i in range(self.depth):
            x, s = Block(
                dim=self.embed_dim, num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale, drop=self.drop_rate,
                attn_drop=self.attn_drop_rate, drop_path=dpr[i],
                gelu_factory=gelu_factory, softmax_factory=softmax_factory,
                norm_factory=norm_factory,
                attention_out_bw=bw.attention_out, softmax_bw=bw.softmax,
                mlp_out_bw=bw.mlp_out, norm2_in_bw=bw.norm2_in,
                att_block_out_bw=bw.att_block_out,
                name=f"blocks_{i}")(x, s, running_stat=running_stat, train=train)

        x, s, x_int = norm_factory(self.embed_dim, name="norm")(
            x, s, running_stat=running_stat)
        x = x[:, 0]
        x, s = QuantAct(name="qact2")(x, s, running_stat=running_stat,
                                      exact_int=x_int[:, 0])
        x, _ = QuantLinear(self.num_classes, name="head")(x, s)
        return x
