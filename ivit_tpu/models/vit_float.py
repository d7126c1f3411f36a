"""Plain float (bf16) Vision Transformer.

The unquantized counterpart of ``models/vit.py`` — used as the speed/accuracy
baseline the integer engine is compared against (the reference paper's
headline is int8-vs-fp32 latency), as the teacher for distillation, and as
the target for float pretrained-weight ingestion before QAT.
Architecture matches ``vit_quant.py`` exactly (pre-norm, GELU MLP, cls token).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class FloatBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        b, n, c = h.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(h)
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (hd ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        ctx = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, c)
        x = x + nn.Dense(self.dim, dtype=self.dtype, name="proj")(ctx)

        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return x + h


class FloatVisionTransformer(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x.astype(self.dtype))
        x = x.reshape(b, -1, self.embed_dim)
        n = x.shape[1]
        cls = self.param("cls_token", nn.initializers.truncated_normal(0.02),
                         (1, 1, self.embed_dim))
        pos = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                         (1, n + 1, self.embed_dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.embed_dim)).astype(self.dtype), x], axis=1)
        x = x + pos.astype(self.dtype)
        for i in range(self.depth):
            x = FloatBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                           dtype=self.dtype, name=f"blocks_{i}")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(
            x[:, 0].astype(jnp.float32))


FLOAT_ARCHS = {
    "deit_tiny_patch16_224": dict(embed_dim=192, depth=12, num_heads=3),
    "deit_small_patch16_224": dict(embed_dim=384, depth=12, num_heads=6),
    "deit_base_patch16_224": dict(embed_dim=768, depth=12, num_heads=12),
    "vit_base_patch16_224": dict(embed_dim=768, depth=12, num_heads=12),
    "vit_large_patch16_224": dict(embed_dim=1024, depth=24, num_heads=16),
}


def float_model(name: str, **kw) -> FloatVisionTransformer:
    return FloatVisionTransformer(**FLOAT_ARCHS[name], **kw)


class FloatSwinBlock(nn.Module):
    dim: int
    num_heads: int
    resolution: int
    window_size: int
    shift: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from .swin import (attention_mask, relative_position_index,
                           window_partition, window_reverse)
        b, L, c = x.shape
        res, ws, sh = self.resolution, self.window_size, self.shift
        n = ws * ws
        hd = self.dim // self.num_heads

        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = h.reshape(b, res, res, c)
        if sh > 0:
            h = jnp.roll(h, (-sh, -sh), axis=(1, 2))
        hw = window_partition(h, ws)                   # [B*nW, n, C]
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(hw)
        qkv = qkv.reshape(-1, n, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q_, k_, v_ = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q_, k_) * (hd ** -0.5)
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, self.num_heads))
        idx = relative_position_index(ws)
        bias = table[idx.reshape(-1)].reshape(n, n, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(self.dtype)
        if sh > 0:
            nw = (res // ws) ** 2
            mask = jnp.asarray(attention_mask((res, res), ws, sh),
                               self.dtype)
            attn = attn.reshape(b, nw, self.num_heads, n, n) \
                + mask[None, :, None]
            attn = attn.reshape(-1, self.num_heads, n, n)
        attn = jax.nn.softmax(attn.astype(jnp.float32),
                              axis=-1).astype(self.dtype)
        ctx = jnp.einsum("bhnm,bhmd->bhnd", attn, v_)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(-1, n, c)
        ctx = nn.Dense(self.dim, dtype=self.dtype, name="proj")(ctx)
        ctx = window_reverse(ctx.reshape(-1, ws, ws, c), ws, res, res)
        if sh > 0:
            ctx = jnp.roll(ctx, (sh, sh), axis=(1, 2))
        x = x + ctx.reshape(b, L, c)

        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return x + h


class FloatSwinTransformer(nn.Module):
    """bf16 Swin baseline (the unquantized twin of models/swin.py)."""

    img_size: int = 224
    patch_size: int = 4
    num_classes: int = 1000
    embed_dim: int = 96
    depths: Any = (2, 2, 6, 2)
    num_heads: Any = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x.astype(self.dtype))
        res = x.shape[1]
        x = x.reshape(b, -1, self.embed_dim)
        x = nn.LayerNorm(dtype=self.dtype, name="patch_norm")(x)
        dim = self.embed_dim
        for i, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            for d in range(depth):
                ws = min(self.window_size, res)
                shift = 0 if (d % 2 == 0 or res <= self.window_size) \
                    else ws // 2
                x = FloatSwinBlock(dim, heads, res, ws, shift,
                                   self.mlp_ratio, dtype=self.dtype,
                                   name=f"layers_{i}_blocks_{d}")(x)
            if i < len(self.depths) - 1:
                xm = x.reshape(b, res, res, dim)
                xm = jnp.concatenate(
                    [xm[:, 0::2, 0::2], xm[:, 1::2, 0::2],
                     xm[:, 0::2, 1::2], xm[:, 1::2, 1::2]], axis=-1)
                xm = xm.reshape(b, -1, 4 * dim)
                xm = nn.LayerNorm(dtype=self.dtype,
                                  name=f"layers_{i}_downsample_norm")(xm)
                x = nn.Dense(2 * dim, use_bias=False, dtype=self.dtype,
                             name=f"layers_{i}_downsample_reduction")(xm)
                res //= 2
                dim *= 2
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        x = jnp.mean(x, axis=1)
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        name="head")(x.astype(jnp.float32))


FLOAT_SWIN_ARCHS = {
    "swin_tiny_patch4_window7_224": dict(embed_dim=96, depths=(2, 2, 6, 2),
                                         num_heads=(3, 6, 12, 24)),
    "swin_small_patch4_window7_224": dict(embed_dim=96, depths=(2, 2, 18, 2),
                                          num_heads=(3, 6, 12, 24)),
}


def float_swin_model(name: str, **kw) -> FloatSwinTransformer:
    return FloatSwinTransformer(**FLOAT_SWIN_ARCHS[name], **kw)
