"""Quantized Swin Transformer (flax.linen).

Re-implementation of the reference's Swin support, which is *broken* in the
reference (``/root/reference/models/swin_quant.py:11`` imports stale class
names and is excluded from its package exports — SURVEY §2.4).  The
architecture below follows the reference graph faithfully — W-MSA with the
relative-position-bias table added through QuantAct identity fusion
(swin_quant.py:142-149), shifted windows with the additive -100 mask before
the integer softmax (:151-158), 16-bit QuantActs on the residual/proj paths
(:110,214,222), PatchMerging 4C->2C downsampling (:304-358), 4-stage pyramid
with average-pool head (:444-564) — wired to the approximation registry the
reference never finished adapting.

TPU-first notes: window partition/reverse are pure reshape/transposes; the
cyclic shift is ``jnp.roll``; all activations channels-last.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from . import registry
from ..ops import quant as q
from .layers import QuantAct, QuantLinear, quant_matmul
from .vit import DropPath, Mlp, PatchEmbed


def window_partition(x, window_size: int):
    """[B, H, W, C] -> [B*nW, ws*ws, C] (swin_quant.py:18-32)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window_size, window_size,
                  w // window_size, window_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window_size * window_size, c)


def window_reverse(windows, window_size: int, h: int, w: int):
    """[B*nW, ws*ws, C] -> [B, H, W, C] (swin_quant.py:35-50)."""
    b = windows.shape[0] // (h * w // window_size // window_size)
    x = windows.reshape(b, h // window_size, w // window_size,
                        window_size, window_size, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


def relative_position_index(window_size: int) -> np.ndarray:
    """Pairwise relative-position lookup table (swin_quant.py:79-94)."""
    coords = np.stack(np.meshgrid(np.arange(window_size),
                                  np.arange(window_size),
                                  indexing="ij"))           # [2, ws, ws]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]               # [2, N, N]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window_size - 1
    rel[:, :, 1] += window_size - 1
    rel[:, :, 0] *= 2 * window_size - 1
    return rel.sum(-1)                                      # [N, N]


def attention_mask(resolution, window_size: int, shift_size: int):
    """0/-100 additive mask for SW-MSA (swin_quant.py:223-247)."""
    h, w = resolution
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -window_size), slice(-window_size, -shift_size),
               slice(-shift_size, None)):
        for ws in (slice(0, -window_size), slice(-window_size, -shift_size),
                   slice(-shift_size, None)):
            img_mask[:, hs, ws, :] = cnt
            cnt += 1
    # pure numpy window partition (this runs at trace time)
    mw = img_mask.reshape(1, h // window_size, window_size,
                          w // window_size, window_size, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(
        -1, window_size * window_size)
    attn_mask = mw[:, None, :] - mw[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """W-MSA with quantized relative-position bias (swin_quant.py:53-169)."""

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, act_scaling_factor, mask=None, *,
                 running_stat=False, train=False,
                 softmax_factory=None):
        b_, n, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, self.num_heads))
        rel_index = relative_position_index(self.window_size)

        x, s = QuantLinear(self.dim * 3, use_bias=self.qkv_bias,
                           name="qkv")(x, act_scaling_factor)
        x, s1 = QuantAct(name="qact1")(x, s, running_stat=running_stat)
        qkv = x.reshape(b_, n, 3, self.num_heads, head_dim)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))
        q_, k_, v_ = qkv[0], qkv[1], qkv[2]

        attn, s = quant_matmul(q_, s1, jnp.swapaxes(k_, -2, -1), s1)
        attn = attn * scale
        s = s * scale
        attn, s = QuantAct(name="qact_attn1")(attn, s,
                                              running_stat=running_stat)

        # quantized relative position bias, added via identity fusion (:142-149)
        table_q, s_table = QuantAct(name="qact_table")(
            table, running_stat=running_stat)
        rel_bias = table_q[rel_index.reshape(-1)].reshape(n, n, -1)
        rel_bias = jnp.transpose(rel_bias, (2, 0, 1))[None]  # [1, nH, N, N]
        attn, s = QuantAct(name="qact2")(
            attn, s, identity=jnp.broadcast_to(rel_bias, attn.shape),
            identity_scale=s_table, running_stat=running_stat)

        if mask is not None:
            nw = mask.shape[0]
            # Quantize the 0/-100 mask onto the current activation grid so
            # the add is integer-exact: the engine adds round(mask/s) in the
            # integer domain (engine/swin_int.py), while a raw float -100
            # add lands between grid points and the int core's round-snap
            # then flips on float noise (reference swin_quant.py:151-158
            # has the raw add, but its Swin never ran).  -100/s >> the
            # softmax exp cutoff, so quantization changes no probability.
            s1d = jax.lax.stop_gradient(jnp.reshape(s, ()))
            mask_q = jnp.round(q.rdiv(mask, s1d)) * s1d
            attn = attn.reshape(b_ // nw, nw, self.num_heads, n, n) \
                + mask_q[None, :, None]
            attn = attn.reshape(-1, self.num_heads, n, n)
        attn, s = softmax_factory(name="int_softmax")(
            attn, s, running_stat=running_stat)

        x, s = quant_matmul(attn, s, v_, s1)
        x = jnp.swapaxes(x, 1, 2).reshape(b_, n, c)
        x, s = QuantAct(name="qact3")(x, s, running_stat=running_stat)
        x, s = QuantLinear(self.dim, name="proj")(x, s)
        x, s = QuantAct(16, name="qact4")(x, s, running_stat=running_stat)
        return x, s


class SwinBlock(nn.Module):
    """Swin block with 16-bit integer residual adds (swin_quant.py:172-301)."""

    dim: int
    input_resolution: tuple
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0
    gelu_factory: Any = None
    softmax_factory: Any = None
    norm_factory: Any = None

    @nn.compact
    def __call__(self, x_1, s_1, *, running_stat=False, train=False):
        h, w = self.input_resolution
        b, l, c = x_1.shape
        window_size, shift_size = self.window_size, self.shift_size
        if min(self.input_resolution) <= window_size:
            window_size = min(self.input_resolution)
            shift_size = 0

        x, s, x_int = self.norm_factory(self.dim, name="norm1")(
            x_1, s_1, running_stat=running_stat)
        x, s = QuantAct(name="qact1")(x, s, running_stat=running_stat,
                                      exact_int=x_int)
        x = x.reshape(b, h, w, c)

        if shift_size > 0:
            x = jnp.roll(x, (-shift_size, -shift_size), axis=(1, 2))
            mask = jnp.asarray(attention_mask(self.input_resolution,
                                              window_size, shift_size))
        else:
            mask = None

        x_windows = window_partition(x, window_size)
        attn_windows, s = WindowAttention(
            self.dim, window_size, self.num_heads, self.qkv_bias,
            name="attn")(x_windows, s, mask, running_stat=running_stat,
                         train=train, softmax_factory=self.softmax_factory)

        x = window_reverse(attn_windows, window_size, h, w)
        if shift_size > 0:
            x = jnp.roll(x, (shift_size, shift_size), axis=(1, 2))
        x = x.reshape(b, h * w, c)

        x = DropPath(self.drop_path, name="drop_path")(x, train=train)
        x_2, s_2 = QuantAct(16, name="qact2")(
            x, s, identity=x_1, identity_scale=s_1,
            running_stat=running_stat)

        x, s, x_int = self.norm_factory(self.dim, name="norm2")(
            x_2, s_2, running_stat=running_stat)
        x, s = QuantAct(name="qact3")(x, s, running_stat=running_stat,
                                      exact_int=x_int)
        x, s = Mlp(int(self.dim * self.mlp_ratio), self.dim,
                   act_factory=self.gelu_factory, name="mlp")(
                       x, s, running_stat=running_stat, train=train)
        x = DropPath(self.drop_path, name="drop_path2")(x, train=train)
        x, s = QuantAct(16, name="qact4")(
            x, s, identity=x_2, identity_scale=s_2,
            running_stat=running_stat)
        return x, s


class PatchMerging(nn.Module):
    """4C -> 2C downsampling (swin_quant.py:304-358)."""

    input_resolution: tuple
    dim: int
    norm_factory: Any = None

    @nn.compact
    def __call__(self, x, s, *, running_stat=False):
        h, w = self.input_resolution
        b, l, c = x.shape
        x = x.reshape(b, h, w, c)
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = x.reshape(b, -1, 4 * c)
        x, s, x_int = self.norm_factory(4 * self.dim, name="norm")(
            x, s, running_stat=running_stat)
        x, s = QuantAct(name="qact1")(x, s, running_stat=running_stat,
                                      exact_int=x_int)
        x, s = QuantLinear(2 * self.dim, use_bias=False, name="reduction")(
            x, s)
        x, s = QuantAct(name="qact2")(x, s, running_stat=running_stat)
        return x, s


class SwinTransformer(nn.Module):
    """Quantized Swin (swin_quant.py:419-564), registry-selected kernels."""

    img_size: int = 224
    patch_size: int = 4
    num_classes: int = 1000
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.1
    ape: bool = False
    patch_norm: bool = True
    gelu_type: str = "ivit"
    softmax_type: str = "ivit"
    layernorm_type: str = "ivit"

    @nn.compact
    def __call__(self, x, *, running_stat: bool = False, train: bool = False):
        gelu_factory = registry.get_gelu(self.gelu_type)
        softmax_factory = registry.get_softmax(self.softmax_type)
        norm_factory = registry.get_layernorm(self.layernorm_type)
        num_layers = len(self.depths)
        grid = self.img_size // self.patch_size

        x, s = QuantAct(name="qact_input")(x, running_stat=running_stat)
        x, s = PatchEmbed(self.patch_size, self.embed_dim,
                          norm_factory=norm_factory if self.patch_norm
                          else None, name="patch_embed")(
                              x, s, running_stat=running_stat)
        if self.ape:
            pos = self.param("absolute_pos_embed",
                             nn.initializers.truncated_normal(0.02),
                             (1, grid * grid, self.embed_dim))
            x_pos, s_pos = QuantAct(16, name="qact_pos")(
                pos, running_stat=running_stat)
            x, s = QuantAct(16, name="qact1")(
                x, s, identity=jnp.broadcast_to(x_pos, x.shape),
                identity_scale=s_pos, running_stat=running_stat)
        else:
            x, s = QuantAct(16, name="qact1")(x, s,
                                              running_stat=running_stat)

        dpr = [float(r) for r in
               np.linspace(0, self.drop_path_rate, sum(self.depths))]
        bi = 0
        for i_layer in range(num_layers):
            dim = int(self.embed_dim * 2 ** i_layer)
            res = (grid // (2 ** i_layer), grid // (2 ** i_layer))
            for d in range(self.depths[i_layer]):
                x, s = SwinBlock(
                    dim=dim, input_resolution=res,
                    num_heads=self.num_heads[i_layer],
                    window_size=self.window_size,
                    shift_size=0 if d % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    drop_path=dpr[bi], gelu_factory=gelu_factory,
                    softmax_factory=softmax_factory,
                    norm_factory=norm_factory,
                    name=f"layers_{i_layer}_blocks_{d}")(
                        x, s, running_stat=running_stat, train=train)
                bi += 1
            if i_layer < num_layers - 1:
                x, s = PatchMerging(res, dim, norm_factory=norm_factory,
                                    name=f"layers_{i_layer}_downsample")(
                                        x, s, running_stat=running_stat)

        num_features = int(self.embed_dim * 2 ** (num_layers - 1))
        x, s, x_int = norm_factory(num_features, name="norm")(
            x, s, running_stat=running_stat)
        x, s = QuantAct(name="qact2")(x, s, running_stat=running_stat,
                                      exact_int=x_int)
        # avgpool over tokens, computed on the exact ints (reference:
        # AdaptiveAvgPool1d on the fake-quant floats, swin_quant.py:553).
        # A float mean's divide-by-N and product roundings are compilation-
        # context dependent; the exact-int sum + rdiv form is deterministic
        # and bit-mirrored by the engine (engine/swin_int.py pool).
        x_int = q.round_ste(q.rdiv(x, s))
        pooled = q.round_ste(q.rdiv(q.exact_int_sum(jnp.swapaxes(x_int, 1, 2)),
                                    jnp.float32(x_int.shape[1])))[..., 0]
        x = pooled * s
        x, s = QuantAct(name="qact3")(x, s, running_stat=running_stat)
        x, _ = QuantLinear(self.num_classes, name="head")(x, s)
        return x


def swin_tiny_patch4_window7_224(**kw):
    kw.setdefault("depths", (2, 2, 6, 2))
    kw.setdefault("num_heads", (3, 6, 12, 24))
    kw.setdefault("embed_dim", 96)
    return SwinTransformer(patch_size=4, window_size=7, **kw)


def swin_small_patch4_window7_224(**kw):
    kw.setdefault("depths", (2, 2, 18, 2))
    kw.setdefault("num_heads", (3, 6, 12, 24))
    kw.setdefault("embed_dim", 96)
    return SwinTransformer(patch_size=4, window_size=7, **kw)


def swin_base_patch4_window7_224(**kw):
    kw.setdefault("depths", (2, 2, 18, 2))
    kw.setdefault("num_heads", (4, 8, 16, 32))
    kw.setdefault("embed_dim", 128)
    return SwinTransformer(patch_size=4, window_size=7, **kw)
