"""Scan-over-blocks execution of the QAT sim (graph-size reduction).

``scan_apply`` runs a :class:`VisionTransformer` forward as
pre-blocks -> ``lax.scan`` over the ``depth`` stacked block param subtrees ->
tail, producing BIT-IDENTICAL values to ``model.apply`` (same per-block
math, same sequential order; blocks share shapes so one traced body serves
all).  The emitted XLA module is ~depth-times smaller than the unrolled
``model.apply`` graph — which matters on the hosted TPU: the axon tunnel's
remote-compile helper intermittently SIGSEGVs on multi-MB modules, while
one-block-sized graphs compile reliably (scripts/compile_probe.py data).

Used by scripts/tpu_validate.py for full-size hardware numerics validation;
also usable as a drop-in for any full-model sim evaluation on the tunnel.

Reference analogue: none (the torch reference runs eager); this is the
TPU-native answer to compiling ``models/vit_quant.py:285-311``'s loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .vit import Block, VisionTransformer
from . import registry


def _block_module(model: VisionTransformer, drop_path: float = 0.0) -> Block:
    bw = model.bitwidths
    return Block(
        dim=model.embed_dim, num_heads=model.num_heads,
        mlp_ratio=model.mlp_ratio, qkv_bias=model.qkv_bias,
        qk_scale=model.qk_scale, drop=model.drop_rate,
        attn_drop=model.attn_drop_rate, drop_path=drop_path,
        gelu_factory=registry.get_gelu(model.gelu_type),
        softmax_factory=registry.get_softmax(model.softmax_type, bw.softmax),
        norm_factory=registry.get_layernorm(model.layernorm_type),
        attention_out_bw=bw.attention_out, softmax_bw=bw.softmax,
        mlp_out_bw=bw.mlp_out, norm2_in_bw=bw.norm2_in,
        att_block_out_bw=bw.att_block_out)


def _stack_blocks(tree: dict, depth: int):
    subs = [tree[f"blocks_{i}"] for i in range(depth)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *subs)


def _unstack_blocks(stacked, depth: int) -> dict:
    return {f"blocks_{i}": jax.tree.map(lambda v, i=i: v[i], stacked)
            for i in range(depth)}


def scan_apply(model: VisionTransformer, variables, x, *,
               running_stat: bool = False):
    """Forward pass equal to ``model.apply(variables, x, running_stat=...)``.

    With ``running_stat=True`` (calibration), returns
    ``(logits, {"quant_stats": updated})`` like ``model.apply(...,
    mutable=["quant_stats"])``; otherwise returns logits.
    ``drop_path``/dropout are inactive (eval semantics), matching the
    deterministic paths the engine freezes.
    """
    params = variables["params"]
    qstats = variables["quant_stats"]
    depth = model.depth
    blk = _block_module(model)
    mutable = ["quant_stats"] if running_stat else False

    def sub(name):
        v = {}
        if name in params:          # pure QuantActs carry no params at all
            v["params"] = params[name]
        if name in qstats:
            v["quant_stats"] = qstats[name]
        return v

    # carry over every existing stat subtree; updated ones overwrite below,
    # so the returned tree always has the full quant_stats structure
    new_stats = dict(qstats)

    def run(name, mod, *args, **kw):
        out = mod.apply(sub(name), *args, running_stat=running_stat,
                        mutable=mutable, **kw)
        if running_stat:
            out, st = out
            if "quant_stats" in st:     # stat-less modules return {}
                new_stats[name] = st["quant_stats"]
        return out

    from .layers import QuantAct, QuantLinear
    from .vit import PatchEmbed

    bw = model.bitwidths
    b = x.shape[0]
    x, s = run("qact_input", QuantAct(), x)
    x, s = run("patch_embed",
               PatchEmbed(model.patch_size, model.embed_dim, bw.patch_embed),
               x, s)
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, model.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    x_pos, s_pos = run("qact_pos", QuantAct(bw.pos_encoding),
                       params["pos_embed"])
    x, s = run("qact1", QuantAct(bw.block_input), x, s,
               identity=jnp.broadcast_to(x_pos, x.shape),
               identity_scale=s_pos)

    p_stack = _stack_blocks(params, depth)
    q_stack = _stack_blocks(qstats, depth)

    def body(carry, blk_vars):
        xc, sc = carry
        bp, bq = blk_vars
        out = blk.apply({"params": bp, "quant_stats": bq}, xc, sc,
                        running_stat=running_stat, mutable=mutable)
        if running_stat:
            (xo, so), st = out
            return (xo, so), st["quant_stats"]
        xo, so = out
        return (xo, so), None

    (x, s), stats_out = jax.lax.scan(body, (x, s), (p_stack, q_stack))
    if running_stat:
        new_stats.update(_unstack_blocks(stats_out, depth))

    norm_mod = registry.get_layernorm(model.layernorm_type)(model.embed_dim)
    x, s, x_int = run("norm", norm_mod, x, s)
    x = x[:, 0]
    x, s = run("qact2", QuantAct(), x, s, exact_int=x_int[:, 0])
    out = QuantLinear(model.num_classes).apply({"params": params["head"]}, x, s)
    x, _ = out
    if running_stat:
        return x, {"quant_stats": new_stats}
    return x


def swin_chunked_apply(model, variables, x, *, running_stat: bool = False):
    """Piecewise Swin sim forward, bit-identical to ``model.apply``.

    Swin's stages are shape-heterogeneous, so instead of one ``lax.scan``
    this executes each submodule as its OWN small jit (pre / per-block /
    per-merge / tail) — every piece well under the axon compile helper's
    reliability threshold, with one compile per distinct block signature
    (8 for Swin-T: 4 stages x {W, SW}).  drop_path is forced to 0.0, which
    is value-identical at eval/calibration (DropPath is inactive when
    ``train=False``).  Return convention matches :func:`scan_apply`.
    """
    import functools

    from .swin import PatchMerging, SwinBlock
    from .layers import QuantAct, QuantLinear
    from .vit import PatchEmbed as SwinPatchEmbed  # swin reuses vit's

    params = variables["params"]
    qstats = variables["quant_stats"]
    mutable = ["quant_stats"] if running_stat else False
    new_stats = dict(qstats)

    gelu_factory = registry.get_gelu(model.gelu_type)
    softmax_factory = registry.get_softmax(model.softmax_type)
    norm_factory = registry.get_layernorm(model.layernorm_type)
    grid = model.img_size // model.patch_size
    num_layers = len(model.depths)

    def sub(name):
        v = {}
        if name in params:
            v["params"] = params[name]
        if name in qstats:
            v["quant_stats"] = qstats[name]
        return v

    jit_cache: dict = {}

    def run(name, mod, *args, cache_key=None, **kw):
        key = cache_key if cache_key is not None else name
        if key not in jit_cache:
            jit_cache[key] = jax.jit(functools.partial(
                mod.apply, running_stat=running_stat, mutable=mutable))
        out = jit_cache[key](sub(name), *args, **kw)
        if running_stat:
            out, st = out
            if "quant_stats" in st:
                new_stats[name] = st["quant_stats"]
        return out

    assert not model.ape, "chunked swin: ape variant not wired"
    x, s = run("qact_input", QuantAct(), x)
    x, s = run("patch_embed",
               SwinPatchEmbed(model.patch_size, model.embed_dim,
                              norm_factory=norm_factory if model.patch_norm
                              else None), x, s)
    x, s = run("qact1", QuantAct(16), x, s)

    for i_layer in range(num_layers):
        dim = int(model.embed_dim * 2 ** i_layer)
        res = (grid // (2 ** i_layer), grid // (2 ** i_layer))
        for d in range(model.depths[i_layer]):
            shift = 0 if d % 2 == 0 else model.window_size // 2
            blk = SwinBlock(
                dim=dim, input_resolution=res,
                num_heads=model.num_heads[i_layer],
                window_size=model.window_size, shift_size=shift,
                mlp_ratio=model.mlp_ratio, qkv_bias=model.qkv_bias,
                drop_path=0.0, gelu_factory=gelu_factory,
                softmax_factory=softmax_factory, norm_factory=norm_factory)
            x, s = run(f"layers_{i_layer}_blocks_{d}", blk, x, s,
                       cache_key=("blk", i_layer, shift))
        if i_layer < num_layers - 1:
            merge = PatchMerging(res, dim, norm_factory=norm_factory)
            x, s = run(f"layers_{i_layer}_downsample", merge, x, s,
                       cache_key=("merge", i_layer))

    num_features = int(model.embed_dim * 2 ** (num_layers - 1))
    x, s, x_int = run("norm", norm_factory(num_features), x, s)
    x, s = run("qact2", QuantAct(), x, s, exact_int=x_int)

    from ..ops import quant as q
    x_int = q.round_ste(q.rdiv(x, s))
    pooled = q.round_ste(q.rdiv(q.exact_int_sum(jnp.swapaxes(x_int, 1, 2)),
                                jnp.float32(x_int.shape[1])))[..., 0]
    x = pooled * s
    x, s = run("qact3", QuantAct(), x, s)
    x, _ = QuantLinear(model.num_classes).apply(
        {"params": params["head"]}, x, s)
    if running_stat:
        return x, {"quant_stats": new_stats}
    return x
