#!/usr/bin/env python
"""Locate the first site where the integer engine diverges from the QAT sim.

Walks the unfused engine block-by-block next to the sim's captured
intermediates (both on the current backend) and prints the first stage per
block whose fake-quant value (int * scale) differs beyond float noise.

Usage: python scripts/debug_sim_engine_sites.py [--img 64] [--depth 12]
       [--family ivit] [--cpu]
"""

import argparse
import sys

sys.path.insert(0, ".")

p = argparse.ArgumentParser()
p.add_argument("--img", type=int, default=64)
p.add_argument("--depth", type=int, default=12)
p.add_argument("--dim", type=int, default=192)
p.add_argument("--heads", type=int, default=3)
p.add_argument("--family", default="ivit")
p.add_argument("--cpu", action="store_true")
args = p.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from ivit_tpu.engine import freeze_model
from ivit_tpu.engine.freeze import _act_scale, _sym_scale
from ivit_tpu.engine.vit_int import (_container, _dot_i8, _f32,
                                     _gelu_requant_int, _layernorm_int,
                                     _requant, _softmax_int)


def _rr_maybe(y, my, xr, mx, bits):
    out = jnp.clip(jnp.round(_f32(y) * my) + jnp.round(_f32(xr) * mx),
                   -(2.0 ** (bits - 1)), 2.0 ** (bits - 1) - 1)
    return out.astype(_container(bits))
from ivit_tpu.models import VisionTransformer

rng = np.random.default_rng(0)
model = VisionTransformer(
    img_size=args.img, patch_size=16, embed_dim=args.dim, depth=args.depth,
    num_heads=args.heads, num_classes=100, gelu_type=args.family,
    softmax_type=args.family, layernorm_type=args.family)
x0 = jnp.asarray(rng.normal(size=(4, args.img, args.img, 3)).astype(np.float32))
variables = jax.jit(lambda a: model.init(
    jax.random.PRNGKey(0), a, running_stat=True))(x0)
_, st = jax.jit(lambda v, a: model.apply(
    v, a, running_stat=True, mutable=["quant_stats"]))(variables, x0)
frozen = {"params": variables["params"], "quant_stats": st["quant_stats"]}

out, mods = model.apply(frozen, x0, running_stat=False,
                        capture_intermediates=True, mutable=["intermediates"])
inter = jax.device_get(mods["intermediates"])


def sim_val(path):
    node = inter
    for part in path.split("/"):
        node = node[part]
    val = node["__call__"][0]
    if isinstance(val, tuple):
        val = val[0]
    return np.asarray(val)


spec = freeze_model(model, frozen)
cfg = spec.config
pp = jax.device_get(spec.params)
Q = jax.device_get(frozen["quant_stats"])
bw = cfg.bitwidths

B = x0.shape[0]
ps = cfg.patch_size
g = cfg.img_size // ps
C = cfg.embed_dim
H = cfg.num_heads
Dh = cfg.head_dim
N = cfg.num_patches + 1


def cmp(tag, eng_int, scale, sim_path, atol_steps=0.51):
    got = np.asarray(_f32(jnp.asarray(eng_int))) * np.asarray(scale)
    want = sim_val(sim_path)
    if got.shape != want.shape:
        print(f"  {tag}: SHAPE {got.shape} vs {want.shape}")
        return False
    step = np.asarray(scale).max()
    d = np.abs(got - want)
    bad = d.max() / max(step, 1e-30)
    if bad > atol_steps:
        frac = (d > step * 0.5).mean()
        print(f"  {tag}: max |d| = {bad:.3g} quant steps, "
              f"mismatch frac {frac:.4f}")
        return False
    return True


# --- engine walk (mirrors engine_forward's unfused path) -------------------
x = jnp.clip(jnp.round(x0 / pp["s_input"]), -128, 127).astype(jnp.int8)
x = x.reshape(B, g, ps, g, ps, 3).transpose(0, 1, 3, 2, 4, 5)
x = x.reshape(B, g * g, ps * ps * 3)
acc = _dot_i8(x, jnp.asarray(pp["patch"]["w"])) + pp["patch"]["b"]
x = _requant(acc, pp["patch"]["m"], bw.patch_embed)
cls = jnp.broadcast_to(jnp.asarray(pp["cls_int"]).astype(jnp.int32), (B, 1, C))
x = jnp.concatenate([cls, x.astype(jnp.int32)], axis=1)
x = jnp.clip(jnp.round(_f32(x) * pp["m_x0"]) + pp["pos_addend"],
             -(2.0 ** (bw.block_input - 1)),
             2.0 ** (bw.block_input - 1) - 1)

s_block_in = _act_scale(Q, "qact1", bw.block_input)
cmp("qact1(top)", x, s_block_in, "qact1")

for i, blk in enumerate(pp["blocks"]):
    bq = Q[f"blocks_{i}"]
    aq = bq["attn"]
    mq = bq["mlp"]
    print(f"block {i}:")
    ok = True

    y = _layernorm_int(cfg, x, blk["ln1_bias_int"], blk["ln1_shift"])
    y = _requant(y, blk["m_ln1"], 8)
    s_a1 = _act_scale(bq, "qact1", 8)
    ok &= cmp("  ln1->qact1", y, s_a1, f"blocks_{i}/qact1")

    acc = _dot_i8(y, jnp.asarray(blk["qkv_w"])) + blk["qkv_b"]
    y = _requant(acc, blk["m_qkv"], 8)
    s_q = _act_scale(aq, "qact1", 8)
    ok &= cmp("  qkv", y, s_q, f"blocks_{i}/attn/qact1")

    qkv = y.reshape(B, N, 3, H, Dh)
    q_, k_, v_ = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scores = jax.lax.dot_general(q_, k_, (((3,), (3,)), ((0, 2), (0, 2))),
                                 preferred_element_type=jnp.int32)
    scores = _requant(scores, blk["m_attn"], 8)
    s_attn = _act_scale(aq, "qact_attn1", 8)
    ok &= cmp("  scores", scores, s_attn, f"blocks_{i}/attn/qact_attn1")

    probs = _softmax_int(cfg, blk, scores, pallas=False)
    s_sm = (np.float32(1.0 / 2 ** (bw.softmax - 1)))
    ok &= cmp("  softmax", probs, s_sm, f"blocks_{i}/attn/int_softmax")

    ctx = jax.lax.dot_general(probs, v_, (((3,), (1,)), ((0, 1), (0, 2))),
                              preferred_element_type=jnp.int32)
    y = _requant(ctx, blk["m_av"], 8)
    s_a2 = _act_scale(aq, "qact2", 8)
    y_sim_layout = jnp.swapaxes(jnp.asarray(y), 1, 2).reshape(B, N, C)
    ok &= cmp("  attn@v", y_sim_layout, s_a2, f"blocks_{i}/attn/qact2")

    proj_w3 = jnp.asarray(blk["proj_w"]).reshape(H, Dh, C)
    acc = jax.lax.dot_general(jnp.asarray(y), proj_w3,
                              (((1, 3), (0, 1)), ((), ())),
                              preferred_element_type=jnp.int32) + blk["proj_b"]
    y = _requant(acc, blk["m_proj"], bw.attention_out)
    s_a3 = _act_scale(aq, "qact3", bw.attention_out)
    ok &= cmp("  proj", y, s_a3, f"blocks_{i}/attn/qact3")

    x = _rr_maybe(y, blk["m_res1_x"], x, blk["m_res1_id"], bw.norm2_in)
    s_res1 = _act_scale(bq, "qact2", bw.norm2_in)
    ok &= cmp("  res1", x, s_res1, f"blocks_{i}/qact2")

    y = _layernorm_int(cfg, x, blk["ln2_bias_int"], blk["ln2_shift"])
    y = _requant(y, blk["m_ln2"], 8)
    s_m1 = _act_scale(bq, "qact3", 8)
    ok &= cmp("  ln2->qact3", y, s_m1, f"blocks_{i}/qact3")

    acc = _dot_i8(y, jnp.asarray(blk["fc1_w"])) + blk["fc1_b"]
    y = _requant(acc, blk["m_fc1"], 8)
    s_g = _act_scale(mq, "qact_gelu", 8)
    ok &= cmp("  fc1", y, s_g, f"blocks_{i}/mlp/qact_gelu")

    y = _gelu_requant_int(cfg, blk, y, 8, pallas=False)
    s_m2 = _act_scale(mq, "qact1", 8)
    ok &= cmp("  gelu", y, s_m2, f"blocks_{i}/mlp/qact1")

    acc = _dot_i8(y, jnp.asarray(blk["fc2_w"])) + blk["fc2_b"]
    y = _requant(acc, blk["m_fc2"], bw.mlp_out)
    s_mo = _act_scale(mq, "qact2", bw.mlp_out)
    ok &= cmp("  fc2", y, s_mo, f"blocks_{i}/mlp/qact2")

    x = _rr_maybe(y, blk["m_res2_x"], x, blk["m_res2_id"], bw.att_block_out)
    s_out = _act_scale(bq, "qact4", bw.att_block_out)
    ok &= cmp("  res2", x, s_out, f"blocks_{i}/qact4")
    s_block_in = s_out
    if not ok:
        print("  (first divergent block shown above; continuing)")
