#!/usr/bin/env python
"""Bisect the Swin fused-kernel divergence on hardware, half-block by half.

Full-size finding (scripts/tpu_validate.py on the v5e): Swin-T 224px has
sim == unfused engine EXACT, but fused kernels diverge (engine-vs-pallas
~2.8e-2).  The 56px kernel validator passes, so the bug is shape- or
range-dependent.  This walks the engine loop feeding each half-block the
SAME input (the unfused chain), comparing the fused kernel output per
(stage, block, half) to localize the first diverging site.
"""

import sys

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ivit_tpu.engine.swin_int import (_gelu_int, _gemm_bias,
                                          _layernorm_int, _ln_requant,
                                          _requant, _swin_attn_unfused,
                                          _window_partition_i,
                                          _window_reverse_i, _f32,
                                          freeze_swin_model)
    from ivit_tpu.engine.vit_int import rdiv
    from ivit_tpu.models import str2model
    from ivit_tpu.ops.pallas import block as pblk

    rng = np.random.default_rng(0)
    model = str2model("swin_tiny_patch4_window7_224")(
        gelu_type="ivit", softmax_type="ivit", layernorm_type="ivit",
        drop_path_rate=0.0)
    x0 = jnp.asarray(rng.normal(size=(4, 224, 224, 3)).astype(np.float32))
    from ivit_tpu.utils.hostdev import host_init
    with host_init():
        variables = jax.jit(lambda a: model.init(
            jax.random.PRNGKey(0), a, running_stat=True))(x0)
        qs = variables["quant_stats"]
        calib = jax.jit(lambda v, a: model.apply(
            v, a, running_stat=True, mutable=["quant_stats"]))
        for _ in range(2):
            xb = jnp.asarray(rng.normal(
                size=(4, 224, 224, 3)).astype(np.float32))
            _, st = calib({"params": variables["params"],
                           "quant_stats": qs}, xb)
            qs = st["quant_stats"]
        spec = freeze_swin_model(model, {"params": variables["params"],
                                         "quant_stats": qs})
    cfg = spec.config
    p = jax.device_put(spec.params)
    images = jax.device_put(x0)

    B = images.shape[0]
    ps = cfg.patch_size
    grid = cfg.img_size // ps

    @jax.jit
    def stem(images):
        x = jnp.clip(jnp.round(rdiv(images, p["s_input"])),
                     -128, 127).astype(jnp.int8)
        x = x.reshape(B, grid, ps, grid, ps, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, grid * grid, ps * ps * 3)
        acc = _gemm_bias(x, p["patch"]["w"], p["patch"]["b"])
        x = _requant(acc, p["patch"]["m"], 8)
        y = _layernorm_int(cfg, x, p["patch"]["pn_bias_int"],
                           p["patch"]["pn_shift"])
        x = _ln_requant(y, p["patch"]["s_pn"], p["patch"]["m_norm"], 8)
        return jnp.clip(jnp.round(_f32(x) * p["patch"]["m_x0"]),
                        -(2.0**15), 2.0**15 - 1).astype(jnp.int16)

    x = stem(images)
    res = grid
    dim = cfg.embed_dim
    bi = 0
    for (kind, stage, shift), blk in zip(cfg.layout, p["blocks"]):
        if kind == "merge":
            @jax.jit
            def merge_f(x, mg=blk["merge"], res=res, dim=dim):
                h = w = res
                xm = x.reshape(B, h, w, dim)
                xm = jnp.concatenate(
                    [xm[:, 0::2, 0::2], xm[:, 1::2, 0::2],
                     xm[:, 0::2, 1::2], xm[:, 1::2, 1::2]], axis=-1)
                xm = xm.reshape(B, -1, 4 * dim)
                y = _layernorm_int(cfg, xm, mg["norm_bias_int"],
                                   mg["norm_shift"])
                y = _ln_requant(y, mg["s_norm"], mg["m_norm"], 8)
                from ivit_tpu.engine.vit_int import _dot_i8
                return _requant(_dot_i8(y, mg["red_w"]), mg["m_red"], 8)
            x = merge_f(x)
            res //= 2
            dim *= 2
            continue

        heads = cfg.stage_heads[stage]
        ws = min(cfg.window_size, res)
        n = ws * ws
        nw = (res // ws) ** 2

        def attn_unfused(x, blk=blk, res=res, dim=dim, heads=heads, ws=ws,
                         n=n, shift=shift):
            return _swin_attn_unfused(cfg, blk, x, B, res, dim, heads, ws,
                                      n, shift)

        def attn_fused(x, blk=blk, res=res, dim=dim, heads=heads, ws=ws,
                       nw=nw, shift=shift):
            xw = x.reshape(B, res, res, dim)
            if shift > 0:
                xw = jnp.roll(xw, (-shift, -shift), axis=(1, 2))
            xw = _window_partition_i(xw, ws)
            yo = pblk.swin_attn_block_p(
                xw, ln_bias=blk["ln1_bias_int"], s_ln=blk["s_ln1"],
                m_ln=blk["m_ln1"], ln_shift=blk["ln1_shift"],
                qkv_w=blk["qkv_w"], qkv_b=blk["qkv_b"], m_qkv=blk["m_qkv"],
                m_attn=blk["m_attn"], m_attn2=blk["m_attn2"],
                s_attn=blk["s_attn"], rel_addend=blk["rel_bias_addend"],
                mask_addend=blk.get("mask_int") if shift > 0 else None,
                m_av=blk["m_av"], proj_w=blk["proj_w"], proj_b=blk["proj_b"],
                m_proj=blk["m_proj"], m_res_x=blk["m_res1_x"],
                m_res_id=blk["m_res1_id"], num_heads=heads, n_windows=nw,
                ln_base=cfg.base_type("ln"), sm_base=cfg.base_type("softmax"),
                s_exp_act=blk.get("s_exp_act"), sm_bit=cfg.bitwidths.softmax,
                fast_exp=cfg.fast_exp)
            yo = _window_reverse_i(yo.reshape(-1, ws, ws, dim), ws, res, res)
            if shift > 0:
                yo = jnp.roll(yo, (shift, shift), axis=(1, 2))
            return yo.reshape(B, res * res, dim)

        a_u = np.asarray(jax.jit(attn_unfused)(x))
        a_f = np.asarray(jax.jit(attn_fused)(x))
        d = int((a_u != a_f).sum())
        print(f"blk{bi} stage{stage} shift={shift} dim={dim} ATTN: "
              f"{d}/{a_u.size} ints differ"
              + (f" (max {np.abs(a_u - a_f).max():g})" if d else ""),
              flush=True)
        x = jnp.asarray(a_u).astype(jnp.int16)  # continue on golden chain

        def mlp_unfused(x, blk=blk):
            y = _layernorm_int(cfg, x, blk["ln2_bias_int"], blk["ln2_shift"])
            y = _ln_requant(y, blk["s_ln2"], blk["m_ln2"], 8)
            acc = _gemm_bias(y, blk["fc1_w"], blk["fc1_b"])
            y = _requant(acc, blk["m_fc1"], 8)
            y = _gelu_int(cfg, blk, _f32(y))
            y = _requant(y, blk["m_gelu"], 8)
            acc = _gemm_bias(y, blk["fc2_w"], blk["fc2_b"])
            y = _requant(acc, blk["m_fc2"], 8)
            return jnp.clip(jnp.round(_f32(y) * blk["m_res2_x"])
                            + jnp.round(_f32(x) * blk["m_res2_id"]),
                            -(2.0**15), 2.0**15 - 1).astype(jnp.int16)

        def mlp_fused(x, blk=blk, res=res, dim=dim):
            xf = x.reshape(B * res * res, dim)
            xf = pblk.mlp_block_p(
                xf, ln_bias=blk["ln2_bias_int"], s_ln=blk["s_ln2"],
                m_ln=blk["m_ln2"], ln_shift=blk["ln2_shift"],
                fc1_w=blk["fc1_w"], fc1_b=blk["fc1_b"], m_fc1=blk["m_fc1"],
                s_gelu=blk["s_gelu"], m_gelu=blk["m_gelu"],
                fc2_w=blk["fc2_w"], fc2_b=blk["fc2_b"], m_fc2=blk["m_fc2"],
                m_res_x=blk["m_res2_x"], m_res_id=blk["m_res2_id"],
                ln_base=cfg.base_type("ln"), gelu_base=cfg.base_type("gelu"),
                mlp_bits=8, out_bits=16, out_dtype=jnp.int16,
                fast_exp=cfg.fast_exp)
            return xf.reshape(B, res * res, dim)

        m_u = np.asarray(jax.jit(mlp_unfused)(x))
        if dim % 128 == 0:
            m_f = np.asarray(jax.jit(mlp_fused)(x))
            d = int((m_u != m_f).sum())
            print(f"blk{bi} stage{stage} dim={dim} MLP:  "
                  f"{d}/{m_u.size} ints differ"
                  + (f" (max {np.abs(m_u - m_f).max():g})" if d else ""),
                  flush=True)
        else:
            print(f"blk{bi} stage{stage} dim={dim} MLP:  (not lane-aligned; "
                  "unfused on both paths)", flush=True)
        x = jnp.asarray(m_u).astype(jnp.int16)
        bi += 1

    print("done", flush=True)


if __name__ == "__main__":
    main()
