#!/usr/bin/env python
"""Stage-cut bisection INSIDE swin_attn_block_p for the stage1 divergence.

Phase-1 finding (scripts/debug_swin_kernel_tpu.py): only Swin-T stage1
(dim=192, heads=6, nw=16) attention diverges fused-vs-unfused on hardware;
stages 0/2/3 and every MLP are exact.  This re-runs block 2 with debug
kernels that early-exit after each internal stage (ln / qkv / scores /
probs / ctx / proj / out), comparing Mosaic vs interpret vs an XLA-op
emulation built from the same helper functions, to find the first
diverging op zone.
"""

import functools
import sys

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ivit_tpu.engine.swin_int import (_gemm_bias, _layernorm_int,
                                          _ln_requant, _requant,
                                          _swin_attn_unfused,
                                          _window_partition_i, _f32,
                                          freeze_swin_model)
    from ivit_tpu.engine.vit_int import rdiv
    from ivit_tpu.models import str2model
    from ivit_tpu.ops.pallas import block as pblk
    from ivit_tpu.ops.pallas import _kernel_trace

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
    grid_sz = cfg.img_size // ps

    @jax.jit
    def stem(images):
        x = jnp.clip(jnp.round(rdiv(images, p["s_input"])),
                     -128, 127).astype(jnp.int8)
        x = x.reshape(B, grid_sz, ps, grid_sz, ps, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            B, grid_sz * grid_sz, ps * ps * 3)
        acc = _gemm_bias(x, p["patch"]["w"], p["patch"]["b"])
        x = _requant(acc, p["patch"]["m"], 8)
        y = _layernorm_int(cfg, x, p["patch"]["pn_bias_int"],
                           p["patch"]["pn_shift"])
        x = _ln_requant(y, p["patch"]["s_pn"], p["patch"]["m_norm"], 8)
        return jnp.clip(jnp.round(_f32(x) * p["patch"]["m_x0"]),
                        -(2.0**15), 2.0**15 - 1).astype(jnp.int16)

    # walk unfused chain to block 2's input
    x = stem(images)
    res, dim = grid_sz, cfg.embed_dim
    blocks = []
    for (kind, stage, shift), blk in zip(cfg.layout, p["blocks"]):
        if kind == "merge":
            from ivit_tpu.engine.vit_int import _dot_i8

            @jax.jit
            def merge_f(x, mg=blk["merge"], res=res, dim=dim):
                xm = x.reshape(B, res, res, dim)
                xm = jnp.concatenate(
                    [xm[:, 0::2, 0::2], xm[:, 1::2, 0::2],
                     xm[:, 0::2, 1::2], xm[:, 1::2, 1::2]], axis=-1)
                xm = xm.reshape(B, -1, 4 * dim)
                y = _layernorm_int(cfg, xm, mg["norm_bias_int"],
                                   mg["norm_shift"])
                y = _ln_requant(y, mg["s_norm"], mg["m_norm"], 8)
                return _requant(_dot_i8(y, mg["red_w"]), mg["m_red"], 8)
            x = merge_f(x)
            res //= 2
            dim *= 2
            continue
        blocks.append(((stage, shift, res, dim), blk, x))
        heads = cfg.stage_heads[stage]
        ws = min(cfg.window_size, res)
        n = ws * ws
        x = jax.jit(lambda xx, blk=blk, res=res, dim=dim, heads=heads,
                    ws=ws, n=n, shift=shift: _swin_attn_unfused(
                        cfg, blk, xx, B, res, dim, heads, ws, n, shift))(x)

        @jax.jit
        def mlp_u(xx, blk=blk):
            from ivit_tpu.engine.swin_int import _gelu_int
            y = _layernorm_int(cfg, xx, blk["ln2_bias_int"],
                               blk["ln2_shift"])
            y = _ln_requant(y, blk["s_ln2"], blk["m_ln2"], 8)
            acc = _gemm_bias(y, blk["fc1_w"], blk["fc1_b"])
            y = _requant(acc, blk["m_fc1"], 8)
            y = _gelu_int(cfg, blk, _f32(y))
            y = _requant(y, blk["m_gelu"], 8)
            acc = _gemm_bias(y, blk["fc2_w"], blk["fc2_b"])
            y = _requant(acc, blk["m_fc2"], 8)
            return jnp.clip(jnp.round(_f32(y) * blk["m_res2_x"])
                            + jnp.round(_f32(xx) * blk["m_res2_id"]),
                            -(2.0**15), 2.0**15 - 1).astype(jnp.int16)
        x = mlp_u(x)
        if len(blocks) >= 3:
            break

    (stage, shift, res, dim), blk, x_in = blocks[2]   # block 2: first bad
    heads = cfg.stage_heads[stage]
    ws = min(cfg.window_size, res)
    n = ws * ws
    nw = (res // ws) ** 2
    print(f"target blk2: stage{stage} shift={shift} dim={dim} heads={heads} "
          f"res={res} nw={nw}", flush=True)

    xw_f = x_in.reshape(B, res, res, dim)
    if shift > 0:
        xw_f = jnp.roll(xw_f, (-shift, -shift), axis=(1, 2))
    xw = _window_partition_i(xw_f, ws)              # [B*nW, n, dim] i16
    bw_ = xw.shape[0]
    wt = 8
    ln_base, sm_base = cfg.base_type("ln"), cfg.base_type("softmax")

    CUTS = ["ln", "qkv", "scores", "probs", "ctx", "proj", "out"]

    def cut_kernel(x_ref, lnb_ref, sln_ref, mln_ref, wqkv_ref, bqkv_ref,
                   mqkv_ref, rel_ref, mask_ref, wproj_ref, bproj_ref,
                   mproj_ref, sc_ref, o_ref, ctx_ref, scores_ref, *, cut):
        wt_, n_, c = x_ref.shape
        hd = c // heads
        x_f = x_ref[...].astype(jnp.float32).reshape(wt_ * n_, c)
        m_attn, m_attn2, s_attn = sc_ref[0], sc_ref[1], sc_ref[2]
        m_av, m_res_x, m_res_id = sc_ref[3], sc_ref[4], sc_ref[5]
        pw_shift = sc_ref[6]

        if ln_base == "ivit":
            y = pblk._i_layernorm(x_f, lnb_ref[...])
        else:
            y = pblk._ibert_layernorm(x_f, lnb_ref[...], pw_shift)
        y = pblk._ln_requant(y, sln_ref[...], mln_ref[...], 8).astype(jnp.int8)
        if cut == "ln":
            o_ref[...] = y.astype(jnp.float32)
            return
        acc = jax.lax.dot_general(y, wqkv_ref[...], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        acc = acc + bqkv_ref[...]
        qkv = pblk._requant(acc.astype(jnp.float32), mqkv_ref[...],
                            8).astype(jnp.int8)
        if cut == "qkv":
            o_ref[...] = qkv.astype(jnp.float32)
            return
        for w in range(wt_):
            rows = slice(w * n_, (w + 1) * n_)
            for h in range(heads):
                q_h = qkv[rows, h * hd:(h + 1) * hd]
                k_h = qkv[rows, c + h * hd:c + (h + 1) * hd]
                s32 = jax.lax.dot_general(
                    q_h, k_h, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                s = jnp.clip(jnp.round(s32.astype(jnp.float32) * m_attn),
                             -128.0, 127.0)
                a = jnp.clip(jnp.round(s * m_attn2) + rel_ref[h],
                             -128.0, 127.0)
                if shift > 0:
                    a = a + mask_ref[w]
                srows = slice((w * heads + h) * n_, (w * heads + h + 1) * n_)
                scores_ref[srows, :] = a
        if cut == "scores":
            o_ref[...] = scores_ref[...]
            return
        if sm_base == "ivit":
            probs = pblk._shiftmax(scores_ref[...], s_attn,
                                   cfg.bitwidths.softmax, n_, cfg.fast_exp)
        else:
            probs = pblk._ibert_softmax(scores_ref[...], s_attn, sc_ref[7],
                                        cfg.bitwidths.softmax, n_,
                                        cfg.fast_exp)
        scores_ref[...] = probs
        if cut == "probs":
            o_ref[...] = scores_ref[...]
            return
        for w in range(wt_):
            rows = slice(w * n_, (w + 1) * n_)
            for h in range(heads):
                v_h = qkv[rows, 2 * c + h * hd:2 * c + (h + 1) * hd]
                srows = slice((w * heads + h) * n_, (w * heads + h + 1) * n_)
                ctx_h = pblk._ctx_dot(scores_ref[srows, :], v_h,
                                      cfg.bitwidths.softmax)
                ctx_ref[rows, h * hd:(h + 1) * hd] = pblk._requant(
                    ctx_h.astype(jnp.float32), m_av, 8).astype(ctx_ref.dtype)
        if cut == "ctx":
            o_ref[...] = ctx_ref[...].astype(jnp.float32)
            return
        acc = jax.lax.dot_general(ctx_ref[...].astype(jnp.int8),
                                  wproj_ref[...],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        acc = acc + bproj_ref[...]
        y2 = pblk._requant(acc.astype(jnp.float32), mproj_ref[...], 16)
        if cut == "proj":
            o_ref[...] = y2
            return
        out = jnp.clip(jnp.round(y2 * m_res_x) + jnp.round(x_f * m_res_id),
                       -(2.0**15), 2.0**15 - 1)
        o_ref[...] = out

    import os
    CTX_DTYPE = (jnp.float32 if os.environ.get("CTX_F32") else jnp.int8)

    def run_cut(cut, interpret):
        if cut in ("scores", "probs"):
            oshape = (bw_ * heads * n, n)
        elif cut == "qkv":
            oshape = (bw_ * n, 3 * dim)
        else:
            oshape = (bw_ * n, dim)
        blk_rows = oshape[0] // (bw_ // wt)
        mask = (blk["mask_int"].astype(jnp.float32) if shift > 0
                else jnp.zeros((1, n, n), jnp.float32))
        nblk = nw // wt if shift > 0 else 1
        mask_spec = pl.BlockSpec(
            (wt if shift > 0 else 1, n, n),
            (lambda i: (i % nblk, 0, 0)) if shift > 0
            else (lambda i: (0, 0, 0)), memory_space=pltpu.VMEM)
        scalars = jnp.stack([
            jnp.reshape(blk["m_attn"], ()).astype(jnp.float32),
            jnp.reshape(blk["m_attn2"], ()).astype(jnp.float32),
            jnp.reshape(blk["s_attn"], ()).astype(jnp.float32),
            jnp.reshape(blk["m_av"], ()).astype(jnp.float32),
            jnp.reshape(blk["m_res1_x"], ()).astype(jnp.float32),
            jnp.reshape(blk["m_res1_id"], ()).astype(jnp.float32),
            jnp.exp2(jnp.round(jnp.reshape(blk["ln1_shift"], ()))).astype(
                jnp.float32),
            (jnp.reshape(blk["s_exp_act"], ()).astype(jnp.float32)
             if blk.get("s_exp_act") is not None else jnp.float32(1.0)),
        ])
        c = dim
        with _kernel_trace(interpret):
            out = pl.pallas_call(
                functools.partial(cut_kernel, cut=cut),
                name=f"swin_cut_{cut}",
                out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
                grid=(bw_ // wt,),
                in_specs=[
                    pl.BlockSpec((wt, n, c), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, c), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, c), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, c), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((c, 3 * c), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 3 * c), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 3 * c), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((heads, n, n), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    mask_spec,
                    pl.BlockSpec((c, c), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, c), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, c), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_specs=pl.BlockSpec((blk_rows, oshape[1]),
                                       lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((wt * n, c), CTX_DTYPE),
                    pltpu.VMEM((wt * heads * n, n), jnp.float32)],
                interpret=interpret,
            )(xw,
              blk["ln1_bias_int"].astype(jnp.float32).reshape(1, c),
              blk["s_ln1"].astype(jnp.float32).reshape(1, c),
              blk["m_ln1"].astype(jnp.float32).reshape(1, c),
              blk["qkv_w"], blk["qkv_b"].reshape(1, 3 * c),
              blk["m_qkv"].astype(jnp.float32).reshape(1, 3 * c),
              blk["rel_bias_addend"].astype(jnp.float32),
              mask,
              blk["proj_w"], blk["proj_b"].reshape(1, c),
              blk["m_proj"].astype(jnp.float32).reshape(1, c),
              scalars)
        return np.asarray(out)

    for cut in CUTS:
        moz = run_cut(cut, interpret=False)
        itp = run_cut(cut, interpret=True)
        d = int((moz != itp).sum())
        extra = ""
        if d:
            idx = np.argwhere(moz != itp)
            i0 = tuple(idx[0])
            extra = (f"  first@{i0}: mosaic={moz[i0]!r} interp={itp[i0]!r}; "
                     f"maxabs {np.abs(moz - itp).max():g}")
        print(f"cut={cut:7s} mosaic-vs-interp: {d}/{moz.size} differ{extra}",
              flush=True)
        if d:
            break
    print("done", flush=True)


if __name__ == "__main__":
    main()
