#!/usr/bin/env python
"""Per-kernel TPU microbenchmark: tile sweep + stage ablation.

Times the fused block kernels (``attn_block_p`` / ``mlp_block_p``) on real
block parameters from a frozen model, via ``time_inloop`` (one dispatch per
N in-graph calls — the tunnel-safe timing doctrine).  The ablation variants
drop one stage (softmax / gelu / ln) to attribute kernel time between the
MXU GEMMs and the VPU nonlinearity chains; they are perf-diagnostic only
and never run in the engine.

Usage: python scripts/kernel_microbench.py [--model deit_tiny_patch16_224]
                                           [--batch 256]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def build_spec(mname, fam=("ivit", "ivit", "ivit")):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ivit_tpu.engine import freeze_model
    from ivit_tpu.models import str2model

    rng = np.random.default_rng(0)
    model = str2model(mname)(gelu_type=fam[0], softmax_type=fam[1],
                             layernorm_type=fam[2])
    x = jnp.asarray(rng.normal(size=(8, 224, 224, 3)).astype(np.float32))
    from ivit_tpu.utils.hostdev import host_init
    with host_init():
        variables = jax.jit(lambda a: model.init(
            jax.random.PRNGKey(0), a, running_stat=True))(x)
        _, st = jax.jit(lambda v, a: model.apply(
            v, a, running_stat=True, mutable=["quant_stats"]))(variables, x)
        spec = freeze_model(model, {"params": variables["params"],
                                    "quant_stats": st["quant_stats"]})
    return spec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="deit_tiny_patch16_224")
    ap.add_argument("--fam", default="ivit",
                    help="nonlinearity family triple (one name for all three)")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--attn-tiles", default="1,2,4,8")
    ap.add_argument("--mlp-tiles", default="256,512,1024,2048")
    ap.add_argument("--ablations", default=",softmax,ln,softmax+ln")
    ap.add_argument("--sites", action="store_true",
                    help="per-GEMM-site SoL via ablation deltas + "
                         "standalone patch/head GEMMs (VERDICT r3 item 8)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import ivit_tpu.ops.pallas.block as pblk
    from ivit_tpu.utils.benchmarking import time_inloop

    spec = build_spec(args.model, fam=(args.fam,) * 3)
    cfg = spec.config
    p = spec.params
    blk = p["blocks"][0]
    B = args.batch
    C, H = cfg.embed_dim, cfg.num_heads
    N = cfg.num_patches + 1
    n_pad = ((N + 7) // 8) * 8
    bw = cfg.bitwidths
    rng = np.random.default_rng(0)
    x_attn = jnp.asarray(
        rng.integers(-100, 100, size=(B, n_pad, C)).astype(np.int8))
    x_mlp = jnp.asarray(
        rng.integers(-100, 100, size=(B * n_pad, C)).astype(np.int8))

    ln_base = cfg.base_type("ln")
    sm_base = cfg.base_type("softmax")
    gelu_base = cfg.base_type("gelu")

    def attn_fn(tile, ablate):
        def step(x):
            return pblk.attn_block_p(
                x, ln_bias=blk["ln1_bias_int"], s_ln=blk["s_ln1"],
                m_ln=blk["m_ln1"], ln_shift=blk["ln1_shift"],
                qkv_w=blk["qkv_w"], qkv_b=blk["qkv_b"], m_qkv=blk["m_qkv"],
                m_attn=blk["m_attn"], s_attn=blk["s_attn"], m_av=blk["m_av"],
                proj_w=blk["proj_w"], proj_b=blk["proj_b"],
                m_proj=blk["m_proj"], m_res_x=blk["m_res1_x"],
                m_res_id=blk["m_res1_id"], num_heads=H, n_valid=N,
                ln_base=ln_base, sm_base=sm_base,
                s_exp_act=blk.get("s_exp_act"), sm_bit=bw.softmax,
                attn_bits=8, proj_bits=bw.attention_out, out_bits=8,
                out_dtype=jnp.int8, fast_exp=cfg.fast_exp,
                fast_poly=cfg.fast_poly, img_tile=tile, ablate=ablate,
                sm_lut=blk.get("sm_lut") if cfg.use_lut else None,
                sm_sum_i32=cfg.sm_sum_i32)
        return step

    def mlp_fn(tile, ablate):
        abl = ablate.replace("softmax", "gelu")
        def step(x):
            return pblk.mlp_block_p(
                x, ln_bias=blk["ln2_bias_int"], s_ln=blk["s_ln2"],
                m_ln=blk["m_ln2"], ln_shift=blk["ln2_shift"],
                fc1_w=blk["fc1_w"], fc1_b=blk["fc1_b"], m_fc1=blk["m_fc1"],
                s_gelu=blk["s_gelu"], m_gelu=blk["m_gelu"],
                fc2_w=blk["fc2_w"], fc2_b=blk["fc2_b"], m_fc2=blk["m_fc2"],
                m_res_x=blk["m_res2_x"], m_res_id=blk["m_res2_id"],
                ln_base=ln_base, gelu_base=gelu_base,
                mlp_bits=bw.mlp_out, out_bits=8, out_dtype=jnp.int8,
                fast_exp=cfg.fast_exp, fast_poly=cfg.fast_poly,
                tile_rows=tile, ablate=abl,
                gelu_lut=blk.get("gelu_lut") if cfg.use_lut else None)
        return step

    ablations = args.ablations.split(",")
    print(f"# {args.model} batch={B} n_pad={n_pad} C={C} H={H} "
          f"fast_exp={cfg.fast_exp} fast_poly={cfg.fast_poly} "
          f"backend={jax.default_backend()}", flush=True)
    results = []
    for kind, tiles, fn, x0 in (
            ("attn", args.attn_tiles, attn_fn, x_attn),
            ("mlp", args.mlp_tiles, mlp_fn, x_mlp)):
        for tile in [int(v) for v in tiles.split(",")]:
            for abl in ablations:
                abl_k = abl.replace("+", ",")
                try:
                    t = time_inloop(fn(tile, abl_k), x0,
                                    n_iters=args.iters, n_timings=3)
                    rec = {"kernel": kind, "tile": tile, "ablate": abl,
                           "us_per_call": round(t * 1e6, 1),
                           "ms_per_model": round(t * 1e3 * cfg.depth, 3)}
                except Exception as exc:  # noqa: BLE001
                    rec = {"kernel": kind, "tile": tile, "ablate": abl,
                           "error": repr(exc)[:160]}
                print(json.dumps(rec), flush=True)
                results.append(rec)

    if args.sites:
        # Per-GEMM-site speed-of-light (VERDICT r3 item 8): ablation deltas
        # at the default tiles, plus standalone XLA patch/head GEMMs.
        from ivit_tpu.utils.benchmarking import chip_peaks
        peak = chip_peaks()["int8_tops"]
        Dh = C // H
        F = int(cfg.mlp_ratio * C)
        ops = {
            "qkv": ("attn", "qkvgemm", 2 * B * n_pad * C * 3 * C),
            "scores": ("attn", "qk", 2 * B * H * n_pad * n_pad * Dh),
            "ctx": ("attn", "av", 2 * B * H * n_pad * n_pad * Dh),
            "proj": ("attn", "projgemm", 2 * B * n_pad * C * C),
            "fc1": ("mlp", "fc1gemm", 2 * B * n_pad * C * F),
            "fc2": ("mlp", "fc2gemm", 2 * B * n_pad * C * F),
        }
        base = {}
        for kind, fn, x0, tile in (("attn", attn_fn, x_attn, 4),
                                   ("mlp", mlp_fn, x_mlp, 512)):
            base[kind] = time_inloop(fn(tile, ""), x0, n_iters=args.iters,
                                     n_timings=3)
        table = {}
        for site, (kind, abl, site_ops) in ops.items():
            fn, x0, tile = ((attn_fn, x_attn, 4) if kind == "attn"
                            else (mlp_fn, x_mlp, 512))
            t_abl = time_inloop(fn(tile, abl), x0, n_iters=args.iters,
                                n_timings=3)
            d_us = max(0.1, (base[kind] - t_abl) * 1e6)
            table[site] = {"delta_us": round(d_us, 1),
                           "ops": site_ops,
                           "sol": round(site_ops / (d_us * 1e-6) / peak, 3)}
            print(json.dumps({"site": site, **table[site]}), flush=True)
        # standalone XLA patch-embed and head GEMMs at site shapes
        # (time_dispatch, not time_inloop: these change shape, so they
        # cannot ride a scan carry)
        from ivit_tpu.utils.benchmarking import time_dispatch
        ps = cfg.patch_size
        n_tok = cfg.num_patches
        xp = jnp.asarray(rng.integers(-100, 100, size=(
            B, n_tok, ps * ps * 3)).astype(np.int8))
        xh = jnp.asarray(rng.integers(-100, 100, size=(B, C))
                         .astype(np.int8))
        for site, x0, w, m in (
                ("patch", xp, p["patch"]["w"], p["patch"]["m"]),
                ("head", xh, p["head_w"], None)):
            def gemm(a, w=w, m=m):
                acc = jax.lax.dot_general(
                    a, w, (((a.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                if m is None:
                    return acc.astype(jnp.float32)
                return jnp.clip(jnp.round(acc.astype(jnp.float32) * m),
                                -128, 127).astype(jnp.int8)
            gemm_j = jax.jit(gemm)
            t = time_dispatch(gemm_j, x0, iters=max(10, args.iters))
            site_ops = 2 * x0.size * w.shape[-1]
            table[site] = {"us": round(t * 1e6, 1), "ops": site_ops,
                           "sol": round(site_ops / t / peak, 3)}
            print(json.dumps({"site": site, **table[site]}), flush=True)
        print(json.dumps({"per_gemm_site_sol": table,
                          "peak_int8_tops": peak}), flush=True)
        results.append({"per_gemm_site_sol": table})
    return results


if __name__ == "__main__":
    main()
