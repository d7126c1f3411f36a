#!/usr/bin/env python
"""Per-stage Swin window-attention kernel microbenchmark + ablations.

Times ``swin_attn_block_p`` at each real Swin stage geometry from a frozen
model (``time_inloop`` — tunnel-safe), with stage ablations (softmax / qk /
av / ln) to attribute kernel time between the per-(window, head) MXU dot
loops and the VPU chains.  Perf-diagnostic only; ablations never run in the
engine.

Usage: python scripts/swin_kernel_microbench.py [--model swin_tiny_...]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="swin_tiny_patch4_window7_224")
    ap.add_argument("--fam", default="ivit")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--win-tiles", default="8")
    ap.add_argument("--stages", default="0,1,2,3")
    ap.add_argument("--ablations", default=",softmax,qk,av,qk+av,softmax+qk+av,ln")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import ivit_tpu.ops.pallas.block as pblk
    from ivit_tpu.engine.swin_int import freeze_swin_model
    from ivit_tpu.models import str2model
    from ivit_tpu.models.chunked import swin_chunked_apply
    from ivit_tpu.utils.benchmarking import time_inloop
    from ivit_tpu.utils.hostdev import host_init

    rng = np.random.default_rng(0)
    model = str2model(args.model)(gelu_type=args.fam, softmax_type=args.fam,
                                  layernorm_type=args.fam, drop_path_rate=0.0)
    x_cal = jnp.asarray(rng.normal(size=(4, 224, 224, 3)).astype(np.float32))
    with host_init():
        variables = jax.jit(lambda a: model.init(
            jax.random.PRNGKey(0), a, running_stat=True))(x_cal)
    variables = jax.device_put(variables)
    _, st = swin_chunked_apply(model, variables, x_cal, running_stat=True)
    spec = freeze_swin_model(model, {"params": variables["params"],
                                     "quant_stats": st["quant_stats"]})
    cfg = spec.config
    B = args.batch

    # first block of each stage (shift=0) and the shifted second block
    stage_blocks = {}
    for (kind, stage, shift), blk in zip(cfg.layout, spec.params["blocks"]):
        if kind == "block":
            stage_blocks.setdefault((stage, shift > 0), blk)

    grid = cfg.img_size // cfg.patch_size
    print(f"# {args.model} fam={args.fam} batch={B} "
          f"backend={jax.default_backend()} fast_exp={cfg.fast_exp}",
          flush=True)
    for stage_s in args.stages.split(","):
        stage = int(stage_s)
        dim = int(cfg.embed_dim * 2 ** stage)
        heads = cfg.stage_heads[stage]
        res = grid // (2 ** stage)
        ws = min(cfg.window_size, res)
        n = ws * ws
        nw = (res // ws) ** 2
        blk = stage_blocks.get((stage, False))
        if blk is None:
            continue
        xw = jnp.asarray(rng.integers(-100, 100, size=(B * nw, n, dim))
                         .astype(np.int16))
        n_blocks = cfg.depths[stage]
        for wt in [int(v) for v in args.win_tiles.split(",")]:
            for abl in args.ablations.split(","):
                abl_k = abl.replace("+", ",")

                def step(x, blk=blk, heads=heads, nw=nw, wt=wt, abl_k=abl_k):
                    return pblk.swin_attn_block_p(
                        x, ln_bias=blk["ln1_bias_int"], s_ln=blk["s_ln1"],
                        m_ln=blk["m_ln1"], ln_shift=blk["ln1_shift"],
                        qkv_w=blk["qkv_w"], qkv_b=blk["qkv_b"],
                        m_qkv=blk["m_qkv"], m_attn=blk["m_attn"],
                        m_attn2=blk["m_attn2"], s_attn=blk["s_attn"],
                        rel_addend=blk["rel_bias_addend"], mask_addend=None,
                        m_av=blk["m_av"], proj_w=blk["proj_w"],
                        proj_b=blk["proj_b"], m_proj=blk["m_proj"],
                        m_res_x=blk["m_res1_x"], m_res_id=blk["m_res1_id"],
                        num_heads=heads, n_windows=nw,
                        ln_base=cfg.base_type("ln"),
                        sm_base=cfg.base_type("softmax"),
                        s_exp_act=blk.get("s_exp_act"),
                        sm_bit=cfg.bitwidths.softmax,
                        fast_exp=cfg.fast_exp, fast_poly=cfg.fast_poly,
                        win_tile=wt, ablate=abl_k)

                try:
                    t = time_inloop(step, xw, n_iters=args.iters,
                                    n_timings=3)
                    rec = {"stage": stage, "dim": dim, "heads": heads,
                           "nw_total": B * nw, "win_tile": wt, "ablate": abl,
                           "us_per_call": round(t * 1e6, 1),
                           "ms_per_model": round(t * 1e3 * n_blocks, 3)}
                except Exception as exc:  # noqa: BLE001
                    rec = {"stage": stage, "win_tile": wt, "ablate": abl,
                           "error": repr(exc)[:200]}
                print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
