#!/usr/bin/env python
"""Benchmark the full BASELINE config matrix on the current device.

Configs (BASELINE.json):
  DeiT-T ivit | DeiT-S ibert | ViT-B mixed ivit/ibert | Swin-T ivit.
For each: integer-engine throughput (best batch), sim-vs-engine parity, and
the same-architecture bf16 float throughput.  Writes BENCH_MATRIX.json.
"""

import argparse
import json
import os
import sys

if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
sys.path.insert(0, ".")

import numpy as np

CONFIGS = [
    {"name": "deit_tiny_ivit", "model": "deit_tiny_patch16_224",
     "gelu": "ivit", "softmax": "ivit", "ln": "ivit"},
    {"name": "deit_small_ibert", "model": "deit_small_patch16_224",
     "gelu": "ibert", "softmax": "ibert", "ln": "ibert"},
    {"name": "vit_base_mixed", "model": "vit_base_patch16_224",
     "gelu": "ivit", "softmax": "ibert", "ln": "ibert"},
    {"name": "swin_tiny_ivit", "model": "swin_tiny_patch4_window7_224",
     "gelu": "ivit", "softmax": "ivit", "ln": "ivit"},
    # ppoly throughput row (VERDICT r3 item 9 / missing #3): the fitted
    # piecewise-poly family at inference, fused (reference sweep analogue:
    # scripts/sweep_ppoly_inference.sh)
    {"name": "deit_small_ppoly", "model": "deit_small_patch16_224",
     "gelu": "ppoly_backend_ibert", "softmax": "ppoly_backend_ibert",
     "ln": "ibert"},
]


def vit_gemm_sites(ec, batch):
    """Per-site int-op counts (2*MACs) for the ViT engine at ``batch``.

    Sites match the fused Pallas kernels by their explicit trace names; the
    unfused/XLA path charges all dot fusions to one aggregate site.
    """
    C, H, L = ec.embed_dim, ec.num_heads, ec.depth
    Dh = C // H
    F = int(ec.mlp_ratio * C)
    n_tok = (ec.img_size // ec.patch_size) ** 2
    N = n_tok + 1
    Np = ((N + 7) // 8) * 8          # fused kernels pad tokens
    B = batch
    patch = 2 * B * n_tok * (ec.patch_size**2 * 3) * C
    qkv = 2 * B * Np * C * 3 * C
    scores = 2 * B * H * Np * Np * Dh
    ctx = scores
    proj = 2 * B * Np * C * C
    fc1 = 2 * B * Np * C * F
    fc2 = fc1
    head = 2 * B * C * ec.num_classes
    attn_blk = (qkv + scores + ctx + proj) * L
    mlp_blk = (fc1 + fc2) * L
    total = patch + attn_blk + mlp_blk + head
    return {
        "attn_block_kernel": (["attn_block_kernel"], attn_blk),
        "mlp_block_kernel": (["mlp_block_kernel"], mlp_blk),
        "xla_gemms": (["dot", "fusion", "convolution"], patch + head),
    }, total


def swin_gemm_sites(ec, batch):
    """Per-site int-op counts for the Swin engine at ``batch``.

    Window attention fuses into ``swin_attn_block_kernel``; lane-aligned
    FFN halves into ``mlp_block_kernel``; everything else (patch embed,
    merges, non-aligned FFNs, head) runs as XLA dots.
    """
    B = batch
    grid = ec.img_size // ec.patch_size
    ws = ec.window_size
    attn_ops = 0
    mlp_fused = 0
    mlp_unfused = 0
    xla = 2 * B * grid * grid * (ec.patch_size**2 * 3) * ec.embed_dim
    for i, depth in enumerate(ec.depths):
        dim = ec.embed_dim * 2**i
        res = grid // 2**i
        w = min(ws, res)
        n = w * w
        nw = (res // w) ** 2
        heads = ec.stage_heads[i]
        hd = dim // heads
        per_blk_attn = (2 * B * nw * n * dim * 3 * dim          # qkv
                        + 2 * B * nw * heads * n * n * hd * 2   # scores+ctx
                        + 2 * B * nw * n * dim * dim)           # proj
        per_blk_mlp = 2 * 2 * B * res * res * dim * int(ec.mlp_ratio * dim)
        attn_ops += depth * per_blk_attn
        if dim % 128 == 0:
            mlp_fused += depth * per_blk_mlp
        else:
            mlp_unfused += depth * per_blk_mlp
        if i < len(ec.depths) - 1:
            xla += 2 * B * (res // 2) ** 2 * (4 * dim) * (2 * dim)  # merge
    xla += 2 * B * ec.embed_dim * 2**(len(ec.depths) - 1) * ec.num_classes
    total = attn_ops + mlp_fused + mlp_unfused + xla
    return {
        "swin_attn_block_kernel": (["swin_attn_block_kernel"], attn_ops),
        "mlp_block_kernel": (["mlp_block_kernel"], mlp_fused),
        "xla_gemms": (["dot", "fusion", "convolution"],
                      xla + mlp_unfused),
    }, total


def bench_config(cfg, batch, iters, sol=False):
    import jax
    import jax.numpy as jnp

    from ivit_tpu.models import str2model
    from ivit_tpu.models.vit_float import FLOAT_ARCHS, float_model
    from ivit_tpu.utils.benchmarking import (chip_peaks, profile_device_ops,
                                             sol_table, time_dispatch)

    is_swin = cfg["model"].startswith("swin")
    kwargs = dict(gelu_type=cfg["gelu"], softmax_type=cfg["softmax"],
                  layernorm_type=cfg["ln"])
    if is_swin:
        kwargs["drop_path_rate"] = 0.0
    model = str2model(cfg["model"])(**kwargs)
    rng = np.random.default_rng(0)
    x_cal = jnp.asarray(rng.normal(size=(8, 224, 224, 3)).astype(np.float32))
    # init on CPU (host-side prep; its RNG graph intermittently SIGSEGVs
    # the axon compile helper) + chunked calibration/sim graphs — see
    # ivit_tpu/models/chunked.py (bit-identical to model.apply)
    from ivit_tpu.models.chunked import scan_apply, swin_chunked_apply
    from ivit_tpu.utils.hostdev import host_init
    with host_init():
        variables = jax.jit(lambda a: model.init(
            jax.random.PRNGKey(0), a, running_stat=True))(x_cal)
    variables = jax.device_put(variables)
    if is_swin:
        _, st = swin_chunked_apply(model, variables, x_cal,
                                   running_stat=True)
    else:
        _, st = jax.jit(lambda v, a: scan_apply(
            model, v, a, running_stat=True))(variables, x_cal)
    frozen = {"params": variables["params"],
              "quant_stats": st["quant_stats"]}
    if any("ppoly" in cfg[k] for k in ("gelu", "softmax")):
        # host-side piecewise-poly fit (freeze refuses unfitted tables)
        from ivit_tpu.train.ppoly_fit import fit_ppoly_tables
        frozen = fit_ppoly_tables(model, frozen)

    if is_swin:
        from ivit_tpu.engine.swin_int import (freeze_swin_model,
                                              swin_engine_forward,
                                              swin_fusion_report)
        spec = freeze_swin_model(model, frozen)
        # per-stage dispatch (engine/dispatch.swin_stage_choice): each stage
        # routes fused/unfused independently; provenance recorded per stage
        from ivit_tpu.engine.dispatch import swin_stage_choice
        stage_paths, path_choice = swin_stage_choice(spec.config)
        fusion = swin_fusion_report(spec.config, pallas=True,
                                    stage_paths=stage_paths)
        fusion["path_choice"] = path_choice
        fwd = jax.jit(lambda p, a: swin_engine_forward(
            type(spec)(spec.config, p), a, pallas=True,
            stage_paths=stage_paths))
    else:
        from ivit_tpu.engine import freeze_model
        from ivit_tpu.engine.vit_int import engine_forward, fusion_report
        spec = freeze_model(model, frozen)
        # cost-aware path dispatch (engine/dispatch.py): the matrix rows
        # always use the measured-best path, and record the choice
        from ivit_tpu.engine.dispatch import static_choice
        use_fused, path_choice = static_choice(spec.config)
        fusion = fusion_report(spec.config, pallas=use_fused)
        fusion["path_choice"] = path_choice
        fwd = jax.jit(lambda p, a: engine_forward(
            type(spec)(spec.config, p), a, pallas=use_fused))

    # parity spot-check (chunked sim == model.apply, tests/test_chunked.py)
    if is_swin:
        sim = np.asarray(swin_chunked_apply(model, frozen, x_cal))
    else:
        sim = np.asarray(jax.jit(lambda v, a: scan_apply(
            model, v, a))(frozen, x_cal))
    eng = np.asarray(fwd(spec.params, x_cal))
    parity = float(np.abs(sim - eng).max() / max(np.abs(sim).max(), 1e-9))

    x = jnp.asarray(rng.normal(size=(batch, 224, 224, 3)).astype(np.float32))
    t = time_dispatch(lambda a: fwd(spec.params, a), x, iters=iters)

    rec = {"config": cfg["name"], "model": cfg["model"],
           "families": f'{cfg["gelu"]}/{cfg["softmax"]}/{cfg["ln"]}',
           "batch": batch,
           "int8_images_per_sec": round(batch / t, 1),
           "ms_per_batch": round(t * 1e3, 2),
           "sim_engine_rel_err": parity,
           "fusion": fusion}

    if sol:
        # VERDICT item 2: profiler-trace-derived per-GEMM speed of light
        ops = profile_device_ops(lambda a: fwd(spec.params, a), x, iters=5)
        peak = chip_peaks()["int8_tops"]
        device_us = sum(r["us_per_iter"] for r in ops.values())
        if device_us <= 0:
            rec["sol"] = {"error": "no device ops in trace "
                                   "(profiler device plane is TPU-only)"}
        else:
            sites, total_ops = (swin_gemm_sites if is_swin
                                else vit_gemm_sites)(spec.config, batch)
            table = sol_table(ops, sites, peak)
            table["model_total"] = {
                "us": round(device_us, 1),
                "sol": round(total_ops / (device_us * 1e-6) / peak, 3)}
            rec["sol"] = table
        rec["top_device_ops"] = {
            k: round(v["us_per_iter"], 1) for k, v in list(ops.items())[:8]}

    if is_swin:
        from ivit_tpu.models.vit_float import float_swin_model
        fm = float_swin_model(cfg["model"])
    else:
        fm = float_model(cfg["model"])
    fvars = jax.jit(lambda a: fm.init(jax.random.PRNGKey(0), a))(x_cal)
    ff = jax.jit(lambda v, a: fm.apply(v, a))
    np.asarray(ff(fvars, x_cal))
    tf = time_dispatch(lambda a: ff(fvars, a), x, iters=iters)
    rec["bf16_images_per_sec"] = round(batch / tf, 1)
    rec["speedup_vs_bf16"] = round(tf / t, 3)
    return rec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--out", default="BENCH_MATRIX.json")
    p.add_argument("--only", default=None)
    p.add_argument("--sol", action="store_true", default=None,
                   help="profiler-trace speed-of-light accounting "
                        "(default: on when running on TPU)")
    p.add_argument("--no-sol", dest="sol", action="store_false")
    args = p.parse_args()

    results = []
    for cfg in CONFIGS:
        if args.only and args.only not in cfg["name"]:
            continue
        batch = args.batch if not cfg["model"].startswith("swin") \
            else min(args.batch, 64)
        try:
            if args.sol is None:
                import jax
                args.sol = jax.default_backend() == "tpu"
            rec = bench_config(cfg, batch, args.iters, sol=args.sol)
        except Exception as exc:  # noqa: BLE001 - report and continue
            rec = {"config": cfg["name"], "error": repr(exc)[:400]}
        print(json.dumps(rec), flush=True)
        results.append(rec)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
