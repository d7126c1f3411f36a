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
]


def bench_config(cfg, batch, iters):
    import jax
    import jax.numpy as jnp

    from ivit_tpu.models import str2model
    from ivit_tpu.models.vit_float import FLOAT_ARCHS, float_model
    from ivit_tpu.utils.benchmarking import time_dispatch

    is_swin = cfg["model"].startswith("swin")
    kwargs = dict(gelu_type=cfg["gelu"], softmax_type=cfg["softmax"],
                  layernorm_type=cfg["ln"])
    if is_swin:
        kwargs["drop_path_rate"] = 0.0
    model = str2model(cfg["model"])(**kwargs)
    rng = np.random.default_rng(0)
    x_cal = jnp.asarray(rng.normal(size=(8, 224, 224, 3)).astype(np.float32))
    variables = jax.jit(lambda a: model.init(
        jax.random.PRNGKey(0), a, running_stat=True))(x_cal)
    _, st = jax.jit(lambda v, a: model.apply(
        v, a, running_stat=True, mutable=["quant_stats"]))(variables, x_cal)
    frozen = {"params": variables["params"],
              "quant_stats": st["quant_stats"]}

    if is_swin:
        from ivit_tpu.engine.swin_int import (freeze_swin_model,
                                              swin_engine_forward)
        spec = freeze_swin_model(model, frozen)
        fwd = jax.jit(lambda p, a: swin_engine_forward(
            type(spec)(spec.config, p), a))
    else:
        from ivit_tpu.engine import freeze_model
        from ivit_tpu.engine.vit_int import engine_forward
        spec = freeze_model(model, frozen)
        fwd = jax.jit(lambda p, a: engine_forward(
            type(spec)(spec.config, p), a))

    # parity spot-check
    sim = np.asarray(jax.jit(lambda v, a: model.apply(
        v, a, running_stat=False))(frozen, x_cal))
    eng = np.asarray(fwd(spec.params, x_cal))
    parity = float(np.abs(sim - eng).max() / max(np.abs(sim).max(), 1e-9))

    x = jnp.asarray(rng.normal(size=(batch, 224, 224, 3)).astype(np.float32))
    t = time_dispatch(lambda a: fwd(spec.params, a), x, iters=iters)

    rec = {"config": cfg["name"], "model": cfg["model"],
           "families": f'{cfg["gelu"]}/{cfg["softmax"]}/{cfg["ln"]}',
           "batch": batch,
           "int8_images_per_sec": round(batch / t, 1),
           "ms_per_batch": round(t * 1e3, 2),
           "sim_engine_rel_err": parity}

    if not is_swin:
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
    args = p.parse_args()

    results = []
    for cfg in CONFIGS:
        if args.only and args.only not in cfg["name"]:
            continue
        batch = args.batch if not cfg["model"].startswith("swin") \
            else min(args.batch, 64)
        try:
            rec = bench_config(cfg, batch, args.iters)
        except Exception as exc:  # noqa: BLE001 - report and continue
            rec = {"config": cfg["name"], "error": repr(exc)[:400]}
        print(json.dumps(rec), flush=True)
        results.append(rec)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
