#!/usr/bin/env python
"""Multi-device scaling-efficiency benchmark (BASELINE target: >=0.85 from
1 chip to N hosts on DeiT-S INT8 serving).

Measures engine img/s at data-parallel widths 1..N over the available
devices and reports efficiency vs linear scaling.  On the hosted single-TPU
environment this exercises the sharded program end-to-end on a virtual CPU
mesh (`JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8`);
on a real pod slice it measures actual ICI scaling.  Multi-host: launch one
process per host with ``jax.distributed.initialize()`` (see --distributed).
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="deit_small_patch16_224")
    p.add_argument("--family", default="ibert")
    p.add_argument("--per-device-batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--widths", type=int, nargs="+", default=None)
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize()")
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--mode", choices=["weak", "strong"], default="weak",
                   help="weak (default): fixed per-device batch, efficiency "
                        "= ips / (ips_1 * N) <= 1.0 — the BASELINE >=0.85 "
                        "target's form.  On the shared-core virtual CPU "
                        "mesh total throughput cannot grow N-fold, so the "
                        "artifact reports throughput_gain_vs_1dev alongside "
                        "to keep the curve meaningful there.  strong: "
                        "fixed TOTAL batch (legacy; isolates partitioning "
                        "overhead only).")
    p.add_argument("--serving", action="store_true",
                   help="also measure through ServingEngine (continuous "
                        "batching, futures) at each width")
    p.add_argument("--out", default=None, help="write JSON artifact here")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args.distributed:
        jax.distributed.initialize()

    from ivit_tpu.models import str2model
    from ivit_tpu.parallel import batch_sharding, make_mesh, replicated
    from ivit_tpu.utils.benchmarking import time_dispatch

    ndev = len(jax.devices())
    widths = args.widths or [w for w in (1, 2, 4, 8, 16, 32) if w <= ndev]
    pallas = False if args.no_pallas else None
    mode = args.mode
    shared_cores = jax.default_backend() != "tpu"

    is_swin = args.model.startswith("swin")
    kw = dict(gelu_type=args.family, softmax_type=args.family,
              layernorm_type=args.family)
    if is_swin:
        kw["drop_path_rate"] = 0.0
    model = str2model(args.model)(**kw)
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
        engine_forward = swin_engine_forward
        EngineSpec = type(spec)
    else:
        from ivit_tpu.engine import EngineSpec, freeze_model
        from ivit_tpu.engine.vit_int import engine_forward
        spec = freeze_model(model, frozen)

    results = []
    base_ips = None
    for w in widths:
        mesh = make_mesh(dp=w, tp=1, devices=jax.devices()[:w])
        bsz = (args.per_device_batch * w if mode == "weak"
               else args.per_device_batch * max(widths))
        x = jnp.asarray(rng.normal(
            size=(bsz, 224, 224, 3)).astype(np.float32))
        x = jax.device_put(x, batch_sharding(mesh))
        params = jax.device_put(spec.params, replicated(mesh))
        fwd = jax.jit(
            lambda pp, a: engine_forward(EngineSpec(spec.config, pp), a,
                                         pallas=pallas),
            in_shardings=(replicated(mesh), batch_sharding(mesh)),
            out_shardings=batch_sharding(mesh))
        t = time_dispatch(lambda a: fwd(params, a), x, iters=args.iters)
        ips = bsz / t
        if base_ips is None:
            base_ips = ips
        # weak: perfect = w-fold throughput growth (efficiency <= 1.0, the
        # BASELINE >=0.85 form).  strong (legacy): perfect = unchanged
        # throughput on the same total batch.
        eff = ips / (base_ips * w) if mode == "weak" else ips / base_ips
        rec = {"devices": w, "batch": bsz,
               "images_per_sec": round(ips, 1),
               "scaling_efficiency": round(eff, 3)}
        if mode == "weak" and shared_cores:
            # virtual mesh on one machine: N 'devices' share the same
            # silicon, so total throughput cannot grow N-fold — report the
            # raw gain over 1 device so the curve stays interpretable
            # (ICI efficiency proper requires real chips)
            rec["throughput_gain_vs_1dev"] = round(ips / base_ips, 3)
        if args.serving:
            from ivit_tpu.engine.serving import ServingEngine
            with ServingEngine(spec, batch_size=bsz, max_wait_ms=2,
                               mesh=mesh, pallas=pallas) as srv:
                imgs = [np.asarray(rng.normal(size=(224, 224, 3)),
                                   np.float32) for _ in range(bsz)]
                for f in [srv.submit(im) for im in imgs]:   # warm compile
                    f.result()
                import time as _time
                t0 = _time.perf_counter()
                n_reqs = 2 * bsz
                futs = [srv.submit(imgs[i % bsz]) for i in range(n_reqs)]
                for f in futs:
                    f.result()
                srv_ips = n_reqs / (_time.perf_counter() - t0)
            rec["serving_images_per_sec"] = round(srv_ips, 1)
            rec["serving_fraction_of_raw"] = round(srv_ips / ips, 3)
        results.append(rec)
        print(f"dp={w:3d}: {ips:10.1f} img/s  efficiency {eff:.3f}",
              file=sys.stderr)
    artifact = {"mode": mode,
                "backend": jax.default_backend(),
                "model": args.model, "family": args.family,
                "note": ("weak scaling, fixed per-device batch: perfect = "
                         "1.0 (linear in devices)."
                         + (" Virtual shared-core mesh: total throughput "
                            "cannot grow N-fold (same silicon) — judge the "
                            "curve by throughput_gain_vs_1dev; real ICI "
                            "efficiency needs real chips." if shared_cores else "")
                         if mode == "weak" else
                         "strong scaling (legacy): fixed total batch, "
                         "perfect = 1.0 = no partitioning overhead"),
                "results": results}
    print(json.dumps(artifact, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=2)


if __name__ == "__main__":
    main()
