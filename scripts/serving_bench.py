#!/usr/bin/env python
"""Single-chip TPU serving latency benchmark (VERDICT r3 item 10).

Runs the continuous-batching ServingEngine on the real chip (DeiT-S INT8,
the BASELINE north-star config) at several batch sizes, recording
p50/p95/max request latency and throughput, next to the raw engine's
throughput at the same batch (the batching overhead bound).  Reference
analogue: TVM_benchmark/evaluate_latency.py batch-1 `module.benchmark`.

    python scripts/serving_bench.py --out SERVING_TPU.json
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SERVING_TPU.json")
    ap.add_argument("--model", default="deit_small_patch16_224")
    ap.add_argument("--families", default="ibert")
    ap.add_argument("--requests", type=int, default=2048)
    ap.add_argument("--batches", default="1,8,32,64")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke tests)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ivit_tpu.engine import freeze_model
    from ivit_tpu.engine.serving import ServingEngine
    from ivit_tpu.engine.vit_int import Engine
    from ivit_tpu.models import str2model
    from ivit_tpu.utils.benchmarking import time_dispatch

    fam = args.families
    rng = np.random.default_rng(0)
    model = str2model(args.model)(gelu_type=fam, softmax_type=fam,
                                  layernorm_type=fam)
    x_cal = jnp.asarray(rng.normal(size=(16, 224, 224, 3)).astype(np.float32))
    variables = jax.jit(lambda a: model.init(
        jax.random.PRNGKey(0), a, running_stat=True))(x_cal)
    _, st = jax.jit(lambda v, a: model.apply(
        v, a, running_stat=True, mutable=["quant_stats"]))(variables, x_cal)
    spec = freeze_model(model, {"params": variables["params"],
                                "quant_stats": st["quant_stats"]})

    result = {"model": args.model, "families": fam,
              "backend": jax.default_backend(),
              "device": str(jax.devices()[0]),
              "requests_per_point": args.requests, "points": []}

    # raw engine throughput bound at batch 64 (same path the server jits)
    eng = Engine(spec)
    xb = jnp.asarray(rng.normal(size=(64, 224, 224, 3)).astype(np.float32))
    t = time_dispatch(lambda a: eng(a), xb, iters=20)
    result["raw_engine_b64_img_s"] = round(64 / t, 1)
    result["path_choice"] = eng.fusion.get("path_choice")

    # NOTE (axon environment): every request's pixels cross the TPU tunnel
    # (~tens of MB/s), so serving throughput here is HOST-TRANSFER-bound,
    # not engine-bound — raw_engine_b64_img_s (device-resident input) is
    # the engine's own capability.  On a co-located TPU host the PCIe link
    # is ~3 orders of magnitude faster and the batcher, not the transfer,
    # sets the ceiling.  Recorded as an environment note in the artifact.
    result["transfer_note"] = (
        "axon tunnel: per-request H2D pixel transfer bounds serving "
        "throughput; raw_engine_b64_img_s uses device-resident input")
    imgs = rng.normal(size=(256, 224, 224, 3)).astype(np.float32)
    for bs in [int(b) for b in args.batches.split(",")]:
        with ServingEngine(spec, batch_size=bs, max_wait_ms=2.0,
                           inflight=2) as srv:
            # warm (compile) outside the measured window
            srv.infer(imgs[:bs])
            srv.metrics = type(srv.metrics)()
            # closed loop with bounded concurrency (2 batches in flight):
            # latency then measures service time at sustainable load, not
            # the queueing delay of an instantaneous 2k-request burst
            from collections import deque
            t0 = time.perf_counter()
            outstanding: deque = deque()
            for i in range(args.requests):
                outstanding.append(srv.submit(imgs[i % len(imgs)]))
                while len(outstanding) >= 2 * bs:
                    outstanding.popleft().result()
            while outstanding:
                outstanding.popleft().result()
            wall = time.perf_counter() - t0
            snap = srv.metrics.summary()
        point = {"batch_size": bs, "wall_s": round(wall, 3),
                 "throughput_img_s": round(args.requests / wall, 1), **snap}
        result["points"].append(point)
        print(json.dumps(point), flush=True)

    # --- overload A/B: admission control + deadline vs unbounded queue ---
    # (VERDICT r4 item 8).  Open-loop offered load ABOVE the tunnel-bound
    # service rate: with an unbounded queue, p95 is queue depth (r4:
    # 6.17 s at batch-64 load); with max_queue + deadline_ms, stale
    # requests are shed/rejected and served-request latency stays bounded
    # by the contract.
    bs = 32
    n_offer = 256
    for tag, kw in (("unbounded", {}),
                    ("bounded", {"max_queue": 2 * bs,
                                 "deadline_ms": 2000.0})):
        from ivit_tpu.engine.serving import DeadlineExceeded, QueueFull
        from concurrent.futures import CancelledError
        with ServingEngine(spec, batch_size=bs, max_wait_ms=2.0,
                           inflight=2, **kw) as srv:
            srv.infer(imgs[:bs])
            srv.metrics = type(srv.metrics)()
            futs, rejected = [], 0
            t0 = time.perf_counter()
            for i in range(n_offer):
                try:
                    futs.append(srv.submit(imgs[i % len(imgs)]))
                except QueueFull:
                    rejected += 1
            served = shed = 0
            for f in futs:
                try:
                    f.result()
                    served += 1
                except (DeadlineExceeded, CancelledError):
                    shed += 1
            wall = time.perf_counter() - t0
            snap = srv.metrics.summary()
        point = {"mode": tag, "batch_size": bs, "offered": n_offer,
                 "served": served, "rejected": rejected, "shed": shed,
                 "wall_s": round(wall, 3), **kw, **snap}
        result.setdefault("overload_ab", []).append(point)
        print(json.dumps(point), flush=True)

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
