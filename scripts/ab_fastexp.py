#!/usr/bin/env python
"""A/B the divide-free exp-chain quotient (EngineConfig.fast_exp).

Measures engine img/s with fast_exp on vs off (same spec, one flag) for
DeiT-T ivit — the config VERDICT flagged as losing to bf16, whose profile
showed the integer exp chains dominating VPU time.  Run on the real TPU.

    python scripts/ab_fastexp.py [--model deit_tiny_patch16_224]
                                 [--batch 256] [--pallas/--no-pallas]
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, ".")

if os.environ.get("JAX_PLATFORMS"):
    # the axon plugin ignores the env var; apply it via config (CLAUDE.md)
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="deit_tiny_patch16_224")
    p.add_argument("--family", default="ivit")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ivit_tpu.engine import freeze_model
    from ivit_tpu.engine.vit_int import engine_forward
    from ivit_tpu.models import str2model
    from ivit_tpu.utils.benchmarking import time_dispatch

    rng = np.random.default_rng(0)
    model = str2model(args.model)(gelu_type=args.family,
                                  softmax_type=args.family,
                                  layernorm_type=args.family)
    x0 = jnp.asarray(rng.normal(size=(8, 224, 224, 3)).astype(np.float32))
    variables = jax.jit(lambda a: model.init(
        jax.random.PRNGKey(0), a, running_stat=True))(x0)
    _, st = jax.jit(lambda v, a: model.apply(
        v, a, running_stat=True, mutable=["quant_stats"]))(variables, x0)
    spec = freeze_model(model, {"params": variables["params"],
                                "quant_stats": st["quant_stats"]})
    pallas = False if args.no_pallas else None
    x = jnp.asarray(rng.normal(
        size=(args.batch, 224, 224, 3)).astype(np.float32))

    res = {"model": args.model, "family": args.family, "batch": args.batch,
           "gate_fast_exp": bool(spec.config.fast_exp)}
    outs = {}
    for fast in (False, True):
        cfg = dataclasses.replace(spec.config, fast_exp=fast)
        sp = type(spec)(cfg, spec.params)
        f = jax.jit(lambda p_, a: engine_forward(
            type(spec)(cfg, p_), a, pallas=pallas))
        sec = time_dispatch(lambda: f(spec.params, x), iters=args.iters)
        res[f"images_per_sec_fast_{fast}"] = args.batch / sec
        outs[fast] = np.asarray(f(spec.params, x))
    res["speedup_fast_exp"] = (res["images_per_sec_fast_True"]
                               / res["images_per_sec_fast_False"])
    res["bitwise_equal"] = bool((outs[True] == outs[False]).all())
    line = json.dumps(res)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
