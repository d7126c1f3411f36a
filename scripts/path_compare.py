#!/usr/bin/env python
"""Compare engine execution paths on the TPU: fused blocks vs hybrid
(XLA GEMMs + standalone nonlinearity kernels) vs pure XLA, plus the bf16
float baseline.  Whole-model time_dispatch per the tunnel-timing doctrine.

Usage: python scripts/path_compare.py [--model deit_tiny_patch16_224]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="deit_tiny_patch16_224")
    ap.add_argument("--fam", default="ivit")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--modes", default="blocks,ops,xla")
    ap.add_argument("--check", action="store_true",
                    help="assert all paths produce identical logits")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ivit_tpu.engine.vit_int import engine_forward
    from ivit_tpu.utils.benchmarking import time_dispatch
    from scripts.kernel_microbench import build_spec

    spec = build_spec(args.model, fam=(args.fam,) * 3)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(args.batch, 224, 224, 3))
                    .astype(np.float32))

    mode_arg = {"blocks": None, "ops": "ops", "xla": False}
    outs = {}
    for mode in args.modes.split(","):
        fwd = jax.jit(lambda imgs, p=mode_arg[mode]: engine_forward(
            spec, imgs, pallas=p))
        t = time_dispatch(fwd, x, iters=args.iters)
        outs[mode] = np.asarray(fwd(x))
        print(json.dumps({"mode": mode, "ms_per_batch": round(t * 1e3, 2),
                          "images_per_sec": round(args.batch / t, 1)}),
              flush=True)
    if args.check and len(outs) > 1:
        base = args.modes.split(",")[0]
        for mode, o in outs.items():
            eq = bool(np.array_equal(outs[base], o))
            print(json.dumps({"mode": mode, "bitwise_equal_vs_" + base: eq}),
                  flush=True)


if __name__ == "__main__":
    main()
