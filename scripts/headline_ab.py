#!/usr/bin/env python
"""Headline A/B: time the DeiT-S int8 fused engine under one env-knob
setting (knobs are read at trace time, so the driver shell loop runs one
process per setting).  Prints one JSON line compatible with bench.py's
methodology (same model, batch, time_dispatch).

Usage: IVIT_HOIST_LN=0 IVIT_PAD_KV=1 python scripts/headline_ab.py \
           [--model deit_small_patch16_224] [--fam ibert] [--batch 256]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="deit_small_patch16_224")
    ap.add_argument("--fam", default="ibert")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--pallas", default="blocks",
                    choices=["blocks", "xla", "ops"])
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
    p = {"blocks": True, "xla": False, "ops": "ops"}[args.pallas]
    fwd = jax.jit(lambda imgs: engine_forward(spec, imgs, pallas=p))
    t = time_dispatch(fwd, x, iters=args.iters)
    print(json.dumps({
        "model": args.model, "fam": args.fam, "pallas": args.pallas,
        "env": {k: v for k, v in os.environ.items()
                if k.startswith("IVIT_")},
        "ms_per_batch": round(t * 1e3, 2),
        "images_per_sec": round(args.batch / t, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
