#!/usr/bin/env python
"""Per-geometry fused-kernel autotune sweep (VERDICT r4 item 1 — the
reference's Ansor analog, ``TVM_benchmark/evaluate_latency.py:66-72``
spends 50k measured trials here; this harness sweeps the Pallas kernels'
actual degrees of freedom and measures WHOLE-MODEL time_dispatch per the
tunnel-timing doctrine).

Axes swept per config:
  img_tile     images per attention program (grid collapse)
  mlp_tile     token rows per MLP program
  head_pack    heads per MXU score/ctx dot (IVIT_HEAD_PACK)
  hoist_ln     LN placement (IVIT_HOIST_LN)
  pad_kv       k/v pad vs partial-lane stores (IVIT_PAD_KV)

Every config is a fresh jit (env knobs are read at trace time); compile
failures (e.g. Mosaic scoped-VMEM overflow on fat tiles) are recorded as
failed rows, not skipped silently.  One JSON line per config; the winner
feeds engine/dispatch.TUNED with this log as its evidence.

Usage:
  python scripts/autotune.py --model deit_tiny_patch16_224 --fam ivit \
      --img-tiles 2,4,8 --mlp-tiles 256,512 --head-packs 1,2 \
      --hoist 0,1 --pad-kv 0 [--check]
"""

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="deit_tiny_patch16_224")
    ap.add_argument("--fam", default="ivit")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--img-tiles", default="2,4,8")
    ap.add_argument("--mlp-tiles", default="512")
    ap.add_argument("--head-packs", default="2")
    ap.add_argument("--hoist", default="1")
    ap.add_argument("--pad-kv", default="0")
    ap.add_argument("--check", action="store_true",
                    help="assert every config's logits match the unfused "
                         "engine bitwise")
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

    want = None
    if args.check:
        want = np.asarray(jax.jit(
            lambda i: engine_forward(spec, i, pallas=False))(x))

    grid = list(itertools.product(
        [int(v) for v in args.img_tiles.split(",")],
        [int(v) for v in args.mlp_tiles.split(",")],
        [v for v in args.head_packs.split(",")],
        [v for v in args.hoist.split(",")],
        [v for v in args.pad_kv.split(",")]))
    best = None
    for it, mt, hp, ho, pk in grid:
        # an axis value of "d" leaves the in-code default (env unset), so
        # geometry/family gates (_pad_kv, _hoist_ln_on) stay in effect
        for env, val in (("IVIT_HEAD_PACK", hp), ("IVIT_HOIST_LN", ho),
                         ("IVIT_PAD_KV", pk)):
            if val == "d":
                os.environ.pop(env, None)
            else:
                os.environ[env] = val
        row = {"model": args.model, "fam": args.fam, "img_tile": it,
               "mlp_tile": mt, "head_pack": hp, "hoist_ln": ho,
               "pad_kv": pk}
        tune = {"img_tile": it, "mlp_tile": mt}
        try:
            fwd = jax.jit(lambda i, t=tune: engine_forward(
                spec, i, pallas=True, tune=t))
            t = time_dispatch(fwd, x, iters=args.iters)
            row["ms_per_batch"] = round(t * 1e3, 2)
            row["images_per_sec"] = round(args.batch / t, 1)
            if want is not None:
                row["bitwise_equal"] = bool(
                    np.array_equal(want, np.asarray(fwd(x))))
            if best is None or t < best[0]:
                best = (t, row)
        except Exception as exc:  # noqa: BLE001
            row["error"] = repr(exc)[:200]
        print(json.dumps(row), flush=True)
    for k in ("IVIT_HEAD_PACK", "IVIT_HOIST_LN", "IVIT_PAD_KV"):
        os.environ.pop(k, None)
    if best is not None:
        print(json.dumps({"best": best[1]}), flush=True)


if __name__ == "__main__":
    main()
