#!/usr/bin/env python
"""Swin engine execution-path A/B on the TPU (VERDICT r2 item 6).

Times the Swin integer engine whole-model (time_dispatch, tunnel doctrine)
across fusion variants — fully fused, attention-only, FFN-only, unfused —
plus the bf16 float baseline, and optionally checks all integer paths are
bitwise identical.

Usage: python scripts/swin_path_compare.py [--model swin_tiny_patch4_window7_224]
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
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--modes", default="fused,attn,mlp,unfused,bf16")
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ivit_tpu.engine.swin_int import (freeze_swin_model,
                                          swin_engine_forward)
    from ivit_tpu.models import str2model
    from ivit_tpu.models.chunked import swin_chunked_apply
    from ivit_tpu.utils.benchmarking import time_dispatch
    from ivit_tpu.utils.hostdev import host_init

    rng = np.random.default_rng(0)
    model = str2model(args.model)(gelu_type=args.fam, softmax_type=args.fam,
                                  layernorm_type=args.fam, drop_path_rate=0.0)
    x_cal = jnp.asarray(rng.normal(size=(8, 224, 224, 3)).astype(np.float32))
    with host_init():
        variables = jax.jit(lambda a: model.init(
            jax.random.PRNGKey(0), a, running_stat=True))(x_cal)
    variables = jax.device_put(variables)
    _, st = swin_chunked_apply(model, variables, x_cal, running_stat=True)
    spec = freeze_swin_model(model, {"params": variables["params"],
                                     "quant_stats": st["quant_stats"]})

    x = jnp.asarray(rng.normal(size=(args.batch, 224, 224, 3))
                    .astype(np.float32))
    variants = {
        # "fused"/"mlp" pad non-lane-aligned stages by default (the measured
        # winner next to fused attention); *_nopad restrict FFN fusion to
        # lane-aligned stages for A/Bs
        "fused": (None, ("attn", "mlp")),
        "fused_nopad": (None, ("attn", "mlp", "mlp_nopad")),
        "attn": (None, ("attn",)),
        "mlp": (None, ("mlp",)),
        "mlp_nopad": (None, ("mlp", "mlp_nopad")),
        "unfused": (False, ()),
        # per-stage mixes (VERDICT r4 item 3): fused only on the listed
        # stages, unfused elsewhere; swin_engine_forward stage_paths
        "stages23": (None, ("attn", "mlp"), (False, False, True, True)),
        "stages123": (None, ("attn", "mlp"), (False, True, True, True)),
        "stages3": (None, ("attn", "mlp"), (False, False, False, True)),
        "dispatch": ("dispatch", ()),
    }
    outs = {}
    for mode in args.modes.split(","):
        if mode == "bf16":
            from ivit_tpu.models.vit_float import float_swin_model
            fm = float_swin_model(args.model)
            fvars = jax.jit(lambda a: fm.init(jax.random.PRNGKey(0), a))(x_cal)
            ff = jax.jit(lambda v, a: fm.apply(v, a))
            np.asarray(ff(fvars, x_cal))
            t = time_dispatch(lambda a: ff(fvars, a), x, iters=args.iters)
        else:
            v = variants[mode]
            if v[0] == "dispatch":
                from ivit_tpu.engine import dispatch as _dispatch
                stages, rep = _dispatch.swin_stage_choice(spec.config)
                print(json.dumps({"mode": mode, "stage_paths": list(stages),
                                  "evidence": rep}), flush=True)
                pallas, parts = True, ("attn", "mlp")
            else:
                pallas, parts = v[0], v[1]
                stages = v[2] if len(v) > 2 else None
            fwd = jax.jit(lambda p, a, pl=pallas, fp=parts, sp=stages:
                          swin_engine_forward(type(spec)(spec.config, p), a,
                                              pallas=pl, fuse_parts=fp,
                                              stage_paths=sp))
            t = time_dispatch(lambda a: fwd(spec.params, a), x,
                              iters=args.iters)
            outs[mode] = np.asarray(fwd(spec.params, x))
        print(json.dumps({"mode": mode, "ms_per_batch": round(t * 1e3, 2),
                          "images_per_sec": round(args.batch / t, 1)}),
              flush=True)
    if args.check and len(outs) > 1:
        base = next(iter(outs))
        for mode, o in outs.items():
            print(json.dumps({"mode": mode,
                              "bitwise_equal_vs_" + base:
                                  bool(np.array_equal(outs[base], o))}),
                  flush=True)


if __name__ == "__main__":
    main()
