#!/usr/bin/env python
"""Bisect the axon compile-helper failure by graph size (compile-only).

The tunnel's remote-compile helper SIGSEGVs on full-model graphs but
compiles kernel-sized ones; this probes jit *compilation* (AOT, chipless —
no device contention) of the DeiT integer engine at increasing depth.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depths", default="1,2,4,8,12")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--pallas", default="auto",
                    help="auto|true|false fused-kernel path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ivit_tpu.engine import freeze_model
    from ivit_tpu.engine.vit_int import engine_forward
    from ivit_tpu.models import BitWidths, VisionTransformer

    pallas = {"auto": None, "true": True, "false": False}[args.pallas]
    rng = np.random.default_rng(0)
    for depth in [int(d) for d in args.depths.split(",")]:
        model = VisionTransformer(
            img_size=224, patch_size=16, embed_dim=192, depth=depth,
            num_heads=3, num_classes=1000,
            bitwidths=BitWidths.from_spec("8"),
            gelu_type="ivit", softmax_type="ivit", layernorm_type="ivit")
        x = jnp.asarray(rng.normal(
            size=(args.batch, 224, 224, 3)).astype(np.float32))
        from ivit_tpu.utils.hostdev import host_init
        with host_init():
            variables = jax.jit(lambda a: model.init(
                jax.random.PRNGKey(0), a, running_stat=True))(x)
            _, st = jax.jit(lambda v, a: model.apply(
                v, a, running_stat=True, mutable=["quant_stats"]))(
                    variables, x)
            spec = freeze_model(model, {"params": variables["params"],
                                        "quant_stats": st["quant_stats"]})
        fn = jax.jit(lambda prm, a: engine_forward(
            type(spec)(spec.config, prm), a, pallas=pallas))
        t0 = time.time()
        try:
            lowered = fn.lower(spec.params, x)
            nbytes = len(lowered.as_text())
            comp = lowered.compile()
            del comp
            print(f"depth={depth:2d} mlir={nbytes/1e6:.2f}MB "
                  f"COMPILE OK in {time.time()-t0:.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"depth={depth:2d} COMPILE FAIL in {time.time()-t0:.1f}s: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
