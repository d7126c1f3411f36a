#!/usr/bin/env python
"""Per-kernel Mosaic hardware validation (VERDICT round-1 weak #3).

For each engine config below, compares THREE executions bitwise:
unfused XLA engine, fused Pallas kernels under the interpreter, and fused
Pallas kernels compiled by Mosaic on the current backend.  Run on the real
TPU; covers both exp-quotient forms (fast_exp on/off — the rdiv
construction's scalar bitcasts and the divide-free floor_div_int are the
open Mosaic questions) and the INT16-softmax kernels (IVIT_INT16_KERNELS
gate).  Exit 0 = every case bit-identical.
"""

import dataclasses
import os
import sys

sys.path.insert(0, ".")

if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def build_vit(rng, sm_bit=8, **fam):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ivit_tpu.engine import freeze_model
    from ivit_tpu.models import BitWidths, VisionTransformer

    model = VisionTransformer(
        img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=2,
        num_classes=10,
        bitwidths=BitWidths.from_spec(f"8,8,8,8,{sm_bit},8,8,8"), **fam)
    x0 = jnp.asarray(rng.normal(size=(4, 64, 64, 3)).astype(np.float32))
    variables = jax.jit(lambda a: model.init(
        jax.random.PRNGKey(0), a, running_stat=True))(x0)
    qs = variables["quant_stats"]
    calib = jax.jit(lambda v, a: model.apply(
        v, a, running_stat=True, mutable=["quant_stats"]))
    for _ in range(2):
        xb = jnp.asarray(rng.normal(size=(4, 64, 64, 3)).astype(np.float32))
        _, st = calib({"params": variables["params"], "quant_stats": qs}, xb)
        qs = st["quant_stats"]
    spec = freeze_model(model, {"params": variables["params"],
                                "quant_stats": qs})
    from ivit_tpu.engine.vit_int import engine_forward
    return spec, engine_forward


def build_swin(rng):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ivit_tpu.engine.swin_int import freeze_swin_model, swin_engine_forward
    from ivit_tpu.models.swin import SwinTransformer

    model = SwinTransformer(
        img_size=56, patch_size=4, embed_dim=32, depths=(2, 2),
        num_heads=(2, 4), window_size=7, num_classes=10, drop_path_rate=0.0,
        gelu_type="ivit", softmax_type="ivit", layernorm_type="ivit")
    x0 = jnp.asarray(rng.normal(size=(2, 56, 56, 3)).astype(np.float32))
    variables = jax.jit(lambda a: model.init(
        jax.random.PRNGKey(0), a, running_stat=True))(x0)
    qs = variables["quant_stats"]
    calib = jax.jit(lambda v, a: model.apply(
        v, a, running_stat=True, mutable=["quant_stats"]))
    for _ in range(3):
        xb = jnp.asarray(rng.normal(size=(2, 56, 56, 3)).astype(np.float32))
        _, st = calib({"params": variables["params"], "quant_stats": qs}, xb)
        qs = st["quant_stats"]
    spec = freeze_swin_model(model, {"params": variables["params"],
                                     "quant_stats": qs})
    return spec, swin_engine_forward


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import ivit_tpu.ops.pallas as ppkg

    on_tpu = jax.default_backend() == "tpu"
    print(f"backend: {jax.default_backend()}"
          + ("" if on_tpu else " (no Mosaic here: 'mosaic' leg runs the "
             "interpreter; hardware answers need the TPU)"), flush=True)
    rng = np.random.default_rng(0)
    failures = 0

    CASES = []
    # fused block kernels + standalone mixed-family kernels, both quotient
    # forms; ibert families cover _ibert_int_exp/_ibert_gelu in-kernel
    for fam in (("ivit", "ivit", "ivit"), ("ibert", "ibert", "ibert"),
                ("ibert", "ivit", "ivit")):
        CASES.append(("vit_" + "_".join(fam), "vit", fam, 8))
    CASES.append(("vit_ivit_int16sm", "vit", ("ivit", "ivit", "ivit"), 16))
    CASES.append(("vit_ibert_int16sm", "vit", ("ibert", "ibert", "ibert"), 16))
    CASES.append(("swin_ivit", "swin", None, 8))

    for cname, kind, fam, sm_bit in CASES:
        if sm_bit > 8:
            os.environ["IVIT_INT16_KERNELS"] = "1"
        else:
            os.environ.pop("IVIT_INT16_KERNELS", None)
        if kind == "swin":
            spec, fwd = build_swin(rng)
            img = spec.config.img_size
        else:
            spec, fwd = build_vit(rng, sm_bit=sm_bit, gelu_type=fam[0],
                                  softmax_type=fam[1], layernorm_type=fam[2])
            img = 64
        x = jnp.asarray(rng.normal(size=(4, img, img, 3)).astype(np.float32))
        for fast in (False, True):
            cfg = dataclasses.replace(spec.config, fast_exp=fast)
            sp = type(spec)(cfg, spec.params)
            base = np.asarray(jax.jit(
                lambda a, sp=sp: fwd(sp, a, pallas=False))(x))
            if not on_tpu:
                ppkg.FORCE_INTERPRET = True
            try:
                mosaic = np.asarray(jax.jit(
                    lambda a, sp=sp: fwd(sp, a, pallas=True))(x))
            finally:
                ppkg.FORCE_INTERPRET = False
            ppkg.FORCE_INTERPRET = True
            try:
                interp = np.asarray(fwd(sp, x, pallas=True))
            finally:
                ppkg.FORCE_INTERPRET = False
            d_m = int((mosaic != base).sum())
            d_i = int((interp != base).sum())
            ok = d_m == 0 and d_i == 0
            failures += 0 if ok else 1
            print(f"{'PASS' if ok else 'FAIL'} {cname} fast_exp={fast}: "
                  f"mosaic-vs-unfused {d_m} bits, interp-vs-unfused {d_i} "
                  f"bits (max {np.abs(mosaic - base).max():g})", flush=True)

    print(f"{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
