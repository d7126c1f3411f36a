#!/usr/bin/env python
"""Probe: lane-packed per-row stats for the in-kernel ivit I-LayerNorm.

The Newton-sqrt chain (10 chained rdivs) runs on [R, 1] row-stat arrays —
one valid lane per (8,128) vreg, so every VPU op pays 128x its useful work.
This probe checks whether Mosaic lowers the pack/unpack reshape
([R, 1] -> [R/w, w]) and measures the win at the Swin stage0 attention
geometry, asserting bitwise equality against the unpacked form.
"""

import argparse
import functools
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=448)
    ap.add_argument("--cols", type=int, default=96)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ivit_tpu.ops.pallas.block import _i_layernorm
    from ivit_tpu.utils.benchmarking import time_inloop

    R, C = args.rows, args.cols
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-(2**14), 2**14, size=(R, C))
                    .astype(np.float32))
    bias = jnp.asarray(rng.integers(-1000, 1000, size=(1, C))
                       .astype(np.float32))

    def pack_width(r):
        for w in (128, 64, 32, 16, 8):
            if r % w == 0:
                return w
        return 1

    def kernel_base(x_ref, b_ref, o_ref):
        o_ref[...] = _i_layernorm(x_ref[...], b_ref[...])

    def kernel_packed(x_ref, b_ref, o_ref):
        from ivit_tpu.ops.pallas.nonlinear import (_int_sum, _rdiv, _sq_sum)
        from ivit_tpu.ops.pallas.block import _newton_sqrt, INT32_MAX
        xx = x_ref[...]
        mean = jnp.round(_rdiv(_int_sum(xx), jnp.float32(C)))
        y = xx - mean
        var = _sq_sum(y)                         # [R, 1]
        w = pack_width(R)
        vp = var.reshape(R // w, w)
        std = _newton_sqrt(vp)
        factor = jnp.floor(_rdiv(INT32_MAX, std)).reshape(R, 1)
        o_ref[...] = jnp.floor(y * factor * 0.5) + b_ref[...]

    from ivit_tpu.ops.pallas import _kernel_trace

    GRID = 512
    xg = jnp.asarray(rng.integers(-(2**14), 2**14, size=(GRID * R, C))
                     .astype(np.float32))

    def run(kfn, name):
        def f(a, b):
            with _kernel_trace(False):
                return pl.pallas_call(
                    kfn,
                    out_shape=jax.ShapeDtypeStruct((GRID * R, C), jnp.float32),
                    grid=(GRID,),
                    in_specs=[
                        pl.BlockSpec((R, C), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, C), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((R, C), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                )(a, b)
        try:
            out = np.asarray(jax.jit(f)(xg, bias))
            t = time_inloop(lambda a: f(a, bias), xg,
                            n_iters=args.iters, n_timings=3)
            return out, t
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": repr(exc)[:300]}),
                  flush=True)
            return None, None

    from ivit_tpu.ops.pallas.nonlinear import _int_sum, _rdiv, _sq_sum
    from ivit_tpu.ops.pallas.block import _newton_sqrt, INT32_MAX

    def kernel_nonewton(x_ref, b_ref, o_ref):
        xx = x_ref[...]
        mean = jnp.round(_rdiv(_int_sum(xx), jnp.float32(C)))
        y = xx - mean
        var = _sq_sum(y)
        std = var + 64.0                     # newton ablated
        factor = jnp.floor(_rdiv(INT32_MAX, std))
        o_ref[...] = jnp.floor(y * factor * 0.5) + b_ref[...]

    def kernel_nordiv(x_ref, b_ref, o_ref):
        xx = x_ref[...]
        mean = jnp.round(_int_sum(xx) * (1.0 / C))
        y = xx - mean
        var = _sq_sum(y)
        k = jnp.full_like(var, 2.0**16)
        for _ in range(10):
            k = jnp.floor((k + jnp.floor(var / k)) * 0.5)   # sloppy divide
        factor = jnp.floor(INT32_MAX / k)
        o_ref[...] = jnp.floor(y * factor * 0.5) + b_ref[...]

    def kernel_nosums(x_ref, b_ref, o_ref):
        xx = x_ref[...]
        mean = jnp.round(_rdiv(jnp.sum(xx, axis=-1, keepdims=True),
                               jnp.float32(C)))
        y = xx - mean
        var = jnp.sum(y * y, axis=-1, keepdims=True)
        std = _newton_sqrt(var)
        factor = jnp.floor(_rdiv(INT32_MAX, std))
        o_ref[...] = jnp.floor(y * factor * 0.5) + b_ref[...]

    def kernel_skeleton(x_ref, b_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0 + b_ref[...]

    print(f"# R={R} C={C} pack_w={pack_width(R)} grid=512 "
          f"backend={jax.default_backend()}", flush=True)
    base, t0 = run(kernel_base, "base")
    for name, kfn in [("packed", kernel_packed),
                      ("no_newton", kernel_nonewton),
                      ("sloppy_div", kernel_nordiv),
                      ("xla_sums", kernel_nosums),
                      ("skeleton", kernel_skeleton)]:
        out, t = run(kfn, name)
        if out is not None:
            print(json.dumps({
                "variant": name, "us_per_call": round(t * 1e6, 1),
                "base_us": round(t0 * 1e6, 1) if t0 else None,
                "bitwise_equal": bool(np.array_equal(base, out))
                if base is not None else None}), flush=True)


if __name__ == "__main__":
    main()
