#!/usr/bin/env python
"""Probe: does Mosaic lower a batched ``lax.dot_general`` inside a Pallas
TPU kernel, and how does it time against the unrolled per-(window, head)
loop at Swin stage geometries?

Three kernel variants over q/k [W, n, d] -> scores [W, n, n]:
  loop     — python-unrolled 2-D dots (the current swin kernel shape)
  batched  — one 3-D dot_general with a batch dimension
  packed2  — windows paired into [2n, d] operands; cross-window quadrants
             of the [2n, 2n] scores are discarded (masking cost modeled by
             a where)

Perf-probe only: random int8 data, correctness checked against numpy.
"""

import argparse
import functools
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=24,
                    help="windows*heads per program (stage0: 8*3)")
    ap.add_argument("--n", type=int, default=56)
    ap.add_argument("--d", type=int, default=32)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ivit_tpu.utils.benchmarking import time_inloop

    W, n, d = args.windows, args.n, args.d
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(-100, 100, size=(W, n, d)).astype(np.int8))
    k = jnp.asarray(rng.integers(-100, 100, size=(W, n, d)).astype(np.int8))
    ref = np.einsum("wnd,wmd->wnm",
                    np.asarray(q, np.int32), np.asarray(k, np.int32))

    def kernel_loop(q_ref, k_ref, o_ref):
        for w in range(W):
            o_ref[w] = jax.lax.dot_general(
                q_ref[w], k_ref[w], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)

    def kernel_batched(q_ref, k_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            q_ref[...], k_ref[...], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)

    def kernel_packed2(q_ref, k_ref, o_ref):
        qq = q_ref[...].reshape(W // 2, 2 * n, d)
        kk = k_ref[...].reshape(W // 2, 2 * n, d)
        for w in range(W // 2):
            s = jax.lax.dot_general(
                qq[w], kk[w], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)          # [2n, 2n]
            o_ref[2 * w] = s[:n, :n]
            o_ref[2 * w + 1] = s[n:, n:]

    def run(kfn, name):
        f = pl.pallas_call(
            kfn,
            out_shape=jax.ShapeDtypeStruct((W, n, n), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        try:
            out = np.asarray(jax.jit(lambda a, b: f(a, b))(q, k))
            ok = bool(np.array_equal(out, ref))
            # carry-type-preserving wrapper for time_inloop's scan
            t = time_inloop(lambda a: f(a, k)[:, :, :d].astype(jnp.int8),
                            q, n_iters=args.iters, n_timings=3)
            print(json.dumps({"variant": name, "ok": ok,
                              "us_per_call": round(t * 1e6, 1)}), flush=True)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"variant": name,
                              "error": repr(exc)[:300]}), flush=True)

    print(f"# W={W} n={n} d={d} backend={jax.default_backend()}", flush=True)
    run(kernel_loop, "loop")
    run(kernel_batched, "batched")
    if W % 2 == 0:
        run(kernel_packed2, "packed2")


if __name__ == "__main__":
    main()
