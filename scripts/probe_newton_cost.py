#!/usr/bin/env python
"""Probe: what does the ivit LN Newton-sqrt chain actually cost in Mosaic?

Disambiguates latency-bound vs throughput-bound vs relayout-dominated:
  newton_R<k>   — pure newton+factor kernel on [R, 1] stats, grid sized to
                  keep TOTAL rows constant across variants
  reshape_rt    — round-trip reshape [R,1]->[R/w,w]->[R,1] + unpacked newton
                  (isolates the relayout cost the packed variant pays)
  packed        — newton on the lane-packed [R/w, w] layout
  nonewton      — no newton at all (floor of the kernel)
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--total-rows", type=int, default=57344)  # 128 * 448
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ivit_tpu.ops.pallas import _kernel_trace
    from ivit_tpu.ops.pallas.block import _newton_sqrt, INT32_MAX
    from ivit_tpu.ops.pallas.nonlinear import _rdiv
    from ivit_tpu.utils.benchmarking import time_inloop

    T = args.total_rows
    rng = np.random.default_rng(0)
    var = jnp.asarray(rng.integers(1, 2**30, size=(T, 1)).astype(np.float32))

    def pack_w(r):
        for w in (128, 64, 32, 16, 8):
            if r % w == 0:
                return w
        return 1

    def make(kfn, R):
        def f(a):
            with _kernel_trace(False):
                return pl.pallas_call(
                    kfn,
                    out_shape=jax.ShapeDtypeStruct((T, 1), jnp.float32),
                    grid=(T // R,),
                    in_specs=[pl.BlockSpec((R, 1), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((R, 1), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                )(a)
        return f

    def k_newton(v_ref, o_ref):
        std = _newton_sqrt(v_ref[...])
        o_ref[...] = jnp.floor(_rdiv(INT32_MAX, std))

    def k_packed(v_ref, o_ref):
        R = v_ref.shape[0]
        w = pack_w(R)
        vp = v_ref[...].reshape(R // w, w)
        std = _newton_sqrt(vp)
        o_ref[...] = jnp.floor(_rdiv(INT32_MAX, std)).reshape(R, 1)

    def k_reshape_rt(v_ref, o_ref):
        R = v_ref.shape[0]
        w = pack_w(R)
        v = v_ref[...].reshape(R // w, w).reshape(R, 1)
        std = _newton_sqrt(v)
        o_ref[...] = jnp.floor(_rdiv(INT32_MAX, std))

    def k_nonewton(v_ref, o_ref):
        o_ref[...] = jnp.floor(v_ref[...] * 0.5)

    ref = None
    print(f"# total_rows={T} backend={jax.default_backend()}", flush=True)
    for name, kfn, R in [("newton_R448", k_newton, 448),
                         ("newton_R3584", k_newton, 3584),
                         ("newton_R56", k_newton, 56),
                         ("packed_R448", k_packed, 448),
                         ("reshape_rt_R448", k_reshape_rt, 448),
                         ("nonewton_R448", k_nonewton, 448)]:
        try:
            f = make(kfn, R)
            out = np.asarray(jax.jit(f)(var))
            if name == "newton_R448":
                ref = out
            t = time_inloop(f, var, n_iters=args.iters, n_timings=3)
            print(json.dumps({
                "variant": name, "us_per_call": round(t * 1e6, 1),
                "equal": bool(np.array_equal(ref, out))
                if ref is not None and "nonewton" not in name else None}),
                flush=True)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": repr(exc)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
