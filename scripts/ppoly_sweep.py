#!/usr/bin/env python
"""Piecewise-polynomial parameter sweep
(ref ``scripts/ppoly_gelu_analysis.py:23-64`` + ``ppoly_softmax_analysis.py``
+ the deg x seg grid of ``scripts/sweep_ppoly_inference.sh:26-35``).

Sweeps degree x segments x scale-bits x backend for the GELU and softmax-exp
fits, reporting approximation error per configuration.

  python scripts/ppoly_sweep.py --function gelu --degrees 1 2 3 --segments 8 16 32
"""

import argparse
import json
import os
import sys

if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
sys.path.insert(0, ".")

import numpy as np


def sweep(function, scale, degrees, segments, scale_bits_list, backends,
          optim_bounds):
    import jax.numpy as jnp
    from scipy.special import erf

    from ivit_tpu.ops import ppoly

    rows = []
    x_int = np.arange(-128, 128, dtype=np.float32)
    for deg in degrees:
        for seg in segments:
            for nbits in scale_bits_list:
                for backend in backends:
                    if function == "gelu":
                        table = ppoly.fit_gelu_table(
                            x_int.min() * scale, x_int.max() * scale, scale,
                            scale_bits=nbits, seg=seg, deg=deg,
                            backend=backend, optim_bounds=optim_bounds)
                        y_int = ppoly.eval_piecewise_poly(
                            jnp.asarray(x_int),
                            table.bounds.astype(np.float32),
                            table.coeffs.astype(np.float32))
                        xs = x_int * scale
                        if backend == "float":
                            y = np.asarray(y_int) / 2.0**nbits
                        else:
                            y = np.asarray(y_int) * float(table.out_scale)
                        ref = xs * 0.5 * (1 + erf(xs / np.sqrt(2)))
                    else:
                        table = ppoly.fit_softmax_exp_table(
                            -128, 127, scale, scale_bits=nbits, seg=seg,
                            deg=deg, backend=backend,
                            optim_bounds=optim_bounds)
                        x_off = np.arange(-128, 128, dtype=np.float32)
                        y_int = ppoly.eval_piecewise_poly(
                            jnp.asarray(x_off),
                            table.bounds.astype(np.float32),
                            table.coeffs.astype(np.float32))
                        y = np.clip(np.asarray(y_int), 0, None) / 2.0**nbits
                        ref = np.exp((x_off - 127) * scale)
                    err = np.abs(y - ref)
                    rows.append({
                        "function": function, "deg": deg, "seg": seg,
                        "scale_bits": nbits, "backend": backend,
                        "max_err": float(err.max()),
                        "mean_err": float(err.mean()),
                    })
                    print(f"{function} deg={deg} seg={seg:3d} N={nbits} "
                          f"backend={backend:6s} max={err.max():.6f} "
                          f"mean={err.mean():.6f}")
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--function", default="gelu", choices=["gelu", "softmax"])
    p.add_argument("--scale", type=float, default=0.05)
    p.add_argument("--degrees", type=int, nargs="+", default=[1, 2])
    p.add_argument("--segments", type=int, nargs="+", default=[8, 16, 32])
    p.add_argument("--scale-bits", type=int, nargs="+", default=[22])
    p.add_argument("--backends", nargs="+", default=["float"])
    p.add_argument("--optim-bounds", action="store_true")
    p.add_argument("--json", default=None)
    args = p.parse_args()
    rows = sweep(args.function, args.scale, args.degrees, args.segments,
                 args.scale_bits, args.backends, args.optim_bounds)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
