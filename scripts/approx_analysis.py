#!/usr/bin/env python
"""Approximation-error analysis harness.

Unifies the reference's per-function analysis scripts
(``/root/reference/scripts/{gelu,softmax,exp,layernorm}_approx_analysis.py``):
evaluates every integer approximation family against the float golden
function over the dense 8-bit input grid (``x_int in [-128,127] * scale``,
ref gelu_approx_analysis.py:74-79) and reports max/mean/median absolute
error, optionally plotting.

  python scripts/approx_analysis.py --function gelu --scale 0.05
  python scripts/approx_analysis.py --function softmax --families ivit ibert
  python scripts/approx_analysis.py --function all --json out.json
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


def _err_stats(got, want):
    err = np.abs(np.asarray(got, np.float64) - np.asarray(want, np.float64))
    return {"max_err": float(err.max()), "mean_err": float(err.mean()),
            "median_err": float(np.median(err))}


def analyze_gelu(scale, families):
    import jax.numpy as jnp
    from scipy.special import erf

    from ivit_tpu.ops import ibert, ivit, ppoly

    x = (np.arange(-128, 128) * scale).astype(np.float32).reshape(1, -1)
    ref = x * 0.5 * (1 + erf(x / np.sqrt(2)))
    out = {}
    for fam in families:
        if fam == "ivit":
            y, _ = ivit.shift_gelu(jnp.asarray(x), jnp.asarray([scale]))
        elif fam == "ibert":
            y, _ = ibert.ibert_gelu(jnp.asarray(x), jnp.asarray([scale]))
        elif fam.startswith("ppoly"):
            table = ppoly.fit_gelu_table(float(x.min()), float(x.max()),
                                         scale, backend="float")
            y_int = ppoly.eval_piecewise_poly(
                jnp.asarray(x / scale), table.bounds.astype(np.float32),
                table.coeffs.astype(np.float32))
            y = np.asarray(y_int) / 2.0**table.scale_bits
        else:
            continue
        out[fam] = _err_stats(y, ref)
    return out


def analyze_softmax(scale, families, n=197):
    import jax
    import jax.numpy as jnp

    from ivit_tpu.models.layers import IBERTSoftmax
    from ivit_tpu.ops import ivit

    rng = np.random.default_rng(0)
    x = (rng.integers(-127, 128, size=(64, n)) * scale).astype(np.float32)
    ref = np.asarray(jax.nn.softmax(jnp.asarray(x), axis=-1))
    out = {}
    for fam in families:
        if fam == "ivit":
            y, _ = ivit.shiftmax(jnp.asarray(x), jnp.asarray([scale]))
        elif fam == "ibert":
            mod = IBERTSoftmax(output_bit=8)
            v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         jnp.asarray([scale]), running_stat=True)
            _, st = mod.apply(v, jnp.asarray(x), jnp.asarray([scale]),
                              running_stat=True, mutable=["quant_stats"])
            (y, _), _ = mod.apply({**st}, jnp.asarray(x),
                                  jnp.asarray([scale]), running_stat=False,
                                  mutable=[])
        else:
            continue
        out[fam] = _err_stats(y, ref)
    return out


def analyze_exp(scale, families):
    """Isolated integer exp comparison (ref exp_approx_analysis.py:22-87)."""
    import jax.numpy as jnp

    from ivit_tpu.ops import ibert, ivit

    x_int = np.arange(-512, 1, dtype=np.float32)
    ref = np.exp(x_int * scale)
    out = {}
    for fam in families:
        if fam == "ivit":
            e, e_s = ivit.int_exp_shift(jnp.asarray(x_int), jnp.asarray(scale),
                                        n=15)
            y = np.asarray(e) * float(np.asarray(e_s).reshape(-1)[0])
        elif fam == "ibert":
            e, s = ibert.int_exp(jnp.asarray(x_int), jnp.asarray(scale))
            y = np.asarray(e) * float(np.asarray(s).reshape(-1)[0])
        else:
            continue
        out[fam] = _err_stats(y, ref)
    return out


def analyze_layernorm(scale, families, c=192):
    import jax.numpy as jnp

    from ivit_tpu.ops import ibert, ivit

    rng = np.random.default_rng(0)
    x = (rng.integers(-127, 128, size=(4, 16, c)) * scale).astype(np.float32)
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    ref = (x - mean) / np.sqrt(var + 1e-6)
    out = {}
    w = jnp.ones(c)
    b = jnp.zeros(c)
    for fam in families:
        if fam == "ivit":
            y, _, _ = ivit.i_layernorm(jnp.asarray(x), jnp.asarray([scale]), w, b)
        elif fam == "ibert":
            y, _, _, _ = ibert.ibert_layernorm(jnp.asarray(x),
                                            jnp.asarray([scale]), w, b,
                                            jnp.zeros(1),
                                            overflow_handling=False)
        elif fam == "ibert_int_sqrt":
            y, _, _, _ = ibert.ibert_layernorm(jnp.asarray(x),
                                            jnp.asarray([scale]), w, b,
                                            jnp.zeros(1),
                                            overflow_handling=False,
                                            use_int_sqrt=True)
        else:
            continue
        out[fam] = _err_stats(y, ref)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--function", default="all",
                   choices=["gelu", "softmax", "exp", "layernorm", "all"])
    p.add_argument("--scale", type=float, default=0.05)
    p.add_argument("--families", nargs="+",
                   default=["ivit", "ibert", "ppoly"])
    p.add_argument("--json", default=None)
    args = p.parse_args()

    fns = {"gelu": analyze_gelu, "softmax": analyze_softmax,
           "exp": analyze_exp, "layernorm": analyze_layernorm}
    which = list(fns) if args.function == "all" else [args.function]
    results = {}
    for name in which:
        results[name] = fns[name](args.scale, args.families)
        for fam, stats in results[name].items():
            print(f"{name:10s} {fam:10s} max {stats['max_err']:.5f} "
                  f"mean {stats['mean_err']:.5f} "
                  f"median {stats['median_err']:.5f}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
