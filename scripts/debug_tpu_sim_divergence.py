#!/usr/bin/env python
"""Pinpoint where the TPU-compiled QAT sim diverges from exact semantics.

Runs the sim with capture_intermediates on the current backend and writes
per-module outputs; run once on TPU and once on CPU
(JAX_PLATFORMS=cpu), then compare with --compare a.pkl b.pkl.
"""

import argparse
import os
import pickle
import sys

if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
sys.path.insert(0, ".")

import numpy as np


def flatten_intermediates(tree, prefix=""):
    out = {}
    for key, sub in tree.items():
        if key == "__call__":
            val = sub[0]
            if isinstance(val, tuple):
                val = val[0]
            if hasattr(val, "shape"):
                out[prefix] = np.asarray(val)
        elif isinstance(sub, dict):
            out.update(flatten_intermediates(sub, f"{prefix}/{key}"
                                             if prefix else key))
    return out


def run(args):
    import jax
    import jax.numpy as jnp

    from ivit_tpu.models import str2model

    model = str2model(args.model)(gelu_type=args.family,
                                  softmax_type=args.family,
                                  layernorm_type=args.family)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 224, 224, 3)).astype(np.float32))
    if args.vars and os.path.exists(args.vars):
        with open(args.vars, "rb") as f:
            frozen = jax.tree.map(jnp.asarray, pickle.load(f))
    else:
        variables = jax.jit(lambda a: model.init(
            jax.random.PRNGKey(0), a, running_stat=True))(x)
        _, st = jax.jit(lambda v, a: model.apply(
            v, a, running_stat=True, mutable=["quant_stats"]))(variables, x)
        frozen = {"params": variables["params"],
                  "quant_stats": st["quant_stats"]}
        if args.vars:
            with open(args.vars, "wb") as f:
                pickle.dump(jax.device_get(frozen), f)

    @jax.jit
    def fwd(v, a):
        return model.apply(v, a, running_stat=False,
                           capture_intermediates=True,
                           mutable=["intermediates"])

    out, mods = fwd(frozen, x)
    inter = flatten_intermediates(jax.device_get(mods["intermediates"]))
    inter["__logits__"] = np.asarray(out)
    with open(args.out, "wb") as f:
        pickle.dump(inter, f)
    print(f"wrote {len(inter)} tensors to {args.out}")


def compare(a_path, b_path):
    with open(a_path, "rb") as f:
        a = pickle.load(f)
    with open(b_path, "rb") as f:
        b = pickle.load(f)
    keys = [k for k in a if k in b]
    for k in sorted(keys):
        va, vb = a[k], b[k]
        if va.shape != vb.shape:
            print(f"{k}: shape {va.shape} vs {vb.shape}")
            continue
        d = np.abs(va.astype(np.float64) - vb.astype(np.float64))
        rel = d.max() / max(np.abs(va).max(), 1e-12)
        n_mism = (d > 1e-6 * np.abs(va).max()).mean()
        if rel > 1e-6:
            print(f"{k}: rel {rel:.3e}  mismfrac {n_mism:.4f}  "
                  f"mag {np.abs(va).max():.3e}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="deit_tiny_patch16_224")
    p.add_argument("--family", default="ivit")
    p.add_argument("--out", default="/tmp/sim_inter.pkl")
    p.add_argument("--vars", default="/tmp/sim_vars.pkl")
    p.add_argument("--compare", nargs=2, default=None)
    args = p.parse_args()
    if args.compare:
        compare(*args.compare)
    else:
        run(args)
