#!/usr/bin/env python
"""Summarize an IO-statistics dump (ref ``scripts/analyze_io_stats.py``).

Reads the CSV/PKL written by ``ivit_tpu.utils.iostats`` / the inference CLI
and reports global integer extrema, shape histograms, and per-module-type
scale/extrema statistics — the datapath-sizing audit of SURVEY §5.1.

  python scripts/analyze_io_stats.py io_stats.csv
  python scripts/analyze_io_stats.py --engine deit_tiny_patch16_224 \
      --families ivit,ivit,ivit        # engine-side envelope audit
"""

import argparse
import os
import sys

if os.environ.get("JAX_PLATFORMS"):
    # the axon plugin ignores the env var; the config call works
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
sys.path.insert(0, ".")

import numpy as np
import pandas as pd


def engine_audit(model_name: str, families: str, batch: int = 4):
    """Run the integer engine under the envelope-audit taps and print the
    per-site table (the engine-side counterpart of the sim's io-stats)."""
    import jax
    import jax.numpy as jnp

    from ivit_tpu.engine.vit_int import (audit_capture, audit_violations,
                                         engine_forward)
    from ivit_tpu.models import str2model

    fams = families.split(",")
    is_swin = model_name.startswith("swin")
    kw = dict(gelu_type=fams[0], softmax_type=fams[1], layernorm_type=fams[2])
    if is_swin:
        kw["drop_path_rate"] = 0.0
    model = str2model(model_name)(**kw)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 224, 224, 3)).astype(np.float32))
    variables = jax.jit(lambda a: model.init(
        jax.random.PRNGKey(0), a, running_stat=True))(x)
    _, st = jax.jit(lambda v, a: model.apply(
        v, a, running_stat=True, mutable=["quant_stats"]))(variables, x)
    frozen = {"params": variables["params"], "quant_stats": st["quant_stats"]}
    if is_swin:
        from ivit_tpu.engine.swin_int import (freeze_swin_model,
                                              swin_engine_forward)
        spec = freeze_swin_model(model, frozen)
        fwd = swin_engine_forward
    else:
        from ivit_tpu.engine import freeze_model
        spec = freeze_model(model, frozen)
        fwd = engine_forward
    # the taps fire at trace time, so the extrema can be jit outputs —
    # eager evaluation of a full model would take minutes (or hours through
    # the TPU tunnel)
    meta = []

    @jax.jit
    def run(xx):
        with audit_capture() as recs:
            fwd(spec, xx, pallas=False)
        meta.clear()
        vals = []
        for r in recs:
            meta.append({k: r[k] for k in ("site", "kind",
                                           "lo_bound", "hi_bound")})
            meta[-1]["has_sat"] = "sat_frac" in r
            vals.append((r["min"], r["max"],
                         r.get("sat_frac", jnp.float32(-1.0))))
        return vals

    vals = jax.device_get(run(x))
    records = []
    print(f"{'site':16s} {'min':>14s} {'max':>14s} "
          f"{'lo_bound':>12s} {'hi_bound':>12s} {'sat%':>7s}")
    for m, (mn, mx, sat) in zip(meta, vals):
        rec = {**m, "min": float(mn), "max": float(mx)}
        if m["has_sat"]:
            rec["sat_frac"] = float(sat)
        records.append(rec)
        sat_s = (f"{float(sat)*100:7.3f}" if m["has_sat"] else "      -")
        print(f"{m['site']:16s} {float(mn):14.1f} {float(mx):14.1f} "
              f"{m['lo_bound']:12.3g} {m['hi_bound']:12.3g} {sat_s}")
    bad = audit_violations([r for r in records if "sat_frac" not in r])
    print(f"\nhard-bound violations: {len(bad)}")
    for r in bad:
        print("  VIOLATION", r)
    return 1 if bad else 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path", nargs="?")
    p.add_argument("--per-layer", action="store_true")
    p.add_argument("--engine", metavar="MODEL",
                   help="audit the integer engine for MODEL instead of "
                        "reading a sim io-stats dump")
    p.add_argument("--families", default="ivit,ivit,ivit",
                   help="gelu,softmax,ln families for --engine")
    p.add_argument("--batch", type=int, default=4)
    args = p.parse_args()

    if args.engine:
        sys.exit(engine_audit(args.engine, args.families, args.batch))
    if not args.path:
        p.error("path required unless --engine is given")

    df = (pd.read_pickle(args.path) if args.path.endswith(".pkl")
          else pd.read_csv(args.path))
    print(f"records: {len(df)}")

    if {"min_out_int", "max_out_int"} <= set(df):
        ints = df[["min_out_int", "max_out_int"]].dropna()
        print(f"global int extrema: [{ints.min_out_int.min():.1f}, "
              f"{ints.max_out_int.max():.1f}]")
        for bits in (8, 16, 32):
            lim = 2 ** (bits - 1)
            frac = ((ints.min_out_int >= -lim)
                    & (ints.max_out_int < lim)).mean()
            print(f"  fits int{bits}: {frac * 100:.1f}% of layers")

    df["mtype"] = df["layer"].str.rsplit("/", n=1).str[-1] \
        .str.replace(r"_\d+$", "", regex=True)
    print("\nper module type:")
    g = df.groupby("mtype").agg(
        n=("layer", "count"),
        scale_min=("scale_out", "min"),
        scale_max=("scale_out", "max"),
        int_min=("min_out_int", "min"),
        int_max=("max_out_int", "max"))
    print(g.to_string())

    if "shape_out" in df:
        print("\nshape histogram (top 10):")
        print(df["shape_out"].value_counts().head(10).to_string())

    if args.per_layer:
        print("\nper layer:")
        cols = [c for c in ("layer", "scale_out", "min_out_int",
                            "max_out_int") if c in df]
        print(df[cols].to_string())


if __name__ == "__main__":
    main()
