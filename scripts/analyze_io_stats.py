#!/usr/bin/env python
"""Summarize an IO-statistics dump (ref ``scripts/analyze_io_stats.py``).

Reads the CSV/PKL written by ``ivit_tpu.utils.iostats`` / the inference CLI
and reports global integer extrema, shape histograms, and per-module-type
scale/extrema statistics — the datapath-sizing audit of SURVEY §5.1.

  python scripts/analyze_io_stats.py io_stats.csv
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np
import pandas as pd


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path")
    p.add_argument("--per-layer", action="store_true")
    args = p.parse_args()

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
