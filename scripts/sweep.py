#!/usr/bin/env python
"""Experiment grid sweep runner (ref ``sweep.yaml`` wandb grid, offline).

Reads a YAML/JSON sweep config with a ``grid`` of parameter lists, expands
the cartesian product, and runs ``scripts/quant_train.py`` per point,
collecting final metrics into a summary JSONL.

  python scripts/sweep.py --config sweep.yaml --dry-run
  python scripts/sweep.py --config sweep.yaml --output-dir runs/sweep1
"""

import argparse
import itertools
import json
import os
import subprocess
import sys

sys.path.insert(0, ".")


def load_config(path):
    with open(path) as f:
        text = f.read()
    if path.endswith(".json"):
        return json.loads(text)
    # tiny YAML subset: top-level keys, nested one level, lists of scalars
    try:
        import yaml  # type: ignore
        return yaml.safe_load(text)
    except ImportError:
        return _mini_yaml(text)


def _mini_yaml(text):
    """Parse the simple two-level mapping/list YAML used by sweep configs."""
    root: dict = {}
    stack = [(0, root)]
    last_key = None
    for raw in text.splitlines():
        if not raw.strip() or raw.strip().startswith("#"):
            continue
        indent = len(raw) - len(raw.lstrip())
        line = raw.strip()
        while stack and indent < stack[-1][0]:
            stack.pop()
        node = stack[-1][1]
        if line.startswith("- "):
            value = _coerce(line[2:])
            if not isinstance(node.get(last_key), list):
                node[last_key] = []
            node[last_key].append(value)
        elif line.endswith(":"):
            key = line[:-1]
            node[key] = {}
            stack.append((indent + 2, node[key]))
            last_key = key
        else:
            key, _, value = line.partition(":")
            node[key.strip()] = _coerce(value.strip())
            last_key = key.strip()
    return root


def _coerce(s):
    for cast in (int, float):
        try:
            return cast(s)
        except ValueError:
            pass
    return s.strip("'\"")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--output-dir", default="runs/sweep")
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--extra", nargs=argparse.REMAINDER, default=[],
                   help="extra args forwarded to quant_train.py")
    args = p.parse_args()

    cfg = load_config(args.config)
    grid = cfg.get("grid", cfg.get("parameters", {}))
    keys = sorted(grid)
    values = [grid[k] if isinstance(grid[k], list) else [grid[k]]
              for k in keys]
    combos = list(itertools.product(*values))
    print(f"{len(combos)} sweep points over {keys}")

    os.makedirs(args.output_dir, exist_ok=True)
    summary_path = os.path.join(args.output_dir, "sweep_summary.jsonl")
    for i, combo in enumerate(combos):
        point = dict(zip(keys, combo))
        run_id = "_".join(f"{k}-{v}" for k, v in point.items())[:80] \
            .replace("/", "-").replace(",", ".")
        cmd = [sys.executable, "scripts/quant_train.py",
               "--output-dir", args.output_dir, "--run-id", run_id]
        for k, v in point.items():
            cmd += [f"--{k.replace('_', '-')}", str(v)]
        cmd += args.extra
        print(f"[{i + 1}/{len(combos)}] {' '.join(cmd)}")
        if args.dry_run:
            continue
        r = subprocess.run(cmd, capture_output=True, text=True)
        rec = {"point": point, "run_id": run_id,
               "returncode": r.returncode}
        if r.returncode != 0:
            rec["stderr_tail"] = r.stderr[-2000:]
        # pick up the final epoch record from the run's jsonl log
        log_path = os.path.join(args.output_dir, f"log_{run_id}.jsonl")
        if os.path.exists(log_path):
            with open(log_path) as f:
                epochs = [json.loads(line) for line in f
                          if '"phase": "epoch"' in line]
            if epochs:
                rec["final"] = epochs[-1]
        with open(summary_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
    print(f"summary -> {summary_path}")


if __name__ == "__main__":
    main()
