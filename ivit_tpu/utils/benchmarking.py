"""Measurement utilities that survive high dispatch latency.

The hosted TPU is reached through a tunnel with ~1ms per-dispatch overhead,
so timing loops that dispatch one op per iteration measure the tunnel, not
the chip.  ``time_inloop`` repeats the op *inside* a single jitted
``lax.scan`` with a forced data dependency between iterations, so one
dispatch covers N device executions.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def time_inloop(step: Callable, carry0, n_iters: int = 50, n_timings: int = 3,
                warmup: int = 1):
    """Time ``step`` (carry -> carry) repeated ``n_iters`` times in-graph.

    ``step`` must return a pytree of the same structure as its input so the
    scan carries a data dependency (preventing elision and overlap).
    Returns seconds per single ``step`` application (min over timings).
    """

    @jax.jit
    def rep(carry):
        def body(c, _):
            return step(c), ()
        out, _ = jax.lax.scan(body, carry, None, length=n_iters)
        return out

    out = rep(carry0)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(max(1, n_timings)):
        t0 = time.perf_counter()
        out = rep(carry0)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n_iters)
    return best


def time_dispatch(fn: Callable, *args, iters: int = 10):
    """Wall-clock per call including dispatch (for end-to-end serving numbers)."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def profile_device_ops(fn: Callable, *args, iters: int = 5):
    """Run ``fn`` under ``jax.profiler.trace`` and aggregate device-op time.

    Per the tunnel-timing doctrine (CLAUDE.md): per-op wall timing lies in
    both directions, so speed-of-light accounting derives from the profiler
    trace — the only per-op numbers the hardware actually reports.

    Returns ``{op_name: {"us_per_iter", "calls_per_iter"}}`` summed over all
    device lanes and divided by ``iters``.
    """
    import glob
    import gzip
    import json
    import tempfile

    out = fn(*args)
    jax.block_until_ready(out)          # compile outside the trace
    events = []
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(iters):
                out = fn(*args)
            jax.block_until_ready(out)
        for path in glob.glob(f"{td}/**/*.trace.json.gz", recursive=True):
            with gzip.open(path, "rt") as f:
                events += json.load(f).get("traceEvents", [])

    import re

    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name" and "args" in e}
    dev_pids = {p for p, n in pid_names.items()
                if "/device:" in n or "TPU" in n or "Device" in n}
    # The device plane carries one line of whole-module spans ("XLA Modules",
    # e.g. ``jit__lambda(1114654...)``) that PARENT the per-op line
    # ("XLA Ops"); summing both double-counts every op.  Keep per-op lines
    # only when the trace labels them; this environment's tunnel traces label
    # NEITHER line (round-2 BENCH_MATRIX had ~50% of device time land in a
    # single ``jit__lambda(<fingerprint>)`` row and model_total ~2x wall), so
    # also drop spans by name: XLA module spans are named
    # ``<computation>(<fingerprint>)`` while op spans are ``<op>.<n>``.
    tid_names = {(e["pid"], e["tid"]): e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "thread_name" and "args" in e}
    op_tids = {k for k, n in tid_names.items() if "XLA Ops" in n}
    module_tids = {k for k, n in tid_names.items() if "XLA Modules" in n}
    module_name = re.compile(r"\(\d+\)$")
    agg: dict = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        key = (e.get("pid"), e.get("tid"))
        if op_tids:
            if key not in op_tids:
                continue
        elif key in module_tids:
            continue
        name = e.get("name", "?")
        if module_name.search(name):
            continue
        rec = agg.setdefault(name, [0.0, 0])
        rec[0] += float(e.get("dur", 0.0))
        rec[1] += 1
    return {k: {"us_per_iter": v[0] / iters, "calls_per_iter": v[1] / iters}
            for k, v in sorted(agg.items(), key=lambda kv: -kv[1][0])}


def sol_table(ops: dict, flops_by_match: dict, peak_ops_per_sec: float):
    """Speed-of-light utilization per site.

    ``flops_by_match``: {site: (name_substrings, ops_per_iter)} — an op event
    is charged to the first site whose substring list matches its name.
    Returns {site: {"us", "tops", "sol"}} plus an ``_unmatched_us`` entry.
    """
    out = {}
    matched_names: set = set()
    for site, (subs, flops) in flops_by_match.items():
        us = 0.0
        for name, rec in ops.items():
            if any(s in name for s in subs):
                us += rec["us_per_iter"]
                matched_names.add(name)
        if us > 0:
            attained = flops / (us * 1e-6)
            out[site] = {"us": round(us, 1),
                         "tops": round(attained / 1e12, 1),
                         "sol": round(attained / peak_ops_per_sec, 3)}
    out["_unmatched_us"] = round(sum(
        rec["us_per_iter"] for name, rec in ops.items()
        if name not in matched_names), 1)
    return out


# Per-chip peak numbers for speed-of-light accounting.  TPU v5e (v5 lite):
# 394 TOPS int8, 197 TFLOPS bf16, 819 GB/s HBM.
PEAKS = {
    "tpu v5 lite": {"int8_tops": 394e12, "bf16_flops": 197e12, "hbm_gbps": 819e9},
    "tpu v5": {"int8_tops": 918e12, "bf16_flops": 459e12, "hbm_gbps": 2765e9},
}


def chip_peaks():
    kind = jax.devices()[0].device_kind.lower()
    for k, v in PEAKS.items():
        if kind.startswith(k):
            return v
    return PEAKS["tpu v5 lite"]
