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
