"""Per-layer IO-statistics tracing (ref quant_modules.py:20-125 parity).

The reference registers forward hooks on every module and records float/int
extrema, scales and shapes — used to size hardware datapaths
(scripts/analyze_io_stats.py).  The flax equivalent uses
``capture_intermediates``: every quantized module returns ``(tensor,
scale)``, so one instrumented forward yields the same table.

API parity: attach_io_stats / enable / disable / clear / get_io_stats_df /
save_io_stats.
"""

from __future__ import annotations

from typing import List

import jax
import numpy as np

_LAYER_IO_STATS: List[dict] = []
_IO_STATS_ENABLED = True


def enable_io_stats():
    global _IO_STATS_ENABLED
    _IO_STATS_ENABLED = True


def disable_io_stats():
    global _IO_STATS_ENABLED
    _IO_STATS_ENABLED = False


def clear_io_stats():
    _LAYER_IO_STATS.clear()


def _record(path: str, value):
    if not _IO_STATS_ENABLED:
        return
    if not (isinstance(value, tuple) and len(value) == 2
            and hasattr(value[0], "shape")):
        return
    out, scale = value
    out = np.asarray(out)
    scale = np.asarray(scale) if hasattr(scale, "shape") else None
    rec = {
        "layer": path,
        "type": path.rsplit("/", 1)[-1],
        "min_out": float(out.min()),
        "max_out": float(out.max()),
        "scale_out": (float(scale.reshape(-1)[0])
                      if scale is not None and scale.size else None),
        "shape_out": tuple(out.shape),
    }
    if scale is not None and scale.size:
        with np.errstate(divide="ignore", invalid="ignore"):
            ints = out / scale
        rec["min_out_int"] = float(np.nanmin(ints))
        rec["max_out_int"] = float(np.nanmax(ints))
    _LAYER_IO_STATS.append(rec)


def attach_io_stats(model, variables):
    """Returns ``fwd(x)`` that runs an instrumented forward, recording every
    submodule's ``(tensor, scale)`` output into the global stats buffer."""

    def fwd(x):
        out, mods = model.apply(variables, x, running_stat=False,
                                capture_intermediates=True,
                                mutable=["intermediates"])
        inter = jax.device_get(mods["intermediates"])

        def walk(tree, prefix=""):
            for key, sub in tree.items():
                if key == "__call__":
                    for v in sub:
                        _record(prefix or "<model>", v)
                elif isinstance(sub, dict):
                    walk(sub, f"{prefix}/{key}" if prefix else key)

        walk(inter)
        return out

    return fwd


def get_io_stats_df():
    import pandas as pd

    return pd.DataFrame(_LAYER_IO_STATS)


def save_io_stats(path: str):
    df = get_io_stats_df()
    if path.endswith(".pkl"):
        df.to_pickle(path)
    else:
        df.to_csv(path, index=False)
    return df
