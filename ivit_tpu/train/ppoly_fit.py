"""Host-side piecewise-polynomial fitting pass over a calibrated model.

TPU re-design of the reference's per-forward refitting
(ppoly_modules.py:56-100,213-256): the ppoly layers track their observed
input ranges and scales in ``quant_stats`` during calibration; this pass
walks the tree once, runs the numpy least-squares fit for every ppoly site,
and writes the integer coefficient tables back.  Call after calibration and
again whenever ranges move materially (e.g. each epoch during QAT).
"""

from __future__ import annotations

import jax
import numpy as np

from ..models.registry import parse_layer_name
from ..ops.ppoly import fit_gelu_table, fit_softmax_exp_table


def _is_ppoly_site(subtree: dict) -> bool:
    return (isinstance(subtree, dict)
            and {"bounds", "coeffs", "fitted", "x_lo", "x_hi",
                 "in_scale"} <= set(subtree.keys()))


def fit_ppoly_tables(model, variables: dict) -> dict:
    """Fit all ppoly sites; returns variables with updated quant_stats."""
    qs = jax.device_get(variables["quant_stats"])
    gelu_base, gelu_kw = parse_layer_name(model.gelu_type)
    sm_base, sm_kw = parse_layer_name(model.softmax_type)

    def walk(tree, path=()):
        for key, sub in list(tree.items()):
            if _is_ppoly_site(sub):
                in_scale = float(np.asarray(sub["in_scale"]).reshape(-1)[0])
                x_lo = float(np.asarray(sub["x_lo"]).reshape(-1)[0])
                x_hi = float(np.asarray(sub["x_hi"]).reshape(-1)[0])
                if in_scale == 0.0 or x_lo == x_hi:
                    continue  # never calibrated
                seg = sub["coeffs"].shape[0]
                deg = sub["coeffs"].shape[1] - 1
                if "softmax" in key:
                    kw = dict(sm_kw)
                    table = fit_softmax_exp_table(
                        x_lo, x_hi, in_scale,
                        scale_bits=int(kw.get("scale_bits", 28)),
                        seg=seg, deg=deg,
                        backend=str(kw.get("backend", "float")),
                        alpha=float(kw.get("alpha", 0.0)),
                        optim_bounds=bool(kw.get("optim_bounds", False)))
                else:
                    kw = dict(gelu_kw)
                    table = fit_gelu_table(
                        x_lo, x_hi, in_scale,
                        scale_bits=int(kw.get("scale_bits", 22)),
                        seg=seg, deg=deg,
                        backend=str(kw.get("backend", "ibert")),
                        alpha=float(kw.get("alpha", 0.0)),
                        optim_bounds=bool(kw.get("optim_bounds", True)))
                sub["bounds"] = np.asarray(table.bounds, np.int32)
                sub["coeffs"] = np.clip(
                    table.coeffs, -(2**31), 2**31 - 1).astype(np.int32)
                sub["fitted"] = np.ones((1,), np.float32)
            elif isinstance(sub, dict):
                walk(sub, path + (key,))

    walk(qs)
    return {**variables, "quant_stats": qs}
