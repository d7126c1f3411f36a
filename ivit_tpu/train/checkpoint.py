"""Checkpoint save/load (ref quant_train.py:466-500, 405-443 parity).

Format: a directory with ``state.msgpack`` (flax-serialized pytree of
variables + optimizer state + EMA) and ``meta.json`` (epoch, best_acc1,
model_config, args) — self-describing like the reference's embedded
``model_config`` so ``inference``-style tools can rebuild the model.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, state: Dict[str, Any], *, epoch: int,
                    best_acc1: float, model_config: dict,
                    args: Optional[dict] = None,
                    ema_params=None, is_best: bool = False):
    os.makedirs(path, exist_ok=True)
    payload = dict(state)
    if ema_params is not None:
        payload["ema_params"] = ema_params
    blob = serialization.to_bytes(jax.device_get(payload))
    with open(os.path.join(path, "state.msgpack"), "wb") as f:
        f.write(blob)
    meta = {"epoch": int(epoch), "best_acc1": float(best_acc1),
            "model_config": model_config, "args": args or {},
            "keys": sorted(payload.keys())}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2, default=str)
    if is_best:
        best = os.path.join(os.path.dirname(path.rstrip("/")), "best")
        os.makedirs(best, exist_ok=True)
        with open(os.path.join(best, "state.msgpack"), "wb") as f:
            f.write(blob)
        with open(os.path.join(best, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2, default=str)


def load_checkpoint(path: str, template: Dict[str, Any]):
    """Restore into the template pytree; returns (state, meta)."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        blob = f.read()
    tmpl = dict(template)
    if "ema_params" in meta.get("keys", []) and "ema_params" not in tmpl:
        tmpl["ema_params"] = jax.tree.map(np.copy, tmpl["params"])
    state = serialization.from_bytes(tmpl, blob)
    return state, meta


def load_variables(path: str):
    """Structure-free restore of just the model variables (for inference:
    the optimizer-state layout depends on the training config and need not
    be reconstructed)."""
    from flax.serialization import msgpack_restore

    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        raw = msgpack_restore(f.read())
    return {"params": raw["params"], "quant_stats": raw["quant_stats"]}


def load_meta(path: str) -> dict:
    with open(os.path.join(path, "meta.json")) as f:
        return json.load(f)
