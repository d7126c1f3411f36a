"""Frozen-engine serialization (the deployment artifact).

The TPU counterpart of the reference's ONNX/TVM export chain
(scripts/inference.py:334-364 + TVM_benchmark/convert_model.py): a saved
engine is an ``.npz`` of the integer parameter tree (int8 weights, int32
biases, f32 dyadic multipliers, precomputed constants) plus a JSON config —
everything needed to run integer-only inference without the QAT checkpoint.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import numpy as np

from ..models.vit import BitWidths
from .freeze import EngineConfig, EngineSpec


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat):
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if isinstance(node, dict):
            if node and all(k.isdigit() for k in node):
                return [listify(node[str(i)]) for i in range(len(node))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(tree)


def save_engine(spec: EngineSpec, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(jax.device_get(spec.params))
    np.savez_compressed(path if path.endswith(".npz") else path + ".npz",
                        **flat)
    cfg = dataclasses.asdict(spec.config)
    cfg["bitwidths"] = spec.config.bitwidths.to_list()
    with open((path[:-4] if path.endswith(".npz") else path) + ".json",
              "w") as f:
        json.dump(cfg, f, indent=2)


def load_engine(path: str) -> EngineSpec:
    base = path[:-4] if path.endswith(".npz") else path
    with open(base + ".json") as f:
        cfg = json.load(f)
    cfg["bitwidths"] = BitWidths(*cfg["bitwidths"])
    if "layout" in cfg:
        # Swin artifact: restore the static tuples JSON turned into lists
        from .swin_int import SwinEngineConfig, SwinEngineSpec
        cfg["depths"] = tuple(cfg["depths"])
        cfg["stage_heads"] = tuple(cfg["stage_heads"])
        cfg["layout"] = tuple(tuple(e) for e in cfg["layout"])
        config = SwinEngineConfig(**cfg)
        spec_cls = SwinEngineSpec
    else:
        config = EngineConfig(**cfg)
        spec_cls = EngineSpec
    with np.load(base + ".npz") as z:
        flat = {k: z[k] for k in z.files}
    import jax.numpy as jnp
    params = jax.tree.map(jnp.asarray, _unflatten(flat))
    return spec_cls(config=config, params=params)
