"""Export trained variables to the reference's checkpoint schema.

Inverse of ``torch_ckpt.convert_state_dict``: writes a ``.pth.tar`` whose
``model`` state_dict uses the reference names/layouts (``blocks.N.``,
``[O, I]`` linear weights, OIHW convs, QuantAct buffers) plus the derived
integer buffers the reference persists and its TVM converter consumes
(``weight_integer``/``bias_integer``/``fc_scaling_factor`` — SURVEY §5.4:
"this checkpoint schema is the ingestion contract").  Lets models trained
here be evaluated by the reference tooling and vice versa.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

F32_EPS = float(np.finfo(np.float32).eps)


def _sym_scale(bits, lo, hi):
    n = 2 ** (bits - 1) - 1
    return np.maximum(np.maximum(-lo, hi) / n, F32_EPS).astype(np.float32)


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        name = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, name))
        else:
            out[name] = np.asarray(v)
    return out


def to_reference_state_dict(variables: dict) -> Dict[str, np.ndarray]:
    """Our {params, quant_stats} -> reference-style flat state_dict."""
    params = _flatten(jax.device_get(variables["params"]))
    qstats = _flatten(jax.device_get(variables["quant_stats"]))
    out: Dict[str, np.ndarray] = {}

    def ref_name(name: str) -> str:
        parts = name.split(".")
        if parts[0].startswith("blocks_"):
            parts = ["blocks", parts[0].split("_", 1)[1]] + parts[1:]
        if parts[0].startswith("layers_"):  # swin: layers_i_blocks_d etc.
            bits = parts[0].split("_")
            parts = ["layers", bits[1]] + bits[2:] + parts[1:]
        return ".".join(parts)

    for name, value in params.items():
        rname = ref_name(name)
        if rname.endswith(".kernel"):
            base = rname[: -len(".kernel")]
            if value.ndim == 4:          # HWIO -> OIHW
                out[base + ".weight"] = value.transpose(3, 2, 0, 1)
            elif value.ndim == 2:        # [I,O] -> [O,I]
                out[base + ".weight"] = value.T
            else:
                out[base + ".weight"] = value
        else:
            out[rname] = value

    for name, value in qstats.items():
        out[ref_name(name)] = value

    # derived integer buffers (what TVM_benchmark/convert_model.py reads)
    for name, value in list(out.items()):
        if not name.endswith(".weight") or value.ndim not in (2, 4):
            continue
        base = name[: -len(".weight")]
        flat = value.reshape(value.shape[0], -1)
        scale = _sym_scale(8, flat.min(axis=1), flat.max(axis=1))
        w_int = np.clip(np.round(flat / scale[:, None]), -128,
                        127).reshape(value.shape)
        key = ("conv_scaling_factor" if value.ndim == 4
               else "fc_scaling_factor")
        out[f"{base}.{key}"] = scale
        out[f"{base}.weight_integer"] = w_int.astype(np.float32)
    return out


def save_reference_checkpoint(variables: dict, model_config: dict,
                              path: str, **extra):
    """Write a reference-compatible ``.pth.tar`` (requires torch)."""
    import torch

    state = {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in to_reference_state_dict(variables).items()}
    torch.save({"model": state, "model_config": model_config, **extra}, path)
