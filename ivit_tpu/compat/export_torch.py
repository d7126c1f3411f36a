"""Export trained variables to the reference's checkpoint schema.

Inverse of ``torch_ckpt.convert_state_dict``: writes a ``.pth.tar`` whose
``model`` state_dict uses the reference names/layouts (``blocks.N.``,
``[O, I]`` linear weights, OIHW convs, QuantAct buffers) **plus every
registered buffer the reference model persists**, so the file satisfies the
reference trainer's strict ``model.load_state_dict`` (quant_train.py:412)
and feeds ``TVM_benchmark/convert_model.py`` directly:

* per-linear/conv: ``weight_integer`` / ``bias_integer`` /
  ``fc_scaling_factor`` (``conv_scaling_factor``) — quant_modules.py:131-226,
  with ``bias_integer = round(bias / (w_scale * s_in))`` using the *input
  activation scale chain* (the same chain ``engine/freeze.py`` walks),
* per-QuantAct: ``x_min`` / ``x_max`` / ``act_scaling_factor`` (synthesized
  from the ranges with the reference's symmetric-scale formula),
* ``matmul_1`` / ``matmul_2`` ``act_scaling_factor`` (quant_modules.py:390-409:
  the product of the two input scales),
* family buffers: ivit LN ``norm_scaling_factor``/``bias_integer``
  (ivit_modules.py:53-64), ivit GELU/Softmax output ``act_scaling_factor``
  (ivit_modules.py:125,178), ibert LN ``shift`` (ibert_modules.py:43),
  ibert GELU ``input_scaling_factor`` (ibert_modules.py:176).

Supported for derived-buffer emission: the ViT/DeiT family with
ivit/ibert/float nonlinearity types (the reference's deployable configs).
Swin and ppoly variables export names/weights/ranges only (the reference's
own Swin model is broken and its ppoly modules persist fit-time buffers the
TVM converter never reads).
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import jax
import numpy as np

F32_EPS = float(np.finfo(np.float32).eps)


def _sym_scale(bits, lo, hi):
    n = 2 ** (bits - 1) - 1
    return np.maximum(
        np.maximum(-np.asarray(lo, np.float32), np.asarray(hi, np.float32))
        / np.float32(n), F32_EPS).astype(np.float32)


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        name = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, name))
        else:
            out[name] = np.asarray(v)
    return out


def ref_name(name: str) -> str:
    """Our flat variable name -> reference state_dict name."""
    parts = name.split(".")
    if parts[0].startswith("blocks_"):
        parts = ["blocks", parts[0].split("_", 1)[1]] + parts[1:]
    if parts[0].startswith("layers_"):   # swin: layers_i_blocks_d etc.
        bits = parts[0].split("_")
        parts = ["layers", bits[1]] + bits[2:] + parts[1:]
    return ".".join(parts)


def _qact_bits(bw: dict):
    """Map reference qact base name -> activation bitwidth.

    Mirrors the QuantAct constructions in models/vit.py (and the reference
    vit_quant.py): everything is 8-bit except the sites the 8-position
    bitwidth vector overrides, and the ibert softmax's internal 16-bit exp
    QuantAct.
    """
    def bits(base: str) -> int:
        if base == "qact_input" or base == "qact2":
            return 8
        if base == "patch_embed.qact":
            return bw.get("patch_embed", 8)
        if base == "qact_pos":
            return bw.get("pos_encoding", 8)
        if base == "qact1":
            return bw.get("block_input", 8)
        m = re.match(r"blocks\.\d+\.(.+)$", base)
        if not m:
            return 8
        inner = m.group(1)
        return {
            "qact2": bw.get("norm2_in", 8),
            "qact4": bw.get("att_block_out", 8),
            "attn.qact3": bw.get("attention_out", 8),
            "attn.int_softmax.act": 16,
            "mlp.qact2": bw.get("mlp_out", 8),
        }.get(inner, 8)
    return bits


def _linear_sites(out: Dict[str, np.ndarray]):
    """(linear base, input-qact base, is_conv) triples present in ``out``.

    The input side of each GEMM in the reference graph
    (TVM_benchmark/convert_model.py:80-148 scale chain).
    """
    sites = []
    if "patch_embed.proj.weight" in out:
        sites.append(("patch_embed.proj", "qact_input", True))
    if "head.weight" in out:
        sites.append(("head", "qact2", False))
    for key in out:
        m = re.match(r"(blocks\.(\d+))\.attn\.qkv\.weight$", key)
        if m:
            b = m.group(1)
            sites += [(f"{b}.attn.qkv", f"{b}.qact1", False),
                      (f"{b}.attn.proj", f"{b}.attn.qact2", False),
                      (f"{b}.mlp.fc1", f"{b}.qact3", False),
                      (f"{b}.mlp.fc2", f"{b}.mlp.qact1", False)]
    return sites


def to_reference_state_dict(variables: dict,
                            model_config: Optional[dict] = None
                            ) -> Dict[str, np.ndarray]:
    """Our {params, quant_stats} -> reference-style flat state_dict.

    ``model_config`` (same keys scripts/quant_train.py persists) selects the
    nonlinearity families and bitwidths used to derive the reference's
    registered buffers; defaults to the all-'ivit', all-8-bit config.
    """
    cfg = dict(model_config or {})
    gelu_t = str(cfg.get("gelu_type", "ivit")).split("_")[0]
    sm_t = str(cfg.get("softmax_type", "ivit")).split("_")[0]
    ln_t = str(cfg.get("layernorm_type", "ivit")).split("_")[0]
    sm_bit = int(cfg.get("softmax_bitwidth", cfg.get("softmax", 8)))
    bits_of = _qact_bits({k.replace("_bitwidth", ""): v
                          for k, v in cfg.items() if isinstance(v, int)})

    params = _flatten(jax.device_get(variables["params"]))
    qstats = _flatten(jax.device_get(variables.get("quant_stats", {})))
    out: Dict[str, np.ndarray] = {}

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

    # --- synthesized QuantAct scales (reference quant_modules.py:361-369) ---
    qact_bases = [k[: -len(".x_min")] for k in out if k.endswith(".x_min")]
    for base in qact_bases:
        out[base + ".act_scaling_factor"] = _sym_scale(
            bits_of(base), out[base + ".x_min"], out[base + ".x_max"])

    def scale_of(base):
        return np.float64(out[base + ".act_scaling_factor"].reshape(-1)[0])

    # --- derived linear/conv integer buffers --------------------------------
    for base, qact, is_conv in _linear_sites(out):
        if qact + ".act_scaling_factor" not in out:
            continue                     # chain unavailable (e.g. swin tree)
        w = out[base + ".weight"]
        flat = w.reshape(w.shape[0], -1)
        w_scale = _sym_scale(8, flat.min(axis=1), flat.max(axis=1))
        w_int = np.clip(np.round(flat / w_scale[:, None]), -128,
                        127).reshape(w.shape)
        out[base + (".conv_scaling_factor" if is_conv else
                    ".fc_scaling_factor")] = w_scale
        out[base + ".weight_integer"] = w_int.astype(np.float32)
        if base + ".bias" in out:
            bias_scale = (w_scale.astype(np.float64) * scale_of(qact)
                          ).astype(np.float32)
            n31 = 2.0**31
            out[base + ".bias_integer"] = np.clip(
                np.round(out[base + ".bias"] / bias_scale), -n31,
                n31 - 1).astype(np.float32)

    # --- attention matmul scale records (quant_modules.py:390-409) ----------
    s_sm = np.float32(2.0 ** (1 - sm_bit))   # softmax out scale, all families
    for key in list(out):
        m = re.match(r"(blocks\.\d+)\.attn\.qact1\.act_scaling_factor$", key)
        if not m:
            continue
        b = m.group(1)
        s_q = out[key].reshape(1).astype(np.float32)
        out[f"{b}.attn.matmul_1.act_scaling_factor"] = s_q * s_q
        out[f"{b}.attn.matmul_2.act_scaling_factor"] = s_sm * s_q

    # --- nonlinearity-family buffers ----------------------------------------
    ln_bases = [k[: -len(".weight")] for k in out
                if k.endswith(".weight") and out[k].ndim == 1
                and re.search(r"(^|\.)norm\d?$", k[: -len(".weight")])]
    if ln_t == "ivit":
        for base in ln_bases:
            gamma = out[base + ".weight"].astype(np.float64)
            beta = out[base + ".bias"].astype(np.float64)
            dim_base = np.sqrt(np.float64(gamma.shape[0])) / 2.0**30
            out[base + ".bias_integer"] = np.floor(
                (beta / gamma) / dim_base).astype(np.float32)
            out[base + ".norm_scaling_factor"] = (
                dim_base * gamma).astype(np.float32)

    for key in list(out):
        m = re.match(r"(blocks\.\d+)\.mlp\.qact_gelu\.act_scaling_factor$",
                     key)
        if not m:
            continue
        b = m.group(1)
        s_g = out[key].reshape(1).astype(np.float32)
        if gelu_t == "ivit":             # ShiftGELU out scale: s_in / 2**7
            out[f"{b}.mlp.act.act_scaling_factor"] = s_g / np.float32(2.0**7)
        elif gelu_t == "ibert":
            out[f"{b}.mlp.act.input_scaling_factor"] = s_g
        if sm_t == "ivit":               # Shiftmax out scale: 1 / 2**(bit-1)
            out[f"{b}.attn.int_softmax.act_scaling_factor"] = np.full(
                (1,), 2.0 ** (1 - sm_bit), np.float32)

    return out


def save_reference_checkpoint(variables: dict, model_config: dict,
                              path: str, **extra):
    """Write a reference-compatible ``.pth.tar`` (requires torch)."""
    import torch

    state = {k: torch.from_numpy(np.array(v, dtype=np.float32, copy=True))
             for k, v in to_reference_state_dict(variables,
                                                 model_config).items()}
    torch.save({"model": state, "model_config": model_config, **extra}, path)
