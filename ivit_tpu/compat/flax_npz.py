"""Google/Flax ViT ``.npz`` pretrained-weight ingestion.

Counterpart of the reference's ``load_weights_from_npz``
(``/root/reference/models/utils.py:10-163``), which maps the official
``vision_transformer`` checkpoints (AugReg ViT-B/L) into the model.  Because
this framework already uses Flax conventions ([in, out] kernels, HWIO
convs), the mapping is mostly transpose-free; the qkv projection
concatenates query/key/value kernels on the output axis and the positional
embedding is bicubic-resized when grids differ (``resize_pos_embed``,
models/utils.py:78-99).
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import numpy as np


def resize_pos_embed(posemb: np.ndarray, ntok_new: int,
                     num_tokens: int = 1) -> np.ndarray:
    """Bicubic grid resize of [1, N_old, C] -> [1, ntok_new, C]."""
    import jax.numpy as jnp

    tok, grid = posemb[:, :num_tokens], posemb[0, num_tokens:]
    gs_old = int(math.sqrt(len(grid)))
    gs_new = int(math.sqrt(ntok_new - num_tokens))
    grid = grid.reshape(gs_old, gs_old, -1)
    grid = np.asarray(jax.image.resize(
        jnp.asarray(grid), (gs_new, gs_new, grid.shape[-1]),
        method="bicubic"))
    grid = grid.reshape(1, gs_new * gs_new, -1)
    return np.concatenate([tok, grid], axis=1)


def convert_npz(npz, depth: int, num_patches: int,
                prefix: str = "") -> Dict[str, dict]:
    """npz mapping -> our VisionTransformer params subtree (numpy)."""
    w = dict(npz)
    if not prefix and "opt/target/embedding/kernel" in w:
        prefix = "opt/target/"

    def g(name):
        return np.asarray(w[prefix + name], np.float32)

    params: Dict[str, dict] = {}
    params["patch_embed"] = {"proj": {
        "kernel": g("embedding/kernel"),          # [kh,kw,cin,D] HWIO direct
        "bias": g("embedding/bias"),
    }}
    params["cls_token"] = g("cls")
    pos = g("Transformer/posembed_input/pos_embedding")
    if pos.shape[1] != num_patches + 1:
        pos = resize_pos_embed(pos, num_patches + 1)
    params["pos_embed"] = pos
    params["norm"] = {"weight": g("Transformer/encoder_norm/scale"),
                      "bias": g("Transformer/encoder_norm/bias")}
    if prefix + "head/kernel" in w:
        params["head"] = {"kernel": g("head/kernel"),
                          "bias": g("head/bias")}

    for i in range(depth):
        bp = f"Transformer/encoderblock_{i}/"
        mha = bp + "MultiHeadDotProductAttention_1/"
        c = g(mha + "query/kernel").shape[0]
        qkv_kernel = np.concatenate(
            [g(mha + f"{n}/kernel").reshape(c, -1)
             for n in ("query", "key", "value")], axis=1)   # [C, 3C]
        qkv_bias = np.concatenate(
            [g(mha + f"{n}/bias").reshape(-1)
             for n in ("query", "key", "value")])
        out_kernel = g(mha + "out/kernel").reshape(-1, c)    # [(H*Dh), C]
        params[f"blocks_{i}"] = {
            "norm1": {"weight": g(bp + "LayerNorm_0/scale"),
                      "bias": g(bp + "LayerNorm_0/bias")},
            "norm2": {"weight": g(bp + "LayerNorm_2/scale"),
                      "bias": g(bp + "LayerNorm_2/bias")},
            "attn": {
                "qkv": {"kernel": qkv_kernel, "bias": qkv_bias},
                "proj": {"kernel": out_kernel,
                         "bias": g(mha + "out/bias")},
            },
            "mlp": {
                "fc1": {"kernel": g(bp + "MlpBlock_3/Dense_0/kernel"),
                        "bias": g(bp + "MlpBlock_3/Dense_0/bias")},
                "fc2": {"kernel": g(bp + "MlpBlock_3/Dense_1/kernel"),
                        "bias": g(bp + "MlpBlock_3/Dense_1/bias")},
            },
        }
    return params


def load_npz_into_model(model, path: str, sample_input, rng_key=None,
                        strict: bool = True):
    """Load a Google ViT .npz into ``model``'s variables (float pretrained
    start for QAT; quant_stats keep their fresh init)."""
    import jax.numpy as jnp

    from .torch_ckpt import _merge_into

    npz = np.load(path)
    params_in = convert_npz(npz, model.depth, model.num_patches
                            if hasattr(model, "num_patches")
                            else (model.img_size // model.patch_size) ** 2)
    rng_key = rng_key if rng_key is not None else jax.random.PRNGKey(0)
    template = jax.device_get(
        model.init({"params": rng_key}, sample_input, running_stat=True))
    params, matched, missing = _merge_into(template["params"], params_in)
    if strict:
        # the head may legitimately be absent (feature-extractor npz)
        missing = [m for m in missing if not m.startswith("head")]
        if missing:
            raise ValueError(f"npz missing leaves: {missing}")
    return ({"params": jax.tree.map(jnp.asarray, params),
             "quant_stats": template["quant_stats"]},
            {"matched": matched, "missing": missing})
