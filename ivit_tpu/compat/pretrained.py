"""Pretrained float-checkpoint ingestion by model name (URL or local file).

The reference's factories download timm/DeiT ``.pth`` checkpoints via
``torch.hub.load_state_dict_from_url`` and Google ViT ``.npz`` (Flax)
files (``/root/reference/models/vit_quant.py:315-406``).  This module is
the framework-side equivalent: ``load_pretrained(model, name, x)`` fetches
(or reuses a cached / explicitly supplied file) and merges the float
weights into the QAT model's variable tree — QuantAct statistics keep
their fresh init, ready for calibration.

Offline environments: pass ``local_path`` (any already-downloaded file) or
pre-seed ``cache_dir``; a download failure raises a clear error instead of
hanging.
"""

from __future__ import annotations

import os
import urllib.error
import urllib.request

# name -> (url, kind); urls from /root/reference/models/vit_quant.py:326-405
PRETRAINED_URLS = {
    "deit_tiny_patch16_224": (
        "https://dl.fbaipublicfiles.com/deit/"
        "deit_tiny_patch16_224-a1311bcf.pth", "torch"),
    "deit_small_patch16_224": (
        "https://dl.fbaipublicfiles.com/deit/"
        "deit_small_patch16_224-cd65a155.pth", "torch"),
    "deit_base_patch16_224": (
        "https://dl.fbaipublicfiles.com/deit/"
        "deit_base_patch16_224-b5f2ef4d.pth", "torch"),
    "vit_base_patch16_224": (
        "https://storage.googleapis.com/vit_models/augreg/"
        "B_16-i21k-300ep-lr_0.001-aug_medium1-wd_0.1-do_0.0-sd_0.0"
        "--imagenet2012-steps_20k-lr_0.01-res_224.npz", "npz"),
    "vit_large_patch16_224": (
        "https://storage.googleapis.com/vit_models/augreg/"
        "L_16-i21k-300ep-lr_0.001-aug_medium1-wd_0.1-do_0.1-sd_0.1"
        "--imagenet2012-steps_20k-lr_0.01-res_224.npz", "npz"),
}


def _default_cache_dir():
    return os.path.join(os.environ.get("XDG_CACHE_HOME",
                                       os.path.expanduser("~/.cache")),
                        "ivit_tpu", "pretrained")


def fetch_pretrained(name: str, cache_dir: str = None,
                     timeout: float = 60.0) -> str:
    """Download (or reuse the cached copy of) the named checkpoint.

    Returns the local file path.  Raises ``RuntimeError`` with a clear
    message on network failure (zero-egress environments: supply the file
    via ``load_pretrained(..., local_path=...)`` instead).
    """
    if name not in PRETRAINED_URLS:
        raise KeyError(f"no pretrained URL for {name!r}; known: "
                       f"{sorted(PRETRAINED_URLS)}")
    url, _ = PRETRAINED_URLS[name]
    cache_dir = cache_dir or _default_cache_dir()
    os.makedirs(cache_dir, exist_ok=True)
    dest = os.path.join(cache_dir, os.path.basename(url))
    if os.path.exists(dest):
        return dest
    tmp = dest + ".part"
    try:
        with urllib.request.urlopen(url, timeout=timeout) as r, \
                open(tmp, "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        os.replace(tmp, dest)
    except (urllib.error.URLError, OSError) as e:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise RuntimeError(
            f"could not download {url}: {e}. Offline? Download it "
            f"elsewhere and pass local_path= (or drop it at {dest}).") from e
    return dest


def load_pretrained(model, name: str, sample_input, *, local_path=None,
                    cache_dir=None, rng_key=None, strict: bool = False):
    """Merge the named pretrained float checkpoint into ``model``.

    Returns ``(variables, report)`` like the underlying loaders.  ``strict``
    defaults to False: float checkpoints legitimately lack every
    quantization buffer (they keep their fresh init — run calibration
    next), and classifier heads may be differently sized.
    """
    if name not in PRETRAINED_URLS:
        raise KeyError(f"no pretrained mapping for {name!r}")
    _, kind = PRETRAINED_URLS[name]
    path = local_path or fetch_pretrained(name, cache_dir)
    if kind == "npz":
        from .flax_npz import load_npz_into_model
        return load_npz_into_model(model, path, sample_input,
                                   rng_key=rng_key, strict=strict)
    from .torch_ckpt import load_into_model
    return load_into_model(model, path, sample_input, rng_key=rng_key,
                           strict=strict)
