"""Nonlinearity approximation registry + parameterized-name DSL.

Mirrors ``/root/reference/models/quantization_utils/layer_selection.py``:
string configs like ``"ivit"``, ``"ibert_use-int-sqrt_true"`` or
``"ppoly_deg_2_seg_16_scale-bits_24_backend_ibert_optim-bounds_true"`` resolve
to layer factories with the parsed kwargs baked in.  Names round-trip through
checkpoints (``model_config``) for self-describing reload.
"""

from __future__ import annotations

import functools

from . import layers as L

# name -> (module class, whether ctor takes a `features` positional)
GELU_REGISTRY = {
    "float": L.FloatGELU,
    "ivit": L.IVITGELU,
    "ibert": L.IBERTGELU,
    "ppoly": L.PPolyGELU,
}

SOFTMAX_REGISTRY = {
    "float": L.FloatSoftmax,
    "ivit": L.IVITSoftmax,
    "ibert": L.IBERTSoftmax,
    "ppoly": L.PPolySoftmax,
}

LN_REGISTRY = {
    "float": L.FloatLayerNorm,
    "ivit": L.IVITLayerNorm,
    "ibert": L.IBERTLayerNorm,
}

# kwargs accepted by each family's constructors; unknown parsed keys for a
# given class are dropped (the reference bakes them via setdefault, which
# silently ignores mismatches at construction time)
_LN_TAKES_FEATURES = {L.FloatLayerNorm, L.IVITLayerNorm, L.IBERTLayerNorm}


def parse_layer_name(name: str):
    """``base_arg1_value1_arg2_value2`` -> (base, kwargs).

    Mirrors layer_selection.py:138-179 (hyphens -> underscores, bool/int/float
    coercion).
    """
    parts = name.lower().split("_")
    if len(parts) < 3:
        return name.lower(), {}
    base_name = parts[0]
    params = {}
    i = 1
    while i < len(parts) - 1:
        arg = parts[i].replace("-", "_")
        value_str = parts[i + 1]
        if value_str.lower() in ("true", "false"):
            value = value_str.lower() == "true"
        elif value_str.isdigit():
            value = int(value_str)
        else:
            try:
                value = float(value_str)
            except ValueError:
                value = value_str
        params[arg] = value
        i += 2
    return base_name, params


def _filter_kwargs(cls, kwargs):
    fields = set(cls.__dataclass_fields__)  # linen modules are dataclasses
    return {k: v for k, v in kwargs.items() if k in fields}


def get_gelu(name: str):
    """Return a no-arg factory for the GELU module named by ``name``."""
    base, params = parse_layer_name(name)
    cls = GELU_REGISTRY[base if base in GELU_REGISTRY else name.lower()]
    return functools.partial(cls, **_filter_kwargs(cls, params))


def get_softmax(name: str, output_bit: int = 8):
    """Return a factory taking the softmax output bitwidth baked in."""
    base, params = parse_layer_name(name)
    cls = SOFTMAX_REGISTRY[base if base in SOFTMAX_REGISTRY else name.lower()]
    kwargs = _filter_kwargs(cls, params)
    if "output_bit" in cls.__dataclass_fields__:
        kwargs.setdefault("output_bit", output_bit)
    if "bitwidth" in cls.__dataclass_fields__:
        kwargs.setdefault("bitwidth", output_bit)
    return functools.partial(cls, **kwargs)


def get_layernorm(name: str):
    """Return a factory ``f(features, name=...)`` for the LayerNorm family."""
    base, params = parse_layer_name(name)
    cls = LN_REGISTRY[base if base in LN_REGISTRY else name.lower()]
    return functools.partial(cls, **_filter_kwargs(cls, params))
