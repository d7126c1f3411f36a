from .factories import (  # noqa: F401
    MODEL_REGISTRY,
    deit_base_patch16_224,
    deit_small_patch16_224,
    deit_tiny_patch16_224,
    str2model,
    vit_base_patch16_224,
    vit_large_patch16_224,
)
from .registry import get_gelu, get_layernorm, get_softmax  # noqa: F401
from .vit import BitWidths, VisionTransformer  # noqa: F401
