from .factories import (  # noqa: F401
    MODEL_REGISTRY,
    swin_base_patch4_window7_224,
    swin_small_patch4_window7_224,
    swin_tiny_patch4_window7_224,
    deit_base_patch16_224,
    deit_small_patch16_224,
    deit_tiny_patch16_224,
    str2model,
    vit_base_patch16_224,
    vit_large_patch16_224,
)
from .registry import get_gelu, get_layernorm, get_softmax  # noqa: F401
from .swin import SwinTransformer  # noqa: F401
from .vit import BitWidths, VisionTransformer  # noqa: F401
