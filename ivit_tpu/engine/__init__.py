from .freeze import EngineConfig, EngineSpec, freeze_model  # noqa: F401
from .vit_int import Engine, engine_forward  # noqa: F401
