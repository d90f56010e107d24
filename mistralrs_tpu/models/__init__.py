"""Model library (the analog of `mistralrs-core/src/models/`)."""

from .config import ModelConfig, config_from_gguf, config_from_hf
from .llama import KVCache, forward, init_random_weights

__all__ = [
    "ModelConfig",
    "config_from_gguf",
    "config_from_hf",
    "KVCache",
    "forward",
    "init_random_weights",
]
