"""Vision/multimodal support (the analog of `mistralrs-vision/` transforms +
`mistralrs-core/src/vision_models/` towers)."""

from .clip import VisionConfig, vision_tower_forward, vision_weights_from_hf
from .transforms import preprocess_image

__all__ = [
    "VisionConfig",
    "vision_tower_forward",
    "vision_weights_from_hf",
    "preprocess_image",
]
