"""Image preprocessing (the analog of `mistralrs-vision/src/`: resize, pad,
normalize, tensorize — CLIP/SigLIP conventions)."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_image(
    image,
    size: int = 336,
    mean: Sequence[float] = CLIP_MEAN,
    std: Sequence[float] = CLIP_STD,
    resample: str = "bicubic",
) -> np.ndarray:
    """PIL image / HWC uint8 array → normalized [3, size, size] float32."""
    try:
        from PIL import Image

        if isinstance(image, np.ndarray):
            image = Image.fromarray(image.astype(np.uint8))
        image = image.convert("RGB")
        filt = {
            "bicubic": Image.BICUBIC,
            "bilinear": Image.BILINEAR,
            "nearest": Image.NEAREST,
        }[resample]
        # CLIP: resize shortest edge then center crop
        w, h = image.size
        scale = size / min(w, h)
        image = image.resize((round(w * scale), round(h * scale)), filt)
        w, h = image.size
        left, top = (w - size) // 2, (h - size) // 2
        image = image.crop((left, top, left + size, top + size))
        arr = np.asarray(image, np.float32) / 255.0
    except ImportError:  # PIL-free fallback: nearest resize of an array
        arr = np.asarray(image, np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
        h, w = arr.shape[:2]
        yi = (np.arange(size) * h // size).clip(0, h - 1)
        xi = (np.arange(size) * w // size).clip(0, w - 1)
        arr = arr[yi][:, xi]
    arr = (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    return arr.transpose(2, 0, 1).copy()
