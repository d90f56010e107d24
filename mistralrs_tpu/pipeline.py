"""Model pipeline assembly: auto-detect format → load weights + tokenizer +
chat template (the analog of the reference's `AutoLoader`
`mistralrs-core/src/pipeline/auto.rs:31` + `NormalPipeline`/GGUF pipeline
construction)."""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any, Optional

import jax.numpy as jnp

from .chat_template import ChatTemplate, resolve_chat_template
from .gguf.constants import GGMLType
from .models.config import ModelConfig
from .models.gguf_loader import load_gguf_model
from .models.hf_loader import load_hf_model
from .tokenizer import TokenizerWrapper, from_gguf_metadata, from_hf_dir

ISQ_NAMES = {
    "q4k": GGMLType.Q4_K,
    "q4_k": GGMLType.Q4_K,
    "q5k": GGMLType.Q5_K,
    "q5_k": GGMLType.Q5_K,
    "q6k": GGMLType.Q6_K,
    "q6_k": GGMLType.Q6_K,
    "q8_0": GGMLType.Q8_0,
    "q8": GGMLType.Q8_0,
    "q4_0": GGMLType.Q4_0,
    "q5_0": GGMLType.Q5_0,
}


def parse_isq(name: Optional[str]) -> Optional[GGMLType]:
    if name is None:
        return None
    key = name.strip().lower()
    if key in ("none", ""):
        return None
    if key not in ISQ_NAMES:
        raise ValueError(f"unknown ISQ type {name!r}; supported: {sorted(ISQ_NAMES)}")
    return ISQ_NAMES[key]


@dataclass
class Pipeline:
    cfg: ModelConfig
    weights: dict
    tokenizer: Optional[TokenizerWrapper]
    chat_template: ChatTemplate
    model_id: str
    metadata: dict[str, Any]


def load_pipeline(
    model_path: str,
    *,
    isq: Optional[str | GGMLType] = None,
    dtype=jnp.bfloat16,
    chat_template_override: Optional[str] = None,
    tp: int = 1,
) -> Pipeline:
    """Load a model from a GGUF file or HF-format directory."""
    path = Path(model_path)
    isq_t = parse_isq(isq) if isinstance(isq, str) else isq
    if path.is_file() and path.suffix == ".uqff":
        from .uqff import load_uqff

        cfg, weights = load_uqff(str(path))
        ct = resolve_chat_template(override=chat_template_override, arch=cfg.arch)
        return Pipeline(cfg, weights, None, ct, path.stem, {})
    if path.is_file() and path.suffix == ".gguf":
        cfg, weights, md = load_gguf_model(str(path), dtype=dtype)
        try:
            tokenizer = from_gguf_metadata(md)
        except (KeyError, NotImplementedError):
            tokenizer = None
        ct = resolve_chat_template(
            override=chat_template_override,
            gguf_metadata=md,
            arch=cfg.arch,
        )
        return Pipeline(cfg, weights, tokenizer, ct, path.stem, md)
    if path.is_dir():
        cfg, weights, hf_cfg = load_hf_model(
            path, dtype=dtype, isq=isq_t
        )
        try:
            tokenizer = from_hf_dir(path)
        except FileNotFoundError:
            tokenizer = None
        ct = resolve_chat_template(
            override=chat_template_override, hf_dir=path, arch=cfg.arch
        )
        return Pipeline(cfg, weights, tokenizer, ct, path.name, hf_cfg)
    raise FileNotFoundError(
        f"model path {model_path!r}: not a .gguf/.uqff file or a directory"
    )
