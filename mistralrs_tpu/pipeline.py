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
    # vision-language serving bridge (serving/vlm.py VlmAdapter): set for
    # VLM checkpoints; cfg/weights above are then the TEXT decoder's
    vlm: Optional[Any] = None


# HF model_type → bespoke (config, loader). These archs don't fit the
# unified llama-family decoder: they serve through engine arch adapters.
_SPECIALIZED_ARCHS = ("deepseek_v2", "deepseek_v3", "glm4_moe_lite",
                      "qwen3_next", "lfm2",
                      "mllama", "llama4", "llama4_text", "gemma3n",
                      "gemma3n_text", "gemma4", "gemma4_text")

# vision-language model_types: text decoder serves through the engine,
# vision tower + merge through a serving/vlm.py adapter (the analog of the
# reference's VisionLoaderType registry, vision_models/mod.rs)
_VLM_ARCHS = ("llava", "idefics3", "gemma3", "qwen2_vl", "llama4",
              "voxtral", "mistral3", "llava_next", "idefics2",
              "phi4_multimodal", "lfm2-vl", "lfm2_vl", "qwen3_vl",
              "qwen3_vl_moe", "glm4v", "qwen2_5_vl", "qwen2_5_omni",
              "qwen2_5_omni_thinker", "phi3_v", "minicpmo", "minicpmv",
              "qwen3_5", "qwen3_5_moe", "glm4v_moe", "qwen3_omni_moe")


def _load_vlm(model_type: str, path: Path, dtype, isq):
    import json

    from .models.hf_loader import load_safetensors_dir
    from .serving.vlm import build_adapter

    hf_cfg = json.loads((path / "config.json").read_text())
    sd = load_safetensors_dir(path)
    kw = dict(dtype=dtype, isq=isq)
    if model_type == "llava":
        from .models.llava import LlavaConfig, llava_weights_from_state_dict

        cfg = LlavaConfig.from_hf(hf_cfg)
        weights = llava_weights_from_state_dict(sd, cfg, **kw)
    elif model_type == "idefics3":
        from .models.idefics3 import (
            Idefics3Config,
            idefics3_weights_from_state_dict,
        )

        cfg = Idefics3Config.from_hf(hf_cfg)
        weights = idefics3_weights_from_state_dict(sd, cfg, **kw)
    elif model_type == "gemma3":
        from .models.gemma3_vl import (
            Gemma3VLConfig,
            gemma3_vl_weights_from_state_dict,
        )

        hf_cfg.setdefault(
            "image_token_id", hf_cfg.get("image_token_index", 262144)
        )
        cfg = Gemma3VLConfig.from_hf(hf_cfg)
        weights = gemma3_vl_weights_from_state_dict(sd, cfg, **kw)
    elif model_type == "qwen2_vl":
        from .models.qwen2vl import (
            Qwen2VLConfig,
            qwen2vl_weights_from_state_dict,
        )

        cfg = Qwen2VLConfig.from_hf(hf_cfg)
        weights = qwen2vl_weights_from_state_dict(sd, cfg, **kw)
    elif model_type == "llama4":
        from .models.llama4 import (
            Llama4VLConfig,
            llama4_weights_from_state_dict,
        )

        cfg = Llama4VLConfig.from_hf(hf_cfg)
        weights = llama4_weights_from_state_dict(sd, cfg, dtype=dtype)
    elif model_type == "voxtral":
        from .audio.voxtral import (
            VoxtralConfig,
            voxtral_weights_from_state_dict,
        )

        cfg = VoxtralConfig.from_hf(hf_cfg)
        weights = voxtral_weights_from_state_dict(sd, cfg, **kw)
    elif model_type == "mistral3":
        from .models.mistral3 import (
            Mistral3Config,
            mistral3_weights_from_state_dict,
        )

        cfg = Mistral3Config.from_hf(hf_cfg)
        weights = mistral3_weights_from_state_dict(sd, cfg, **kw)
    elif model_type == "llava_next":
        from .models.llava_next import (
            LlavaNextConfig,
            llava_next_weights_from_state_dict,
        )

        cfg = LlavaNextConfig.from_hf(hf_cfg)
        weights = llava_next_weights_from_state_dict(sd, cfg, **kw)
    elif model_type == "idefics2":
        from .models.idefics2 import (
            Idefics2Config,
            idefics2_weights_from_state_dict,
        )

        cfg = Idefics2Config.from_hf(hf_cfg)
        weights = idefics2_weights_from_state_dict(sd, cfg, **kw)
    elif model_type == "phi4_multimodal":
        from .models.phi4mm import Phi4MMConfig, phi4mm_weights_from_state_dict

        model_type = "phi4mm"
        cfg = Phi4MMConfig.from_hf(hf_cfg)
        weights = phi4mm_weights_from_state_dict(sd, cfg, **kw)
    elif model_type in ("lfm2-vl", "lfm2_vl"):
        from .models.lfm2_vl import Lfm2VlConfig, lfm2_vl_weights_from_state_dict

        model_type = "lfm2_vl"
        cfg = Lfm2VlConfig.from_hf(hf_cfg)
        weights = lfm2_vl_weights_from_state_dict(sd, cfg, dtype=dtype)
    elif model_type in ("qwen3_vl", "qwen3_vl_moe"):
        from .models.qwen3_vl import (
            Qwen3VLConfig,
            qwen3_vl_weights_from_state_dict,
        )

        model_type = "qwen3_vl"
        cfg = Qwen3VLConfig.from_hf(hf_cfg)
        weights = qwen3_vl_weights_from_state_dict(sd, cfg, **kw)
    elif model_type in ("glm4v", "glm4v_moe"):
        from .models.glm4v import Glm4vConfig, glm4v_weights_from_state_dict

        model_type = "glm4v"
        cfg = Glm4vConfig.from_hf(hf_cfg)
        weights = glm4v_weights_from_state_dict(sd, cfg, **kw)
    elif model_type == "qwen2_5_vl":
        from .models.qwen2vl import (
            Qwen25VLConfig,
            qwen25vl_weights_from_state_dict,
        )

        cfg = Qwen25VLConfig.from_hf(hf_cfg)
        weights = qwen25vl_weights_from_state_dict(sd, cfg, **kw)
    elif model_type in ("qwen2_5_omni", "qwen2_5_omni_thinker"):
        from .models.qwen25omni import (
            Qwen25OmniThinkerConfig,
            qwen25omni_weights_from_state_dict,
        )

        model_type = "qwen2_5_omni"
        cfg = Qwen25OmniThinkerConfig.from_hf(hf_cfg)
        weights = qwen25omni_weights_from_state_dict(sd, cfg, **kw)
    elif model_type == "phi3_v":
        from .models.phi3v import Phi3VConfig, phi3v_weights_from_state_dict

        model_type = "phi3v"
        cfg = Phi3VConfig.from_hf(hf_cfg)
        weights = phi3v_weights_from_state_dict(sd, cfg, **kw)
    elif model_type in ("minicpmo", "minicpmv"):
        from .models.minicpmo import (
            MiniCpmOConfig,
            minicpmo_weights_from_state_dict,
        )

        model_type = "minicpmo"
        cfg = MiniCpmOConfig.from_hf(hf_cfg)
        weights = minicpmo_weights_from_state_dict(sd, cfg, **kw)
    elif model_type in ("qwen3_5", "qwen3_5_moe"):
        from .models.qwen3_5 import Qwen35Config, qwen3_5_weights_from_state_dict

        model_type = "qwen3_5"
        cfg = Qwen35Config.from_hf(hf_cfg)
        weights = qwen3_5_weights_from_state_dict(sd, cfg, dtype=dtype)
    elif model_type == "qwen3_omni_moe":
        from .models.qwen3omni import (
            Qwen3OmniThinkerConfig,
            qwen3omni_weights_from_state_dict,
        )

        cfg = Qwen3OmniThinkerConfig.from_hf(hf_cfg)
        weights = qwen3omni_weights_from_state_dict(sd, cfg, **kw)
    else:
        raise ValueError(f"unhandled VLM arch {model_type!r}")
    adapter = build_adapter(model_type, weights, cfg, compute_dtype=dtype)
    return cfg, weights, adapter, hf_cfg


def _load_specialized(model_type: str, path: Path, dtype):
    import json

    import numpy as np

    from .models.hf_loader import load_safetensors_dir

    hf_cfg = json.loads((path / "config.json").read_text())
    sd = load_safetensors_dir(path)
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    if model_type in ("deepseek_v2", "deepseek_v3", "glm4_moe_lite"):
        # glm4_moe_lite (reference models/glm4_moe_lite.rs:47) IS the
        # DeepSeek family: MLA attention + sigmoid noaux-tc group-limited
        # routing with e_score_correction_bias — one shared implementation
        from .models.deepseek import (
            DeepseekConfig,
            deepseek_weights_from_state_dict,
        )

        cfg = DeepseekConfig.from_hf(hf_cfg)
        return cfg, deepseek_weights_from_state_dict(sd, cfg, absorbed=True)
    if model_type == "qwen3_next":
        from .models.qwen3next import (
            Qwen3NextConfig,
            qwen3next_weights_from_state_dict,
        )

        cfg = Qwen3NextConfig.from_hf(hf_cfg)
        return cfg, qwen3next_weights_from_state_dict(sd, cfg)
    if model_type == "lfm2":
        from .models.lfm2 import Lfm2Config, lfm2_weights_from_state_dict

        cfg = Lfm2Config.from_hf(hf_cfg)
        return cfg, lfm2_weights_from_state_dict(sd, cfg)
    if model_type == "mllama":
        from .models.mllama import MllamaConfig, mllama_weights_from_state_dict

        cfg = MllamaConfig.from_hf(hf_cfg)
        return cfg, mllama_weights_from_state_dict(sd, cfg)
    if model_type in ("llama4", "llama4_text"):
        from .models.llama4 import (
            Llama4Config,
            llama4_text_weights_from_state_dict,
        )

        cfg = Llama4Config.from_hf(hf_cfg)
        return cfg, llama4_text_weights_from_state_dict(sd, cfg)
    if model_type in ("gemma4", "gemma4_text"):
        from .models.gemma4 import Gemma4Config, gemma4_weights_from_state_dict

        cfg = Gemma4Config.from_hf(hf_cfg)
        return cfg, gemma4_weights_from_state_dict(sd, cfg)
    if model_type in ("gemma3n", "gemma3n_text"):
        from .models.gemma3n import (
            Gemma3nConfig,
            gemma3n_weights_from_state_dict,
        )

        cfg = Gemma3nConfig.from_hf(hf_cfg)
        return cfg, gemma3n_weights_from_state_dict(sd, cfg)
    raise ValueError(f"unhandled specialized arch {model_type!r}")


def _maybe_gemma3n_vision(path, cfg, weights, hf_cfg, dtype):
    """Build the gemma3n image VlmAdapter when the checkpoint carries the
    MobileNetV5 tower (`model.vision_tower.timm_model.*` keys)."""
    from .models.hf_loader import load_safetensors_dir

    sd = load_safetensors_dir(path)
    if not any(k.startswith("model.vision_tower.timm_model.") for k in sd):
        return None
    from .serving.vlm import gemma3n_image_adapter
    from .vision.mobilenetv5 import (
        gemma3n_vision_embedder_from_state_dict,
        mobilenetv5_weights_from_state_dict,
    )

    vision_weights = mobilenetv5_weights_from_state_dict(sd, dtype=dtype)
    embedder = gemma3n_vision_embedder_from_state_dict(sd, dtype=dtype)
    tcfg = getattr(cfg, "text", None) or cfg
    return gemma3n_image_adapter(
        weights, tcfg, vision_weights, embedder,
        image_token_id=int(hf_cfg.get("image_token_id", 262145)),
        image_size=int(
            (hf_cfg.get("vision_config") or {}).get("image_size", 768)
        ),
        compute_dtype=dtype,
    )


def make_adapter(cfg, weights, compute_dtype=jnp.float32):
    """Build the engine arch adapter for a specialized config, or None for
    the unified llama-family decoder (which serves natively)."""
    from .engine.adapters import (
        DeepseekAdapter,
        Gemma3nAdapter,
        Gemma4Adapter,
        Lfm2Adapter,
        Llama4Adapter,
        MllamaAdapter,
        Qwen3NextAdapter,
    )
    from .models.deepseek import DeepseekConfig
    from .models.gemma3n import Gemma3nConfig
    from .models.gemma4 import Gemma4Config
    from .models.lfm2 import Lfm2Config
    from .models.llama4 import Llama4Config
    from .models.mllama import MllamaConfig
    from .models.qwen3next import Qwen3NextConfig

    if isinstance(cfg, Gemma3nConfig):
        return Gemma3nAdapter(cfg, weights, compute_dtype=compute_dtype)
    if isinstance(cfg, Gemma4Config):
        return Gemma4Adapter(cfg, weights, compute_dtype=compute_dtype)
    if isinstance(cfg, DeepseekConfig):
        return DeepseekAdapter(cfg, weights, compute_dtype=compute_dtype)
    if isinstance(cfg, Qwen3NextConfig):
        return Qwen3NextAdapter(cfg, weights, compute_dtype=compute_dtype)
    if isinstance(cfg, Lfm2Config):
        return Lfm2Adapter(cfg, weights, compute_dtype=compute_dtype)
    if isinstance(cfg, MllamaConfig):
        return MllamaAdapter(cfg, weights, compute_dtype=compute_dtype)
    if isinstance(cfg, Llama4Config):
        return Llama4Adapter(cfg, weights, compute_dtype=compute_dtype)
    return None


def load_pipeline(
    model_path: str,
    *,
    isq: Optional[str | GGMLType] = None,
    dtype=jnp.bfloat16,
    chat_template_override: Optional[str] = None,
    tp: int = 1,
    from_uqff: Optional[str] = None,
    imatrix: Optional[str] = None,  # .npz path from the calibration flow
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
        import json

        cfg_file = path / "config.json"
        model_type = ""
        if cfg_file.exists():
            model_type = json.loads(cfg_file.read_text()).get("model_type", "")
        _cfg_probe = json.loads(cfg_file.read_text()) if cfg_file.exists() else {}
        if model_type in _VLM_ARCHS and (
            "vision_config" in _cfg_probe or "audio_config" in _cfg_probe
            or "thinker_config" in _cfg_probe
            or "img_processor" in _cfg_probe  # phi3_v layout
        ):
            cfg, weights, vlm, hf_cfg = _load_vlm(model_type, path, dtype, isq_t)
            try:
                tokenizer = from_hf_dir(path)
            except FileNotFoundError:
                tokenizer = None
            ct = resolve_chat_template(
                override=chat_template_override, hf_dir=path, arch=model_type,
            )
            # llama4's engine config is the Llama4Config (served via its
            # arch adapter); plain VLMs use the text ModelConfig directly
            pipe_cfg = getattr(cfg, "llm", None) or cfg.text
            return Pipeline(
                pipe_cfg, weights["text"], tokenizer, ct, path.name, hf_cfg,
                vlm=vlm,
            )
        if model_type in _SPECIALIZED_ARCHS:
            # specialized families (MLA / GDN / conv hybrids) have bespoke
            # configs + forwards and serve via engine arch adapters
            # (engine/adapters.py) — the analog of the reference's per-arch
            # Pipeline impls (mistralrs-core/src/pipeline/normal.rs)
            cfg, weights = _load_specialized(model_type, path, dtype)
            try:
                tokenizer = from_hf_dir(path)
            except FileNotFoundError:
                tokenizer = None
            ct = resolve_chat_template(
                override=chat_template_override, hf_dir=path,
                arch=model_type,
            )
            hf_cfg = json.loads(cfg_file.read_text())
            vlm = None
            if model_type == "gemma3n":
                vlm = _maybe_gemma3n_vision(path, cfg, weights, hf_cfg, dtype)
            return Pipeline(cfg, weights, tokenizer, ct, path.name, hf_cfg,
                            vlm=vlm)
        im = None
        if imatrix is not None:
            from .imatrix import load_imatrix

            im = load_imatrix(imatrix)
        cfg, weights, hf_cfg = load_hf_model(
            path, dtype=dtype, isq=isq_t, from_uqff=from_uqff, imatrix=im
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
