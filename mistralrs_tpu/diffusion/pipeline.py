"""FLUX text-to-image pipeline — the analog of the reference's FluxStepper
(`diffusion_models/flux/stepper.rs`: CLIP-pooled + T5 conditioning → packed
latents → shifted-schedule Euler denoise → VAE decode → u8 image).

Constructed programmatically from loaded parameter trees (the offline
environment has no hub access); `load_flux_pipeline` assembles one from a
directory holding the BFL transformer/ae safetensors plus HF-format text
encoder dirs."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .flux_model import (
    FluxConfig,
    denoise,
    get_noise,
    get_schedule,
    pack_latents,
    unpack_latents,
)
from .text import ClipTextConfig, T5Config, clip_text_encode, t5_encode
from .vae import AutoencoderConfig, vae_decode


@dataclass
class FluxPipeline:
    cfg: FluxConfig
    params: dict
    vae_cfg: AutoencoderConfig
    vae_params: dict
    t5_cfg: Optional[T5Config] = None
    t5_params: Optional[dict] = None
    clip_cfg: Optional[ClipTextConfig] = None
    clip_params: Optional[dict] = None
    t5_tokenizer: object = None
    clip_tokenizer: object = None

    def encode_prompt(self, prompt: str, t5_len: int = 256, clip_len: int = 77):
        """(t5_emb [1, L, joint_dim], clip_pooled [1, pooled_dim])."""
        if self.t5_params is None or self.clip_params is None:
            raise ValueError("pipeline built without text encoders")
        t5_ids = self.t5_tokenizer.encode(prompt).ids[: t5_len - 1] + [1]  # </s>
        t5_ids = t5_ids + [0] * (t5_len - len(t5_ids))
        txt = t5_encode(
            self.t5_params, self.t5_cfg, jnp.asarray([t5_ids], jnp.int32)
        )
        c_ids = self.clip_tokenizer.encode(prompt).ids[: clip_len]
        c_ids = c_ids + [c_ids[-1]] * (clip_len - len(c_ids))
        _, pooled = clip_text_encode(
            self.clip_params, self.clip_cfg, jnp.asarray([c_ids], jnp.int32)
        )
        return txt, pooled

    def generate(
        self,
        txt: jax.Array,  # [B, L, joint_attention_dim] T5 embeddings
        pooled: jax.Array,  # [B, pooled_projection_dim] CLIP pooled
        *,
        height: int = 1024,
        width: int = 1024,
        num_steps: int = 4,  # schnell default; dev uses ~50
        guidance: Optional[float] = None,  # dev: e.g. 3.5
        seed: int = 0,
    ) -> np.ndarray:
        """→ uint8 image array [B, H, W, 3]."""
        b = txt.shape[0]
        lat = get_noise(jax.random.PRNGKey(seed), b, height, width)
        lat = lat[:, : self.cfg.in_channels // 4]
        img, img_ids = pack_latents(lat)
        txt_ids = jnp.zeros((b, txt.shape[1], 3), jnp.float32)
        shift = (
            img.shape[1] if self.cfg.guidance_embeds else None
        )  # dev: resolution-dependent schedule; schnell: linear
        ts = get_schedule(num_steps, image_seq_len=shift)
        out = denoise(
            self.params, self.cfg, img, img_ids, txt, txt_ids, pooled, ts,
            guidance=guidance,
        )
        z = unpack_latents(out, height, width)
        img = vae_decode(self.vae_params, self.vae_cfg, z)
        img = np.asarray(
            jnp.clip((img + 1.0) * 127.5, 0, 255).astype(jnp.uint8)
        )
        return np.transpose(img, (0, 2, 3, 1))


def _infer_flux_config(sd, override: Optional[FluxConfig]) -> FluxConfig:
    """Depth/dims from the checkpoint; heads from the 128-wide rope axes
    convention unless an override config is given."""
    if override is not None:
        return override
    n_dbl = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("double_blocks.")
    )
    n_sgl = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("single_blocks.")
    )
    hidden, in_ch = sd["img_in.weight"].shape
    return FluxConfig(
        in_channels=in_ch,
        pooled_projection_dim=sd["vector_in.in_layer.weight"].shape[1],
        joint_attention_dim=sd["txt_in.weight"].shape[1],
        num_attention_heads=hidden // 128,
        num_layers=n_dbl,
        num_single_layers=n_sgl,
        guidance_embeds="guidance_in.in_layer.weight" in sd,
        hidden_size=hidden,
    )


def load_flux_pipeline(
    model_dir, dtype=jnp.bfloat16, cfg: Optional[FluxConfig] = None,
    vae_cfg: Optional[AutoencoderConfig] = None,
) -> FluxPipeline:
    """Assemble a pipeline from a directory:
    ``flux1-*.safetensors`` (DiT, BFL names), ``ae.safetensors`` (VAE),
    ``t5/`` and ``clip/`` HF-format text encoder dirs (optional)."""
    import json
    from pathlib import Path

    from safetensors import safe_open

    from .flux_model import load_flux_params
    from .text import clip_text_params_from_state_dict, t5_params_from_state_dict
    from .vae import load_vae_params

    d = Path(model_dir)

    def read_st(path):
        out = {}
        with safe_open(str(path), framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out

    dit_files = sorted(
        p for p in d.glob("flux1-*.safetensors")
    ) or sorted(p for p in d.glob("transformer*.safetensors"))
    if not dit_files:
        raise FileNotFoundError(f"no flux transformer safetensors in {d}")
    sd = {}
    for p in dit_files:
        sd.update(read_st(p))
    cfg = _infer_flux_config(sd, cfg)
    params = load_flux_params(sd, cfg, dtype=dtype)

    vae_sd = read_st(d / "ae.safetensors")
    vae_cfg = vae_cfg or AutoencoderConfig()
    vae_params = load_vae_params(vae_sd, vae_cfg, prefix="decoder.")

    kw = {}
    t5_dir = d / "t5"
    clip_dir = d / "clip"
    if t5_dir.is_dir() and clip_dir.is_dir():
        from tokenizers import Tokenizer

        t5_cfg = T5Config.from_hf(json.load(open(t5_dir / "config.json")))
        clip_cfg = ClipTextConfig.from_hf(json.load(open(clip_dir / "config.json")))
        kw = dict(
            t5_cfg=t5_cfg,
            t5_params=t5_params_from_state_dict(read_st(next(t5_dir.glob("*.safetensors"))), t5_cfg),
            clip_cfg=clip_cfg,
            clip_params=clip_text_params_from_state_dict(
                read_st(next(clip_dir.glob("*.safetensors"))), clip_cfg
            ),
            t5_tokenizer=Tokenizer.from_file(str(t5_dir / "tokenizer.json")),
            clip_tokenizer=Tokenizer.from_file(str(clip_dir / "tokenizer.json")),
        )
    return FluxPipeline(cfg, params, vae_cfg, vae_params, **kw)
