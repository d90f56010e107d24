"""CLIP/SigLIP vision tower (ViT) — the analog of the reference's
`mistralrs-core/src/vision_models/{clip,siglip}.rs`.

One functional implementation covers both families:
* CLIP (llava): class token, pre-layernorm, quick-gelu, feature layer −2,
  CLS dropped by the consumer;
* SigLIP (gemma3/idefics-style): no class token, gelu_pytorch_tanh, final
  post-layernorm output.

The patch conv is expressed as an unfold + matmul (MXU-shaped; identical
math to conv2d with stride = patch)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import layer_norm


@dataclass(frozen=True)
class VisionConfig:
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    image_size: int
    patch_size: int
    hidden_act: str = "quick_gelu"  # clip | "gelu_pytorch_tanh" (siglip)
    layer_norm_eps: float = 1e-5
    use_class_token: bool = True  # CLIP yes, SigLIP no
    pre_layernorm: bool = True  # CLIP yes, SigLIP no
    # phi4mm's vision attention sets is_causal=True, so HF's sdpa path runs
    # the tower CAUSALLY whenever the patch mask is full — checkpoint
    # behavior, so we reproduce it
    causal: bool = False

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + (1 if self.use_class_token else 0)

    @classmethod
    def from_hf(cls, d: Mapping[str, Any], family: str = "clip") -> "VisionConfig":
        siglip = family == "siglip"
        return cls(
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_layers=d["num_hidden_layers"],
            num_heads=d["num_attention_heads"],
            image_size=d["image_size"],
            patch_size=d["patch_size"],
            hidden_act=d.get(
                "hidden_act", "gelu_pytorch_tanh" if siglip else "quick_gelu"
            ),
            layer_norm_eps=d.get("layer_norm_eps", 1e-6 if siglip else 1e-5),
            use_class_token=not siglip,
            pre_layernorm=not siglip,
        )


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name in ("gelu_pytorch_tanh", "gelu_new"):
        return lambda x: jax.nn.gelu(x, approximate=True)
    return lambda x: jax.nn.gelu(x, approximate=False)


def _patchify(pixel_values: jax.Array, p: int) -> jax.Array:
    """[B, 3, H, W] → [B, n_patches, 3*p*p] (conv2d-stride-p unfold)."""
    b, c, h, w = pixel_values.shape
    x = pixel_values.reshape(b, c, h // p, p, w // p, p)
    x = jnp.transpose(x, (0, 2, 4, 1, 3, 5))  # [B, H/p, W/p, C, p, p]
    return x.reshape(b, (h // p) * (w // p), c * p * p)


def vision_tower_forward(
    weights: dict,
    cfg: VisionConfig,
    pixel_values: Optional[jax.Array],  # [B, 3, H, W]
    *,
    feature_layer: int = -1,  # hidden-state index (−2 = llava default)
    compute_dtype=jnp.float32,
    inputs_embeds: Optional[jax.Array] = None,  # [B, seq, H]: skip embedding
) -> jax.Array:
    """Returns hidden states [B, seq, H] of the requested layer output.

    `inputs_embeds` bypasses the patch/pos embedding stage entirely — for
    naflex-style variants (siglip2) whose embedding the caller computes."""
    if inputs_embeds is not None:
        h = inputs_embeds.astype(compute_dtype)
    else:
        x = _patchify(pixel_values.astype(compute_dtype), cfg.patch_size)
        h = x @ weights["patch_embed"].astype(compute_dtype)  # [B, np, H]
        if "patch_bias" in weights:
            h = h + weights["patch_bias"].astype(compute_dtype)
        if cfg.use_class_token:
            cls = jnp.broadcast_to(
                weights["class_embed"].astype(compute_dtype)[None, None, :],
                (h.shape[0], 1, cfg.hidden_size),
            )
            h = jnp.concatenate([cls, h], axis=1)
        h = h + weights["pos_embed"].astype(compute_dtype)[None]
    if cfg.pre_layernorm:
        h = layer_norm(
            h, weights["pre_ln"], weights.get("pre_ln_bias"), cfg.layer_norm_eps
        )

    act = _act(cfg.hidden_act)
    n_layers = cfg.num_layers
    # hidden_states[i] = input to layer i; hidden_states[n] = final
    target = feature_layer if feature_layer >= 0 else n_layers + 1 + feature_layer

    def attn(h, lw):
        b, t, d = h.shape
        nh = cfg.num_heads
        hd = d // nh
        q = (h @ lw["wq"].T + lw["wq_b"]).reshape(b, t, nh, hd)
        k = (h @ lw["wk"].T + lw["wk_b"]).reshape(b, t, nh, hd)
        v = (h @ lw["wv"].T + lw["wv_b"]).reshape(b, t, nh, hd)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd).astype(h.dtype)
        if cfg.causal:
            tri = jnp.tril(jnp.ones((t, t), bool))
            s = jnp.where(tri[None, None], s, jnp.finfo(s.dtype).min)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(h.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, t, d)
        return o @ lw["wo"].T + lw["wo_b"]

    def layer(h, lw):
        r = h
        h = layer_norm(h, lw["ln1"], lw["ln1_b"], cfg.layer_norm_eps)
        h = r + attn(h, lw)
        r = h
        h = layer_norm(h, lw["ln2"], lw["ln2_b"], cfg.layer_norm_eps)
        h = r + (act(h @ lw["fc1"].T + lw["fc1_b"]) @ lw["fc2"].T + lw["fc2_b"])
        return h

    # python loop: vision towers are shallow and run once per image
    out = h if target == 0 else None
    for i in range(n_layers):
        h = layer(h, jax.tree_util.tree_map(lambda w: w[i], weights["layers"]))
        if target == i + 1:
            out = h
    if out is None:
        out = h
    # SigLIP applies a final post-layernorm to the last hidden state; CLIP's
    # post LN only touches the pooled CLS path, which consumers here skip.
    if "post_ln" in weights and target >= n_layers and not cfg.use_class_token:
        out = layer_norm(
            out, weights["post_ln"], weights.get("post_ln_bias"), cfg.layer_norm_eps
        )
    return out


def vision_weights_from_hf(
    sd: Mapping[str, np.ndarray], prefix: str, cfg: VisionConfig, dtype=jnp.float32
) -> dict:
    """Map a HF CLIPVisionModel/SiglipVisionModel state dict subtree."""
    def g(name):
        return np.asarray(sd[prefix + name], np.float32)

    embed_prefix = "vision_model.embeddings."
    enc_prefix = "vision_model.encoder.layers."
    patch_w = g(embed_prefix + "patch_embedding.weight")  # [H, 3, p, p]
    out: dict = {
        "patch_embed": jnp.asarray(
            patch_w.reshape(patch_w.shape[0], -1).T, dtype
        ),  # [3*p*p, H]
        "pos_embed": jnp.asarray(g(embed_prefix + "position_embedding.weight"), dtype),
    }
    # SigLIP-family towers carry a patch-conv bias (HF test-fixture init
    # zeroes it, so parity tests pass either way — real checkpoints don't);
    # CLIP's patch conv is bias-free.
    if prefix + embed_prefix + "patch_embedding.bias" in sd:
        out["patch_bias"] = jnp.asarray(g(embed_prefix + "patch_embedding.bias"), dtype)
    if cfg.use_class_token:
        out["class_embed"] = jnp.asarray(g(embed_prefix + "class_embedding"), dtype)
    if cfg.pre_layernorm:
        out["pre_ln"] = jnp.asarray(g("vision_model.pre_layrnorm.weight"), dtype)
        out["pre_ln_bias"] = jnp.asarray(g("vision_model.pre_layrnorm.bias"), dtype)
    if prefix + "vision_model.post_layernorm.weight" in sd:
        out["post_ln"] = jnp.asarray(g("vision_model.post_layernorm.weight"), dtype)
        out["post_ln_bias"] = jnp.asarray(g("vision_model.post_layernorm.bias"), dtype)

    keys = {
        "wq": "self_attn.q_proj.weight", "wq_b": "self_attn.q_proj.bias",
        "wk": "self_attn.k_proj.weight", "wk_b": "self_attn.k_proj.bias",
        "wv": "self_attn.v_proj.weight", "wv_b": "self_attn.v_proj.bias",
        "wo": "self_attn.out_proj.weight", "wo_b": "self_attn.out_proj.bias",
        "ln1": "layer_norm1.weight", "ln1_b": "layer_norm1.bias",
        "ln2": "layer_norm2.weight", "ln2_b": "layer_norm2.bias",
        "fc1": "mlp.fc1.weight", "fc1_b": "mlp.fc1.bias",
        "fc2": "mlp.fc2.weight", "fc2_b": "mlp.fc2.bias",
    }
    layers = {
        k: jnp.asarray(
            np.stack([g(f"{enc_prefix}{i}.{suffix}") for i in range(cfg.num_layers)]),
            dtype,
        )
        for k, suffix in keys.items()
    }
    out["layers"] = layers
    return out
