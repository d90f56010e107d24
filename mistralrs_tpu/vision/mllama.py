"""Mllama (Llama 3.2 Vision) tiled vision tower — the analog of the
reference's `mistralrs-core/src/vision_models/mllama/vision.rs`.

Images are split into up to `max_num_tiles` tiles by aspect ratio; each
tile is patch-embedded, gets gated tile/position embeddings, runs through
a local transformer (per-tile attention), then a gated global transformer
over all tiles. The output concatenates the final hidden state with
selected intermediate layer states (`intermediate_layers_indices`) into
`vision_output_dim` channels for the text model's cross-attention.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class MllamaVisionConfig:
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_global_layers: int
    num_heads: int
    image_size: int
    patch_size: int
    max_num_tiles: int
    intermediate_layers_indices: tuple[int, ...]
    vision_output_dim: int
    norm_eps: float = 1e-5
    supported_aspect_ratios: tuple[tuple[int, int], ...] = ((1, 1),)

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "MllamaVisionConfig":
        return cls(
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_layers=d["num_hidden_layers"],
            num_global_layers=d["num_global_layers"],
            num_heads=d["attention_heads"],
            image_size=d["image_size"],
            patch_size=d["patch_size"],
            max_num_tiles=d["max_num_tiles"],
            intermediate_layers_indices=tuple(d["intermediate_layers_indices"]),
            vision_output_dim=d["vision_output_dim"],
            norm_eps=d.get("norm_eps", 1e-5),
            supported_aspect_ratios=tuple(
                tuple(r) for r in d.get("supported_aspect_ratios", [[1, 1]])
            ),
        )

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1


def _layer_params(sd, pref, n, dtype):
    out = []
    for i in range(n):
        p = f"{pref}.layers.{i}."
        lw = {
            "wq": jnp.asarray(sd[p + "self_attn.q_proj.weight"], dtype),
            "wk": jnp.asarray(sd[p + "self_attn.k_proj.weight"], dtype),
            "wv": jnp.asarray(sd[p + "self_attn.v_proj.weight"], dtype),
            "wo": jnp.asarray(sd[p + "self_attn.o_proj.weight"], dtype),
            "fc1": jnp.asarray(sd[p + "mlp.fc1.weight"], dtype),
            "fc1_b": jnp.asarray(sd[p + "mlp.fc1.bias"], dtype),
            "fc2": jnp.asarray(sd[p + "mlp.fc2.weight"], dtype),
            "fc2_b": jnp.asarray(sd[p + "mlp.fc2.bias"], dtype),
            "ln1": jnp.asarray(sd[p + "input_layernorm.weight"], dtype),
            "ln1_b": jnp.asarray(sd[p + "input_layernorm.bias"], dtype),
            "ln2": jnp.asarray(sd[p + "post_attention_layernorm.weight"], dtype),
            "ln2_b": jnp.asarray(sd[p + "post_attention_layernorm.bias"], dtype),
        }
        if p + "gate_attn" in sd:
            lw["gate_attn"] = jnp.asarray(sd[p + "gate_attn"], dtype)
            lw["gate_ffn"] = jnp.asarray(sd[p + "gate_ffn"], dtype)
        out.append(lw)
    return out


def mllama_vision_params(
    sd: Mapping[str, np.ndarray], cfg: MllamaVisionConfig, dtype=jnp.float32
) -> dict:
    g = lambda k: jnp.asarray(sd[k], dtype)  # noqa: E731
    return {
        "class_embedding": g("class_embedding"),
        "patch_embedding": g("patch_embedding.weight"),
        "pos_gate": g("gated_positional_embedding.gate"),
        "pos_embed": g("gated_positional_embedding.embedding"),
        "tile_pos_embed": g("gated_positional_embedding.tile_embedding.weight"),
        "pre_tile_gate": g("pre_tile_positional_embedding.gate"),
        "pre_tile_embed": g("pre_tile_positional_embedding.embedding.weight"),
        "post_tile_gate": g("post_tile_positional_embedding.gate"),
        "post_tile_embed": g("post_tile_positional_embedding.embedding.weight"),
        "ln_pre": g("layernorm_pre.weight"),
        "ln_pre_b": g("layernorm_pre.bias"),
        "ln_post": g("layernorm_post.weight"),
        "ln_post_b": g("layernorm_post.bias"),
        "layers": _layer_params(sd, "transformer", cfg.num_layers, dtype),
        "global_layers": _layer_params(
            sd, "global_transformer", cfg.num_global_layers, dtype
        ),
    }


def _ln(x, w, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _encoder_layer(lw, h, mask_bias, n_heads, eps):
    b, t, d = h.shape
    hd = d // n_heads
    x = _ln(h, lw["ln1"], lw["ln1_b"], eps)
    q = (x @ lw["wq"].T).reshape(b, t, n_heads, hd)
    k = (x @ lw["wk"].T).reshape(b, t, n_heads, hd)
    v = (x @ lw["wv"].T).reshape(b, t, n_heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd).astype(h.dtype)
    s = s + mask_bias.astype(s.dtype)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(h.dtype)
    attn = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, t, d) @ lw["wo"].T
    if "gate_attn" in lw:
        attn = jnp.tanh(lw["gate_attn"]) * attn
    h = h + attn
    x = _ln(h, lw["ln2"], lw["ln2_b"], eps)
    x = jax.nn.gelu(x @ lw["fc1"].T + lw["fc1_b"], approximate=False)
    x = x @ lw["fc2"].T + lw["fc2_b"]
    if "gate_ffn" in lw:
        x = jnp.tanh(lw["gate_ffn"]) * x
    return h + x


def mllama_vision_forward(
    params: dict,
    cfg: MllamaVisionConfig,
    pixel_values: jax.Array,  # [B, n_img, n_tiles, 3, H, W]
    aspect_ratio_ids: jax.Array,  # [B, n_img] int32
    aspect_ratio_mask: jax.Array,  # [B, n_img, n_tiles] int32
) -> jax.Array:
    """→ cross-attention states [B, n_img, n_tiles, num_patches,
    vision_output_dim] (HF MllamaVisionModel parity)."""
    b, n_img, n_tiles, c, hh, ww = pixel_values.shape
    d = cfg.hidden_size
    p = cfg.patch_size
    nh, nw = hh // p, ww // p
    px = pixel_values.reshape(b * n_img * n_tiles, c, hh, ww)
    # patch embedding: unfold to [N, nh*nw, c*p*p] @ W
    px = px.reshape(-1, c, nh, p, nw, p).transpose(0, 2, 4, 1, 3, 5)
    patches = px.reshape(-1, nh * nw, c * p * p)
    wconv = params["patch_embedding"].reshape(d, c * p * p)
    h = patches @ wconv.T  # [N, np, d]

    ar_ids = aspect_ratio_ids.reshape(b * n_img)
    n_patch = nh * nw
    # pre-tile embedding (gated)
    h = h.reshape(b * n_img, n_tiles, n_patch, d)
    pre = params["pre_tile_embed"][ar_ids].reshape(-1, cfg.max_num_tiles, 1, d)
    h = h + pre[:, :n_tiles] * jnp.tanh(params["pre_tile_gate"])
    # class token
    h = h.reshape(b * n_img * n_tiles, n_patch, d)
    cls = jnp.broadcast_to(params["class_embedding"], (h.shape[0], 1, d))
    h = jnp.concatenate([cls, h], axis=1)
    n_patch += 1
    # gated position embedding
    h = h.reshape(b * n_img, n_tiles, n_patch, d)
    gate = jnp.tanh(params["pos_gate"])
    h = h + (1 - gate) * params["pos_embed"][None, None]
    tile_pos = params["tile_pos_embed"][ar_ids].reshape(
        -1, cfg.max_num_tiles, cfg.num_patches, d
    )
    h = h + gate * tile_pos[:, :n_tiles]
    h = _ln(h, params["ln_pre"], params["ln_pre_b"], cfg.norm_eps)

    # pad patch dim to a multiple of 8 (HF does the same)
    pad = (8 - n_patch % 8) % 8
    if pad:
        h = jnp.pad(h, ((0, 0), (0, 0), (0, pad), (0, 0)))
    t_len = n_patch + pad

    # aspect-ratio attention mask, HF semantics: rows/cols of PADDING
    # patches get -inf only where both q and k are padding (outer product)
    amask = aspect_ratio_mask.reshape(b * n_img, n_tiles).astype(jnp.float32)
    patch_valid = jnp.broadcast_to(
        amask[:, :, None], (b * n_img, n_tiles, t_len)
    )
    if pad:
        patch_valid = patch_valid.at[:, :, -pad:].set(0.0)
    inv = (1.0 - patch_valid).reshape(b * n_img, n_tiles * t_len, 1)
    bias = (inv @ inv.transpose(0, 2, 1)) * jnp.float32(-1e30)
    bias = bias[:, None]  # [B*n_img, 1, S, S]

    h = h.reshape(b * n_img, n_tiles * t_len, d)
    # HF collects the OUTPUT of each layer (encoder_states[i] = layer i out)
    intermediates = []
    for i, lw in enumerate(params["layers"]):
        h = _encoder_layer(lw, h, bias, cfg.num_heads, cfg.norm_eps)
        if i in cfg.intermediate_layers_indices:
            intermediates.append(h)

    h = _ln(h, params["ln_post"], params["ln_post_b"], cfg.norm_eps)
    # post-tile embedding + global transformer
    h = h.reshape(b * n_img, n_tiles, t_len, d)
    post = params["post_tile_embed"][ar_ids].reshape(-1, cfg.max_num_tiles, 1, d)
    h = h + post[:, :n_tiles] * jnp.tanh(params["post_tile_gate"])
    h = h.reshape(b * n_img, n_tiles * t_len, d)
    for lw in params["global_layers"]:
        h = _encoder_layer(lw, h, bias, cfg.num_heads, cfg.norm_eps)

    def unpad(x):
        x = x.reshape(b * n_img, n_tiles, t_len, -1)
        return x[:, :, :n_patch]

    h = unpad(h)
    inter = jnp.stack([unpad(x) for x in intermediates], axis=-1)
    inter = inter.reshape(*h.shape[:3], -1)
    out = jnp.concatenate([h, inter], axis=-1)
    return out.reshape(b, n_img, n_tiles, n_patch, cfg.vision_output_dim)
