"""Llama 4 (Scout/Maverick) text model — the analog of the reference's
`mistralrs-core/src/vision_models/llama4/text.rs`.

Quirks vs llama-3:
* interleaved (GPT-J-paired) rotary on `no_rope_layers == 1` layers,
  followed by a weightless L2 q/k norm; NoPE layers instead scale q by the
  log-position "temperature tuning" factor
  ``log1p(floor((pos+1)/floor_scale))·attn_scale + 1``.
* rope layers use CHUNKED causal attention (q attends kv iff same
  `attention_chunk_size` chunk); NoPE layers are full causal.
* MoE on `moe_layers` (every `interleave_moe_layer_step`-th layer):
  top-k router whose SIGMOID scores scale the expert INPUT (nonlinear —
  not equivalent to output scaling), plus an always-on shared expert.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_cos_sin, rope_frequencies
from .config import ModelConfig, config_from_hf


@dataclass(frozen=True)
class Llama4Config:
    text: ModelConfig
    no_rope_layers: tuple[int, ...]  # 1 = rope (chunked attn), 0 = NoPE (full)
    moe_layers: tuple[int, ...]
    attention_chunk_size: int
    attn_temperature_tuning: bool
    floor_scale: float
    attn_scale: float
    use_qk_norm: bool
    num_experts: int
    num_experts_per_tok: int

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Llama4Config":
        tc = dict(d.get("text_config", d))
        text = config_from_hf(
            tc
            | {
                "architectures": ["LlamaForCausalLM"],
                # dense-MLP width (MoE widths live on the expert tensors)
                "intermediate_size": tc.get(
                    "intermediate_size_mlp", tc.get("intermediate_size")
                ),
                "num_experts": 0,
            }
        )
        n = text.num_layers
        step = tc.get("interleave_moe_layer_step", 1)
        moe = tc.get("moe_layers")
        if moe is None:
            moe = list(range(step - 1, n, step)) if step else []
        return cls(
            text=text,
            no_rope_layers=tuple(
                tc.get("no_rope_layers")
                or [int((i + 1) % 4 != 0) for i in range(n)]
            ),
            moe_layers=tuple(moe),
            attention_chunk_size=tc.get("attention_chunk_size", 8192),
            attn_temperature_tuning=tc.get("attn_temperature_tuning", True),
            floor_scale=tc.get("floor_scale", 8192),
            attn_scale=tc.get("attn_scale", 0.1),
            use_qk_norm=tc.get("use_qk_norm", True),
            num_experts=tc.get("num_local_experts", 0),
            num_experts_per_tok=tc.get("num_experts_per_tok", 1),
        )

    # engine-facing passthroughs
    @property
    def arch(self) -> str:
        return "llama4"

    @property
    def vocab_size(self) -> int:
        return self.text.vocab_size

    @property
    def hidden_size(self) -> int:
        return self.text.hidden_size

    @property
    def max_position_embeddings(self) -> int:
        return self.text.max_position_embeddings

    @property
    def eos_token_ids(self):
        return self.text.eos_token_ids

    @property
    def embedding_multiplier(self):
        return None


def llama4_text_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: Llama4Config, dtype=jnp.float32,
    prefix: str = "model.",
) -> dict:
    g = lambda k: jnp.asarray(sd[prefix + k], dtype)  # noqa: E731
    layers = []
    moe = set(cfg.moe_layers)
    for i in range(cfg.text.num_layers):
        p = f"layers.{i}."
        lw = {
            "attn_norm": g(p + "input_layernorm.weight"),
            "ffn_norm": g(p + "post_attention_layernorm.weight"),
            "wq": g(p + "self_attn.q_proj.weight"),
            "wk": g(p + "self_attn.k_proj.weight"),
            "wv": g(p + "self_attn.v_proj.weight"),
            "wo": g(p + "self_attn.o_proj.weight"),
        }
        if i in moe:
            lw.update({
                "router": g(p + "feed_forward.router.weight"),
                "experts_gate_up": g(p + "feed_forward.experts.gate_up_proj"),
                "experts_down": g(p + "feed_forward.experts.down_proj"),
                "shared_gate": g(p + "feed_forward.shared_expert.gate_proj.weight"),
                "shared_up": g(p + "feed_forward.shared_expert.up_proj.weight"),
                "shared_down": g(p + "feed_forward.shared_expert.down_proj.weight"),
            })
        else:
            lw.update({
                "gate": g(p + "feed_forward.gate_proj.weight"),
                "up": g(p + "feed_forward.up_proj.weight"),
                "down": g(p + "feed_forward.down_proj.weight"),
            })
        layers.append(lw)
    lm_head = sd.get("lm_head.weight")
    return {
        "embed": g("embed_tokens.weight"),
        "layers": layers,
        "final_norm": g("norm.weight"),
        "lm_head": (
            jnp.asarray(lm_head, dtype)
            if lm_head is not None else g("embed_tokens.weight")
        ),
    }


def _l2_norm(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)).astype(x.dtype)


def _llama4_mlp(lw, x, cfg: Llama4Config, moe: bool):
    if not moe:
        return (jax.nn.silu(x @ lw["gate"].T) * (x @ lw["up"].T)) @ lw["down"].T
    b, t, h = x.shape
    xf = x.reshape(-1, h)
    logits = xf @ lw["router"].T  # [T, E]
    k = cfg.num_experts_per_tok
    topv, topi = jax.lax.top_k(logits, k)
    scores = jnp.full_like(logits, -jnp.inf)
    scores = scores.at[jnp.arange(xf.shape[0])[:, None], topi].set(topv)
    scores = jax.nn.sigmoid(scores.astype(jnp.float32)).astype(x.dtype)  # [T, E]
    # input-scaled dense-compute combine: expert e sees scores[:, e] * x
    xin = scores.T[:, :, None] * xf[None]  # [E, T, H]
    gu = jnp.einsum("eth,ehi->eti", xin, lw["experts_gate_up"])
    half = gu.shape[-1] // 2
    hid = jax.nn.silu(gu[..., :half]) * gu[..., half:]
    routed = jnp.einsum("eti,eih->eth", hid, lw["experts_down"]).sum(0)
    shared = (
        jax.nn.silu(xf @ lw["shared_gate"].T) * (xf @ lw["shared_up"].T)
    ) @ lw["shared_down"].T
    return (shared + routed).reshape(b, t, h)


def _attend(q, kk, vv, mask, scale):
    # q [B,T,nh,hd]; kk/vv [B,S,nkv,hd]; mask [B,T,S] bool
    b, t, nh, hd = q.shape
    nkv = kk.shape[2]
    qf = q.reshape(b, t, nkv, nh // nkv, hd).astype(jnp.float32)
    logits = jnp.einsum("btkgh,bskh->bkgts", qf, kk.astype(jnp.float32)) * scale
    logits = jnp.where(mask[:, None, None], logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bkgts,bskh->btkgh", p, vv.astype(jnp.float32))
    return out.reshape(b, t, nh * hd)


@dataclass
class Llama4Cache:
    k: list  # L × [B, cap, n_kv, hd]
    v: list

    @classmethod
    def create(cls, cfg: Llama4Config, b: int, capacity: int, dtype=jnp.float32):
        t = cfg.text
        shape = (b, capacity, t.num_kv_heads, t.head_dim)
        return cls(
            k=[jnp.zeros(shape, dtype) for _ in range(t.num_layers)],
            v=[jnp.zeros(shape, dtype) for _ in range(t.num_layers)],
        )


def llama4_forward(
    weights: dict,
    cfg: Llama4Config,
    input_ids: jax.Array,  # [B, T]
    positions: jax.Array,  # [B, T]
    cache: Llama4Cache,
    kv_start: jax.Array,  # [B]
    *,
    compute_dtype=jnp.float32,
    logits_last_only: bool = False,
    input_embeds: Optional[jax.Array] = None,
) -> tuple[jax.Array, Llama4Cache]:
    t_cfg = cfg.text
    b, t = input_ids.shape
    nh, nkv, hd = t_cfg.num_heads, t_cfg.num_kv_heads, t_cfg.head_dim
    h = (
        input_embeds.astype(compute_dtype)
        if input_embeds is not None
        else jnp.asarray(weights["embed"], compute_dtype)[input_ids]
    )
    inv = rope_frequencies(hd, t_cfg.rope_theta, t_cfg.rope_scaling)
    cos, sin = rope_cos_sin(positions, inv)
    cap = cache.k[0].shape[1]
    kv_pos = jnp.arange(cap)[None]  # [1, S]
    ks, vs = list(cache.k), list(cache.v)
    moe = set(cfg.moe_layers)

    for li, lw in enumerate(weights["layers"]):
        use_rope = bool(cfg.no_rope_layers[li])
        x = rms_norm(h, lw["attn_norm"], t_cfg.rms_norm_eps)
        q = (x @ lw["wq"].T).reshape(b, t, nh, hd)
        k = (x @ lw["wk"].T).reshape(b, t, nkv, hd)
        v = (x @ lw["wv"].T).reshape(b, t, nkv, hd)
        if use_rope:
            q = apply_rope(q, cos, sin, interleaved=True)
            k = apply_rope(k, cos, sin, interleaved=True)
            if cfg.use_qk_norm:
                q = _l2_norm(q, t_cfg.rms_norm_eps)
                k = _l2_norm(k, t_cfg.rms_norm_eps)
        elif cfg.attn_temperature_tuning:
            scales = (
                jnp.log1p(
                    jnp.floor((positions.astype(jnp.float32) + 1.0) / cfg.floor_scale)
                )
                * cfg.attn_scale
                + 1.0
            )
            q = (q.astype(jnp.float32) * scales[..., None, None]).astype(q.dtype)

        def write(buf, new):
            def one(bu, ne, st):
                return jax.lax.dynamic_update_slice(bu, ne, (st, 0, 0))

            return jax.vmap(one)(buf, new.astype(buf.dtype), kv_start)

        ks[li] = write(ks[li], k)
        vs[li] = write(vs[li], v)
        valid = kv_pos < (kv_start + t)[:, None]
        causal = kv_pos[:, None, :] <= positions[:, :, None]  # [B, T, S]
        mask = valid[:, None, :] & causal
        if use_rope:
            c = cfg.attention_chunk_size
            mask = mask & (
                (kv_pos[:, None, :] // c) == (positions[:, :, None] // c)
            )
        attn = _attend(
            q, ks[li].astype(compute_dtype), vs[li].astype(compute_dtype),
            mask, 1.0 / np.sqrt(hd),
        ).astype(compute_dtype)
        h = h + attn @ lw["wo"].T
        x = rms_norm(h, lw["ffn_norm"], t_cfg.rms_norm_eps)
        h = h + _llama4_mlp(lw, x, cfg, li in moe)

    h = rms_norm(h, weights["final_norm"], t_cfg.rms_norm_eps)
    if logits_last_only:
        h = h[:, -1:]
    logits = (h @ weights["lm_head"].T).astype(jnp.float32)
    return logits, Llama4Cache(k=ks, v=vs)

# ---------------------------------------------------------------------------
# engine serving
# ---------------------------------------------------------------------------


def make_paged_cache(
    cfg: Llama4Config, num_blocks: int, block_size: int, dtype=jnp.float32
) -> dict:
    t = cfg.text
    s_total = num_blocks * block_size + 1  # +1 trash slot
    return {
        "k": jnp.zeros((t.num_layers, s_total, t.num_kv_heads, t.head_dim), dtype),
        "v": jnp.zeros((t.num_layers, s_total, t.num_kv_heads, t.head_dim), dtype),
    }


def llama4_forward_paged(
    weights: dict,
    cfg: Llama4Config,
    input_ids: jax.Array,  # [B, T]
    positions: jax.Array,  # [B, T]
    cache: dict,
    block_tables: jax.Array,  # [B, W]
    slot_mapping: jax.Array,  # [B, T] (< 0 → dropped)
    kv_lens: jax.Array,  # [B]
    *,
    block_size: int,
    compute_dtype=jnp.float32,
    logits_last_only: bool = True,
    last_indices: Optional[jax.Array] = None,
    input_embeds: Optional[jax.Array] = None,  # [B, T, H] multimodal merge
) -> tuple[jax.Array, dict]:
    """Engine-servable llama4 step: paged KV, per-layer chunked/full causal
    masks, NoPE temperature tuning, input-scaled MoE."""
    t_cfg = cfg.text
    b, t = input_ids.shape
    nh, nkv, hd = t_cfg.num_heads, t_cfg.num_kv_heads, t_cfg.head_dim
    h = (
        input_embeds.astype(compute_dtype)
        if input_embeds is not None
        else jnp.asarray(weights["embed"], compute_dtype)[input_ids]
    )
    inv = rope_frequencies(hd, t_cfg.rope_theta, t_cfg.rope_scaling)
    cos, sin = rope_cos_sin(positions, inv)

    kv_trash = cache["k"].shape[1] - 1
    flat_slots = jnp.where(
        slot_mapping.reshape(b * t) < 0, kv_trash, slot_mapping.reshape(b * t)
    )
    bt_safe = jnp.maximum(block_tables, 0)
    gather_slots = (
        bt_safe[:, :, None] * block_size + jnp.arange(block_size)[None, None, :]
    ).reshape(b, -1)  # [B, S]
    s = gather_slots.shape[1]
    # logical kv position of each gathered slot = its index (tables are
    # logical-order lists of blocks)
    kv_pos = jnp.arange(s)[None]
    valid = kv_pos < kv_lens[:, None]
    causal = kv_pos[:, None, :] <= positions[:, :, None]
    base_mask = valid[:, None, :] & causal  # [B, T, S]
    c = cfg.attention_chunk_size
    chunk_mask = base_mask & (
        (kv_pos[:, None, :] // c) == (positions[:, :, None] // c)
    )

    if cfg.attn_temperature_tuning:
        tt_scales = (
            jnp.log1p(
                jnp.floor((positions.astype(jnp.float32) + 1.0) / cfg.floor_scale)
            )
            * cfg.attn_scale
            + 1.0
        )

    new_cache = dict(cache)
    moe = set(cfg.moe_layers)
    for li, lw in enumerate(weights["layers"]):
        use_rope = bool(cfg.no_rope_layers[li])
        x = rms_norm(h, lw["attn_norm"], t_cfg.rms_norm_eps)
        q = (x @ lw["wq"].T).reshape(b, t, nh, hd)
        k = (x @ lw["wk"].T).reshape(b, t, nkv, hd)
        v = (x @ lw["wv"].T).reshape(b, t, nkv, hd)
        if use_rope:
            q = apply_rope(q, cos, sin, interleaved=True)
            k = apply_rope(k, cos, sin, interleaved=True)
            if cfg.use_qk_norm:
                q = _l2_norm(q, t_cfg.rms_norm_eps)
                k = _l2_norm(k, t_cfg.rms_norm_eps)
        elif cfg.attn_temperature_tuning:
            q = (q.astype(jnp.float32) * tt_scales[..., None, None]).astype(q.dtype)
        kp = new_cache["k"].at[li, flat_slots].set(
            k.reshape(b * t, nkv, hd).astype(new_cache["k"].dtype)
        )
        vp = new_cache["v"].at[li, flat_slots].set(
            v.reshape(b * t, nkv, hd).astype(new_cache["v"].dtype)
        )
        new_cache["k"], new_cache["v"] = kp, vp
        kk = kp[li][gather_slots].astype(compute_dtype)
        vv = vp[li][gather_slots].astype(compute_dtype)
        attn = _attend(
            q, kk, vv, chunk_mask if use_rope else base_mask, 1.0 / np.sqrt(hd)
        ).astype(compute_dtype)
        h = h + attn @ lw["wo"].T
        x = rms_norm(h, lw["ffn_norm"], t_cfg.rms_norm_eps)
        h = h + _llama4_mlp(lw, x, cfg, li in moe)

    h = rms_norm(h, weights["final_norm"], t_cfg.rms_norm_eps)
    if logits_last_only:
        if last_indices is not None:
            h = jnp.take_along_axis(
                h, last_indices.astype(jnp.int32)[:, None, None], axis=1
            )
        else:
            h = h[:, -1:]
    logits = (h @ weights["lm_head"].T).astype(jnp.float32)
    return logits, new_cache

# ---------------------------------------------------------------------------
# multimodal (vision tower + projector + merge)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Llama4VLConfig:
    """Full Llama4ForConditionalGeneration config (text + vision)."""

    llm: Llama4Config
    vision: Any  # vision.llama4.Llama4VisionConfig
    image_token_id: int

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Llama4VLConfig":
        from ..vision.llama4 import Llama4VisionConfig as VC

        return cls(
            llm=Llama4Config.from_hf(d),
            vision=VC.from_hf(d["vision_config"]),
            image_token_id=d.get("image_token_index", 200092),
        )


def llama4_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: Llama4VLConfig, dtype=jnp.float32,
) -> dict:
    from ..vision.llama4 import llama4_vision_params

    text_sd = {
        k[len("language_model."):]: v
        for k, v in sd.items() if k.startswith("language_model.")
    }
    vis_sd = {
        k[len("vision_model."):]: v
        for k, v in sd.items() if k.startswith("vision_model.")
    }
    return {
        "text": llama4_text_weights_from_state_dict(text_sd, cfg.llm, dtype),
        "vision": llama4_vision_params(vis_sd, cfg.vision, dtype),
        "proj_w": jnp.asarray(sd["multi_modal_projector.linear_1.weight"], dtype),
    }


def prepare_multimodal_prompt(
    weights: dict,
    cfg: Llama4VLConfig,
    prompt_ids: list[int],
    pixel_values,  # [N_tiles, 3, H, W] or None
    encoder_cache=None,
    compute_dtype=jnp.float32,
):
    """→ (prompt_ids, prompt_embeds [T, H], extra_hash) for engine serving
    via Llama4Adapter (supports_embeds)."""
    from ..multimodal import prepare_vlm_prompt
    from ..vision.llama4 import llama4_vision_forward

    def encode(pv):
        feats = llama4_vision_forward(
            weights["vision"], cfg.vision, jnp.asarray(pv)
        )
        return (feats @ weights["proj_w"].T).reshape(
            1, -1, weights["proj_w"].shape[0]
        )

    return prepare_vlm_prompt(
        prompt_ids, pixel_values,
        embed_weights=weights["text"]["embed"],
        image_token_id=cfg.image_token_id,
        encode=encode,
        encoder_cache=encoder_cache,
        cache_namespace="llama4",
        compute_dtype=compute_dtype,
    )
