"""Gemma 3n (MatFormer) — the analog of the reference's
`mistralrs-core/src/models/gemma3n/` (+ `matformer.rs` slicing): AltUp
alternating-update streams, Laurel augmented residuals, per-layer input
embeddings, Gaussian-top-k activation sparsity, v-norm attention with
scaling 1.0, and KV-cache SHARING (the last `num_kv_shared_layers` layers
reuse the KV of the last non-shared layer of the same attention type) —
engine-served through an arch adapter with per-plane paged KV pools
allocated only for the layers that actually store KV.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import sdpa
from ..ops.rope import apply_rope, rope_cos_sin


def _rms(x, w=None, eps=1e-6):
    x32 = x.astype(jnp.float32)
    n = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    if w is not None:
        n = n * w.astype(jnp.float32)
    return n.astype(x.dtype)


@dataclass(frozen=True)
class Gemma3nConfig:
    vocab_size: int
    vocab_size_per_layer_input: int
    hidden_size: int
    hidden_size_per_layer_input: int
    intermediate_sizes: tuple[int, ...]  # per layer (matformer-elastic)
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    layer_types: tuple[str, ...]
    sliding_window: int
    num_kv_shared_layers: int
    laurel_rank: int
    altup_num_inputs: int
    altup_active_idx: int
    altup_correct_scale: bool
    activation_sparsity: tuple[float, ...]
    rope_theta: float
    rope_local_theta: float
    rms_norm_eps: float
    final_logit_softcap: Optional[float]
    eos_token_ids: tuple[int, ...] = ()
    arch: str = "gemma3n"

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "Gemma3nConfig":
        tc = dict(d.get("text_config", d))
        n = tc["num_hidden_layers"]
        inter = tc["intermediate_size"]
        if isinstance(inter, int):
            inter = [inter] * n
        asp = tc.get("activation_sparsity_pattern") or [0.0] * n
        eos = d.get("eos_token_id", tc.get("eos_token_id"))
        if eos is None:
            eos_ids: tuple[int, ...] = ()
        else:
            eos_ids = (eos,) if isinstance(eos, int) else tuple(eos)
        return cls(
            vocab_size=tc["vocab_size"],
            vocab_size_per_layer_input=tc.get("vocab_size_per_layer_input",
                                              tc["vocab_size"]),
            hidden_size=tc["hidden_size"],
            hidden_size_per_layer_input=tc["hidden_size_per_layer_input"],
            intermediate_sizes=tuple(inter),
            num_layers=n,
            num_heads=tc["num_attention_heads"],
            num_kv_heads=tc["num_key_value_heads"],
            head_dim=tc.get("head_dim", tc["hidden_size"] // tc["num_attention_heads"]),
            layer_types=tuple(tc["layer_types"]),
            sliding_window=tc.get("sliding_window", 512),
            num_kv_shared_layers=tc.get("num_kv_shared_layers", 0),
            laurel_rank=tc.get("laurel_rank", 64),
            altup_num_inputs=tc.get("altup_num_inputs", 4),
            altup_active_idx=tc.get("altup_active_idx", 0),
            altup_correct_scale=tc.get("altup_correct_scale", True),
            activation_sparsity=tuple(asp),
            rope_theta=tc.get("rope_theta", 1_000_000.0),
            rope_local_theta=tc.get("rope_local_base_freq", 10_000.0),
            rms_norm_eps=tc.get("rms_norm_eps", 1e-6),
            final_logit_softcap=tc.get("final_logit_softcapping"),
            eos_token_ids=eos_ids,
        )

    @property
    def first_shared_layer(self) -> int:
        return self.num_layers - self.num_kv_shared_layers

    def kv_plan(self) -> tuple[list[int], list[bool]]:
        """(plane index per layer, writes-KV per layer). Shared layers map
        to the plane of the last non-shared layer of the same type."""
        first = self.first_shared_layer
        plane_of_store: dict[int, int] = {}
        planes, writes = [], []
        for li in range(self.num_layers):
            if li < first or self.num_kv_shared_layers <= 0:
                plane_of_store[li] = len(plane_of_store)
                planes.append(plane_of_store[li])
                writes.append(True)
            else:
                prev = self.layer_types[:first]
                src = len(prev) - 1 - prev[::-1].index(self.layer_types[li])
                planes.append(plane_of_store[src])
                writes.append(False)
        return planes, writes

    @property
    def num_kv_planes(self) -> int:
        return self.first_shared_layer if self.num_kv_shared_layers > 0 else self.num_layers

    # engine-facing aliases (Engine reads these off the config)
    @property
    def max_position_embeddings(self) -> int:
        return 32768

    @property
    def embedding_multiplier(self):
        # engine's text-row embed path: None → √hidden (gemma convention)
        return None

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim


def gemma3n_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: Gemma3nConfig, dtype=jnp.float32
) -> dict:
    pre = "model." if any(k.startswith("model.") for k in sd) else ""

    def g(name):
        return jnp.asarray(np.asarray(sd[pre + name], np.float32), dtype)

    layers = []
    for i in range(cfg.num_layers):
        p = f"layers.{i}."
        layers.append({
            "wq": g(p + "self_attn.q_proj.weight"),
            "wk": g(p + "self_attn.k_proj.weight"),
            "wv": g(p + "self_attn.v_proj.weight"),
            "wo": g(p + "self_attn.o_proj.weight"),
            "q_norm": g(p + "self_attn.q_norm.weight"),
            "k_norm": g(p + "self_attn.k_norm.weight"),
            "attn_norm": g(p + "input_layernorm.weight"),
            "post_attn_norm": g(p + "post_attention_layernorm.weight"),
            "pre_ffn_norm": g(p + "pre_feedforward_layernorm.weight"),
            "post_ffn_norm": g(p + "post_feedforward_layernorm.weight"),
            "gate": g(p + "mlp.gate_proj.weight"),
            "up": g(p + "mlp.up_proj.weight"),
            "down": g(p + "mlp.down_proj.weight"),
            "laurel_l": g(p + "laurel.linear_left.weight"),
            "laurel_r": g(p + "laurel.linear_right.weight"),
            "laurel_norm": g(p + "laurel.post_laurel_norm.weight"),
            "altup_correct_scale": g(p + "altup.correct_output_scale"),
            "altup_correct": g(p + "altup.correction_coefs.weight"),
            "altup_predict": g(p + "altup.prediction_coefs.weight"),
            "altup_router": g(p + "altup.modality_router.weight"),
            "altup_router_norm": g(p + "altup.router_norm.weight"),
            "pli_gate": g(p + "per_layer_input_gate.weight"),
            "pli_proj": g(p + "per_layer_projection.weight"),
            "pli_norm": g(p + "post_per_layer_input_norm.weight"),
        })
    return {
        "embed": g("embed_tokens.weight"),
        "embed_per_layer": g("embed_tokens_per_layer.weight"),
        "pl_projection": g("per_layer_model_projection.weight"),
        "pl_projection_norm": g("per_layer_projection_norm.weight"),
        "altup_proj": [
            g(f"altup_projections.{i}.weight")
            for i in range(cfg.altup_num_inputs - 1)
        ],
        "altup_unembed": [
            g(f"altup_unembed_projections.{i}.weight")
            for i in range(cfg.altup_num_inputs - 1)
        ],
        "final_norm": g("norm.weight"),
        "layers": layers,
    }


def apply_matformer(
    cfg: Gemma3nConfig, weights: dict, slice_cfg
) -> tuple[Gemma3nConfig, dict]:
    """MatFormer elastic slicing for Gemma 3n (the checkpoint family the
    reference's `matformer_configs/` target): keep a per-layer FFN prefix
    and drop whole layers. The python layer loop handles heterogeneous FFN
    dims natively, so slices are EXACT (no pad-and-mask like the stacked
    llama path in matformer.py)."""
    import dataclasses

    skipped = set(slice_cfg.layers_skipped)
    keep = [i for i in range(cfg.num_layers) if i not in skipped]
    if cfg.num_kv_shared_layers > 0 and any(
        i >= cfg.first_shared_layer for i in skipped
    ):
        raise ValueError(
            "matformer: cannot skip KV-shared layers (their sources anchor "
            "the sharing plan)"
        )
    dims = slice_cfg.ffn_hidden_dims
    if dims is not None and len(dims) != len(keep):
        raise ValueError(
            f"ffn_hidden_dims has {len(dims)} entries for {len(keep)} kept layers"
        )
    layers = []
    for j, i in enumerate(keep):
        lw = dict(weights["layers"][i])
        if dims is not None:
            d = dims[j]
            lw["gate"] = lw["gate"][:d]
            lw["up"] = lw["up"][:d]
            lw["down"] = lw["down"][:, :d]
        layers.append(lw)
    pl = cfg.hidden_size_per_layer_input
    keep_idx = jnp.asarray(keep, jnp.int32)
    epl = weights["embed_per_layer"]
    epl = epl.reshape(epl.shape[0], cfg.num_layers, pl)[:, keep_idx].reshape(
        epl.shape[0], -1
    )
    plp = weights["pl_projection"]
    plp = plp.reshape(cfg.num_layers, pl, -1)[keep_idx].reshape(
        len(keep) * pl, -1
    )
    new_cfg = dataclasses.replace(
        cfg,
        num_layers=len(keep),
        intermediate_sizes=tuple(
            dims if dims is not None else [cfg.intermediate_sizes[i] for i in keep]
        ),
        layer_types=tuple(cfg.layer_types[i] for i in keep),
        activation_sparsity=tuple(cfg.activation_sparsity[i] for i in keep),
        num_kv_shared_layers=sum(
            1 for i in keep if cfg.num_kv_shared_layers > 0
            and i >= cfg.first_shared_layer
        ),
    )
    out = dict(weights)
    out.update(embed_per_layer=epl, pl_projection=plp, layers=layers)
    return new_cfg, out


def make_paged_cache(
    cfg: Gemma3nConfig, num_blocks: int, block_size: int, n_slots: int = 0,
    dtype=jnp.float32,
) -> dict:
    slots = num_blocks * block_size
    # head-major planes, matching kv/paged.py's pool layout
    shape = (cfg.num_kv_planes, cfg.num_kv_heads, slots, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _magnitude_match(x_ref, x):
    tgt = jnp.sqrt(jnp.mean(x_ref.astype(jnp.float32) ** 2, -1, keepdims=True))
    new = jnp.sqrt(jnp.maximum(
        jnp.mean(x.astype(jnp.float32) ** 2, -1, keepdims=True), 1e-5
    ))
    return (x.astype(jnp.float32) * tgt / new).astype(x.dtype)


def _gaussian_topk(x, sparsity: float):
    """Zero all but the top (1-sparsity) activations, assuming gaussianity:
    relu(x - (mean + std·Φ⁻¹(sparsity))) (`Gemma3nTextMLP._gaussian_topk`)."""
    if sparsity <= 0.0:
        return x
    # Φ⁻¹(p) = √2·erfinv(2p−1); sparsity is static so this folds to a const
    std_mult = (2.0 ** 0.5) * jax.scipy.special.erfinv(
        jnp.float32(2.0 * sparsity - 1.0)
    ).astype(x.dtype)
    mu = jnp.mean(x, -1, keepdims=True)
    std = jnp.std(x, -1, keepdims=True)
    return jax.nn.relu(x - (mu + std * std_mult))


def _altup_predict(h, lw, cfg: Gemma3nConfig, eps):
    """h [A, B, T, D] → predictions [A, B, T, D]."""
    active = h[cfg.altup_active_idx]
    router_in = _rms(active, lw["altup_router_norm"], eps) * (
        cfg.hidden_size ** -1.0
    )
    modalities = jnp.tanh(
        (router_in @ lw["altup_router"].T).astype(jnp.float32)
    ).astype(h.dtype)  # [B, T, A]
    a = cfg.altup_num_inputs
    coefs = (modalities @ lw["altup_predict"].T).reshape(
        *modalities.shape[:-1], a, a
    )  # [B, T, A, A]
    # einsum over the stream axis (torch permutes to matmul; same math)
    pred = jnp.einsum("abtd,btaz->zbtd", h, coefs)
    return pred + h, modalities


def _altup_correct(pred, activated, modalities_src, lw, cfg, eps):
    router_in = _rms(activated, lw["altup_router_norm"], eps) * (
        cfg.hidden_size ** -1.0
    )
    modalities = jnp.tanh(
        (router_in @ lw["altup_router"].T).astype(jnp.float32)
    ).astype(activated.dtype)
    innovation = activated - pred[cfg.altup_active_idx]  # [B, T, D]
    coefs = modalities @ lw["altup_correct"].T + 1.0  # [B, T, A]
    corrected = innovation[None] * jnp.transpose(coefs, (2, 0, 1))[..., None]
    return corrected + pred


def gemma3n_forward_paged(
    weights: dict,
    cfg: Gemma3nConfig,
    input_ids: jax.Array,  # [B, T]
    positions: jax.Array,  # [B, T]
    cache: dict,  # make_paged_cache pools
    block_tables: jax.Array,  # [B, W] int32
    slot_mapping: jax.Array,  # [B, T] int32 (< 0 → dropped)
    kv_lens: jax.Array,  # [B]
    *,
    block_size: int,
    compute_dtype=jnp.float32,
    logits_last_only: bool = True,
    last_indices: Optional[jax.Array] = None,
    input_embeds: Optional[jax.Array] = None,  # [B, T, H] multimodal merge
):
    """Engine-servable Gemma3n step (prefill chunk or decode). Paged-KV
    conventions mirror `forward_paged` (models/llama.py); KV-shared layers
    read their source layer's plane and write nothing."""
    from ..kv.paged import gather_kv, write_kv

    eps = cfg.rms_norm_eps
    b, t = input_ids.shape
    if input_embeds is not None:
        # merged rows arrive pre-scaled (embed_prompt applies the √H scale
        # to text rows; multimodal rows come from the modality embedders)
        h0 = input_embeds.astype(compute_dtype)
    else:
        h0 = (
            weights["embed"].astype(compute_dtype)[input_ids]
            * jnp.asarray(cfg.hidden_size ** 0.5, compute_dtype)
        )
    # per-layer inputs: scaled per-layer vocab embedding + projection of h0
    # out-of-range ids (multimodal placeholders) fall back to row 0, matching
    # HF's `torch.where(ids < vocab_pl, ids, 0)` in Gemma3nModel.forward
    pl_ids = jnp.where(
        (input_ids >= 0) & (input_ids < cfg.vocab_size_per_layer_input),
        input_ids, 0,
    )
    pli_embed = (
        weights["embed_per_layer"].astype(compute_dtype)[pl_ids]
        * jnp.asarray(cfg.hidden_size_per_layer_input ** 0.5, compute_dtype)
    ).reshape(b, t, cfg.num_layers, cfg.hidden_size_per_layer_input)
    pl_proj = (h0 @ weights["pl_projection"].T.astype(compute_dtype)) * (
        cfg.hidden_size ** -0.5
    )
    pl_proj = pl_proj.reshape(
        b, t, cfg.num_layers, cfg.hidden_size_per_layer_input
    )
    pl_proj = _rms(pl_proj, weights["pl_projection_norm"], eps)
    per_layer_inputs = (pl_proj + pli_embed) * jnp.asarray(
        2.0 ** -0.5, compute_dtype
    )

    # altup streams
    streams = [h0]
    for wproj in weights["altup_proj"]:
        streams.append(_magnitude_match(h0, h0 @ wproj.T.astype(compute_dtype)))
    h = jnp.stack(streams)  # [A, B, T, D]

    inv_g = 1.0 / (
        cfg.rope_theta
        ** (jnp.arange(0, cfg.head_dim, 2, dtype=jnp.float32) / cfg.head_dim)
    )
    inv_l = 1.0 / (
        cfg.rope_local_theta
        ** (jnp.arange(0, cfg.head_dim, 2, dtype=jnp.float32) / cfg.head_dim)
    )
    cos_g, sin_g = rope_cos_sin(positions, inv_g)
    cos_l, sin_l = rope_cos_sin(positions, inv_l)

    planes, writes = cfg.kv_plan()
    flat_slots = slot_mapping.reshape(-1)
    kp, vp = cache["k"], cache["v"]
    active = cfg.altup_active_idx

    for li, lw in enumerate(weights["layers"]):
        sliding = cfg.layer_types[li] == "sliding_attention"
        cos, sin = (cos_l, sin_l) if sliding else (cos_g, sin_g)
        pred, _ = _altup_predict(h, lw, cfg, eps)
        x = _rms(pred[active], lw["attn_norm"], eps)
        laurel = x + _rms(
            (x @ lw["laurel_l"].T) @ lw["laurel_r"].T, lw["laurel_norm"], eps
        )
        q = (x @ lw["wq"].T).reshape(b, t, cfg.num_heads, cfg.head_dim)
        q = _rms(q, lw["q_norm"], eps)
        q = apply_rope(q, cos, sin)
        plane = planes[li]
        if writes[li]:
            k = (x @ lw["wk"].T).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
            k = _rms(k, lw["k_norm"], eps)
            k = apply_rope(k, cos, sin)
            v = (x @ lw["wv"].T).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
            v = _rms(v, None, eps)  # v_norm has no scale
            k_c, v_c, _ = write_kv(
                kp[plane], vp[plane],
                k.reshape(b * t, cfg.num_kv_heads, cfg.head_dim),
                v.reshape(b * t, cfg.num_kv_heads, cfg.head_dim),
                flat_slots,
            )
            kp = kp.at[plane].set(k_c)
            vp = vp.at[plane].set(v_c)
        kk, vv = gather_kv(
            kp[plane], vp[plane], block_tables, block_size,
            dtype=compute_dtype,
        )
        attn = sdpa(
            q, kk, vv, q_positions=positions, kv_len=kv_lens,
            scale=1.0, sliding_window=cfg.sliding_window if sliding else None,
        )
        attn = attn.reshape(b, t, cfg.num_heads * cfg.head_dim) @ lw["wo"].T
        attn = _rms(attn, lw["post_attn_norm"], eps)
        attn_laurel = (pred[active] + attn + laurel) * jnp.asarray(
            2.0 ** -0.5, compute_dtype
        )
        xf = _rms(attn_laurel, lw["pre_ffn_norm"], eps)
        gate = _gaussian_topk(xf @ lw["gate"].T, cfg.activation_sparsity[li])
        mlp = (jax.nn.gelu(gate, approximate=True) * (xf @ lw["up"].T)) @ lw[
            "down"
        ].T
        activated = attn_laurel + _rms(mlp, lw["post_ffn_norm"], eps)
        corrected = _altup_correct(pred, activated, None, lw, cfg, eps)
        first = corrected[active]
        if cfg.altup_correct_scale:
            first = first * lw["altup_correct_scale"].astype(compute_dtype)
        gated = jax.nn.gelu(first @ lw["pli_gate"].T, approximate=True)
        gated = gated * per_layer_inputs[:, :, li]
        pli_out = _rms(gated @ lw["pli_proj"].T, lw["pli_norm"], eps)
        h = jnp.concatenate([corrected[:1], corrected[1:] + pli_out[None]], 0)

    # unembed: magnitude-matched mean of the streams
    outs = [h[0]]
    for i, wproj in enumerate(weights["altup_unembed"]):
        outs.append(_magnitude_match(h[0], h[i + 1] @ wproj.T.astype(compute_dtype)))
    hs = jnp.mean(jnp.stack(outs), axis=0)
    hs = _rms(hs, weights["final_norm"], eps)
    if logits_last_only:
        if last_indices is not None:
            hs = jnp.take_along_axis(
                hs, last_indices.astype(jnp.int32)[:, None, None], axis=1
            )
        else:
            hs = hs[:, -1:, :]
    logits = (hs @ weights["embed"].T.astype(compute_dtype)).astype(jnp.float32)
    if cfg.final_logit_softcap:
        logits = (
            jnp.tanh(logits / cfg.final_logit_softcap) * cfg.final_logit_softcap
        )
    return logits, {"k": kp, "v": vp}
