"""GGUF → model weights loader (the analog of the reference's GGUF pipeline,
`mistralrs-core/src/pipeline/gguf.rs` + `models/quantized_llama.rs`).

Responsibilities:
* map GGUF tensor names (`blk.N.attn_q.weight`, ...) onto the stacked-layer
  pytree consumed by :mod:`.llama`;
* undo the llama.cpp HF→GGUF RoPE permutation on ``attn_q``/``attn_k`` so one
  rotate-half RoPE implementation serves all weight sources;
* stack per-layer tensors for `lax.scan`. When a checkpoint mixes quant types
  across layers for the same tensor (e.g. Q4_K_M files use Q6_K for early
  ``ffn_down`` layers), the minority layers are *widened* to a common planar
  form (int8 codes, group 16, explicit bias) so the stack stays uniform —
  numerics are preserved exactly, only the packing density of those layers
  drops.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.planar import PLANAR_TYPES, PlanarQuant, to_planar, widen_planar
from ..gguf.reader import GGUFContent
from ..quant.qtensor import QTensor
from .config import ModelConfig, config_from_gguf
from .llama import layer_rope_flags, layer_windows

# archs whose GGUF conversion permutes q/k for interleaved ("NORM") RoPE
_PERMUTED_QK_ARCHS = {"llama", "mistral", "granite"}

_DENSE_TYPES = {GGMLType.F32, GGMLType.F16, GGMLType.BF16}


def _unpermute_rows(w: np.ndarray, n_heads: int) -> np.ndarray:
    """Invert llama.cpp's `permute()` (convert_hf_to_gguf.py LlamaModel):
    GGUF interleaved-RoPE row order → HF rotate-half row order."""
    n, k = w.shape
    hd = n // n_heads
    return (
        w.reshape(n_heads, hd // 2, 2, k).swapaxes(1, 2).reshape(n, k)
    )


def _unpermute_planar(p: PlanarQuant, shape: tuple[int, int], n_heads: int) -> PlanarQuant:
    """Row-permute a planar tensor (permutation acts on out-features only,
    so codes and per-group scales permute identically)."""
    n, k = shape
    gs = p.group_size
    perm = _unpermute_rows(np.arange(n)[:, None], n_heads)[:, 0]
    return PlanarQuant(
        q=p.q.reshape(n, k)[perm].reshape(-1),
        scale=p.scale.reshape(n, k // gs)[perm].reshape(-1),
        bias=None if p.bias is None else p.bias.reshape(n, k // gs)[perm].reshape(-1),
        group_size=gs,
        code_bits=p.code_bits,
        signed=p.signed,
    )


class _Tensor:
    """A loaded tensor: either dense (np float) or planar-quantized."""

    __slots__ = ("dense", "planar", "shape", "ggml_type")

    def __init__(self, dense, planar, shape, ggml_type):
        self.dense = dense
        self.planar = planar
        self.shape = shape
        self.ggml_type = ggml_type

    def to_weight(self, dtype=jnp.bfloat16):
        if self.dense is not None:
            return jnp.asarray(self.dense, dtype)
        return QTensor.from_planar(self.planar, self.shape, ggml_type=self.ggml_type)


def _load_tensor(content: GGUFContent, name: str, dequant_small: bool) -> _Tensor:
    info = content.tensor_info(name)
    raw = content.tensor_bytes(name)
    shape = tuple(info.shape)
    if info.ggml_type in _DENSE_TYPES or dequant_small or info.ggml_type not in PLANAR_TYPES:
        from ..gguf.quants import dequantize

        return _Tensor(dequantize(raw, info.ggml_type, shape), None, shape, info.ggml_type)
    return _Tensor(None, to_planar(raw, info.ggml_type), shape, info.ggml_type)


def _stack_weights(tensors: list[_Tensor], dtype=jnp.bfloat16):
    """Stack one tensor-per-layer into a single leading-L weight."""
    if all(t.dense is not None for t in tensors):
        return jnp.asarray(np.stack([t.dense for t in tensors]), dtype)
    if any(t.dense is not None for t in tensors):
        raise ValueError("cannot stack mixed dense/quantized layer tensors")
    kinds = {(t.ggml_type, t.planar.group_size, t.planar.signed, t.planar.bias is None)
             for t in tensors}
    if len(kinds) > 1:
        planars = [widen_planar(t.planar) for t in tensors]
        gg = None
    else:
        planars = [t.planar for t in tensors]
        gg = tensors[0].ggml_type
    qts = [QTensor.from_planar(p, t.shape, ggml_type=gg) for p, t in zip(planars, tensors)]
    first = qts[0]
    return replace(
        first,
        data=jnp.stack([q.data for q in qts]),
        scale=jnp.stack([q.scale for q in qts]),
        bias=None if first.bias is None else jnp.stack([q.bias for q in qts]),
    )


# GGUF name → our layer-weight key (llama superfamily)
_LAYER_MAP = {
    "attn_norm.weight": "attn_norm",
    "attn_q.weight": "wq",
    "attn_k.weight": "wk",
    "attn_v.weight": "wv",
    "attn_output.weight": "wo",
    "attn_q.bias": "wq_bias",
    "attn_k.bias": "wk_bias",
    "attn_v.bias": "wv_bias",
    "attn_output.bias": "wo_bias",
    "attn_q_norm.weight": "q_norm",
    "attn_k_norm.weight": "k_norm",
    "ffn_norm.weight": "ffn_norm",
    "ffn_gate.weight": "gate",
    "ffn_up.weight": "up",
    "ffn_down.weight": "down",
    "post_attention_norm.weight": "post_attn_norm",
    "post_ffw_norm.weight": "post_ffn_norm",
    "ffn_gate_inp.weight": "router",
}


def load_gguf_model(
    path: str, dtype=jnp.bfloat16
) -> tuple[ModelConfig, dict, dict[str, Any]]:
    """Load a GGUF checkpoint. Returns (config, weights-pytree, metadata)."""
    content = GGUFContent.open(path)
    md = content.metadata
    cfg = config_from_gguf(md)
    permute_qk = cfg.arch in _PERMUTED_QK_ARCHS

    def load(name, dequant_small=False):
        return _load_tensor(content, name, dequant_small)

    embed = load("token_embd.weight")
    if cfg.vocab_size is None:
        cfg.vocab_size = embed.shape[0]

    per_layer: dict[str, list[_Tensor]] = {}
    L = cfg.num_layers
    for i in range(L):
        prefix = f"blk.{i}."
        for suffix, key in _LAYER_MAP.items():
            name = prefix + suffix
            if name not in content:
                continue
            is_norm = key.endswith("norm") or key.endswith("_bias")
            t = load(name, dequant_small=is_norm)
            if permute_qk and key in ("wq", "wk"):
                heads = cfg.num_heads if key == "wq" else cfg.num_kv_heads
                if t.dense is not None:
                    t.dense = _unpermute_rows(t.dense, heads)
                else:
                    t.planar = _unpermute_planar(t.planar, t.shape, heads)
            per_layer.setdefault(key, []).append(t)
        # MoE stacked expert tensors (ffn_gate_exps.weight: [E, I, H]):
        # split per expert so each (layer, expert) is a 2-D weight
        for suffix, key in (
            ("ffn_gate_exps.weight", "exp_gate"),
            ("ffn_up_exps.weight", "exp_up"),
            ("ffn_down_exps.weight", "exp_down"),
        ):
            name = prefix + suffix
            if name in content:
                for t in _split_experts(load(name)):
                    per_layer.setdefault(key, []).append(t)

    layers: dict[str, Any] = {}
    n_exp = cfg.num_experts
    for key, tensors in per_layer.items():
        if key.startswith("exp_"):
            continue
        if len(tensors) != L:
            raise ValueError(f"tensor {key}: found {len(tensors)} of {L} layers")
        layers[key] = _stack_weights(tensors, dtype)

    # MoE expert tensors: leaves stacked [L, E, ...] — the outer layer scan
    # slices L, then the model's inner expert scan slices E.
    if "exp_gate" in per_layer:
        import jax

        experts: dict[str, Any] = {}
        for key, out_key in (("exp_gate", "gate"), ("exp_up", "up"), ("exp_down", "down")):
            tensors = per_layer[key]  # L * E tensors, layer-major
            if len(tensors) != L * n_exp:
                raise ValueError(f"{key}: found {len(tensors)}, want {L * n_exp}")
            per_l = [
                _stack_weights(tensors[l * n_exp : (l + 1) * n_exp], dtype)
                for l in range(L)
            ]  # each: leaves [E, ...]
            experts[out_key] = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *per_l
            )
        layers["experts"] = experts

    weights = {
        "embed": embed.to_weight(dtype),
        "layers": layers,
        "final_norm": load("output_norm.weight", dequant_small=True).to_weight(dtype),
        "lm_head": (
            load("output.weight").to_weight(dtype) if "output.weight" in content else None
        ),
        "layer_windows": jnp.asarray(layer_windows(cfg)),
        "layer_use_rope": jnp.asarray(layer_rope_flags(cfg)),
    }
    from ..quant.qtensor import apply_scale_dtype

    return cfg, apply_scale_dtype(weights), md


def _split_experts(t: _Tensor) -> list[_Tensor]:
    """Split a 3-D [E, N, K] expert tensor into E 2-D tensors."""
    e, n, k = t.shape
    if t.dense is not None:
        return [_Tensor(t.dense[i], None, (n, k), t.ggml_type) for i in range(e)]
    p = t.planar
    q = p.q.reshape(e, -1)
    s = p.scale.reshape(e, -1)
    b = None if p.bias is None else p.bias.reshape(e, -1)
    return [
        _Tensor(
            None,
            PlanarQuant(q[i], s[i], None if b is None else b[i],
                        p.group_size, p.code_bits, p.signed),
            (n, k),
            t.ggml_type,
        )
        for i in range(e)
    ]
