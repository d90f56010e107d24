"""HF checkpoint → GGUF conversion (the analog of llama.cpp's
``convert_hf_to_gguf.py``, which the reference relies on for its GGUF inputs;
also the backend of our CLI ``quantize`` command).

Writes spec-conformant GGUF: llama.cpp tensor naming, reversed-dim metadata,
and the LLaMA q/k RoPE permutation, so files we produce load in llama.cpp and
vice versa.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

import numpy as np

from .gguf.constants import GGMLType
from .gguf.writer import GGUFWriter
from .models.config import ModelConfig

_PERMUTED_QK_ARCHS = {"llama", "mistral", "granite"}


def tokenizer_metadata_from_hf(tokenizer) -> dict[str, Any]:
    """Extract `tokenizer.ggml.*` metadata from a tokenizers.Tokenizer so
    converted GGUF files are self-contained (byte-BPE models)."""
    import json as _json

    data = _json.loads(tokenizer.to_str())
    model = data.get("model", {})
    if model.get("type") != "BPE":
        return {}
    vocab = model["vocab"]
    tokens = [None] * len(vocab)
    for t, i in vocab.items():
        tokens[i] = t
    for added in data.get("added_tokens", []):
        i = added["id"]
        if i >= len(tokens):
            tokens.extend([None] * (i + 1 - len(tokens)))
        tokens[i] = added["content"]
    merges = [m if isinstance(m, str) else " ".join(m) for m in model.get("merges", [])]
    return {
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": [t if t is not None else f"<unused{i}>" for i, t in enumerate(tokens)],
        "tokenizer.ggml.merges": merges,
    }


def _permute_rows(w: np.ndarray, n_heads: int) -> np.ndarray:
    """llama.cpp `permute()`: HF rotate-half rows → GGUF interleaved rows."""
    n = w.shape[0]
    hd = n // n_heads
    return w.reshape(n_heads, 2, hd // 2, *w.shape[1:]).swapaxes(1, 2).reshape(w.shape)


# our layer-key → GGUF tensor-name suffix
_GGUF_NAMES = {
    "attn_norm": "attn_norm.weight",
    "wq": "attn_q.weight",
    "wk": "attn_k.weight",
    "wv": "attn_v.weight",
    "wo": "attn_output.weight",
    "wq_bias": "attn_q.bias",
    "wk_bias": "attn_k.bias",
    "wv_bias": "attn_v.bias",
    "q_norm": "attn_q_norm.weight",
    "k_norm": "attn_k_norm.weight",
    "ffn_norm": "ffn_norm.weight",
    "gate": "ffn_gate.weight",
    "up": "ffn_up.weight",
    "down": "ffn_down.weight",
    "post_attn_norm": "post_attention_norm.weight",
    "post_ffn_norm": "post_ffw_norm.weight",
    "router": "ffn_gate_inp.weight",
}

_HF_TO_KEY = {
    "input_layernorm.weight": "attn_norm",
    "self_attn.q_proj.weight": "wq",
    "self_attn.k_proj.weight": "wk",
    "self_attn.v_proj.weight": "wv",
    "self_attn.o_proj.weight": "wo",
    "self_attn.q_proj.bias": "wq_bias",
    "self_attn.k_proj.bias": "wk_bias",
    "self_attn.v_proj.bias": "wv_bias",
    "self_attn.q_norm.weight": "q_norm",
    "self_attn.k_norm.weight": "k_norm",
    "post_attention_layernorm.weight": "ffn_norm",
    "mlp.gate_proj.weight": "gate",
    "mlp.up_proj.weight": "up",
    "mlp.down_proj.weight": "down",
}


def _pick_type(name: str, arr: np.ndarray, quant: Optional[GGMLType]) -> GGMLType:
    if quant is None or arr.ndim != 2 or "norm" in name or name.endswith("bias"):
        return GGMLType.F32
    if arr.shape[-1] % 256 != 0:
        return GGMLType.F16
    if name in ("token_embd.weight", "output.weight"):
        # "sensitive tensor precision" policy (reference docs
        # quantization-types.md): embeddings/head at higher precision
        return GGMLType.Q8_0
    return quant


def convert_hf_to_gguf(
    sd: Mapping[str, np.ndarray],
    cfg: ModelConfig,
    out_path: str,
    *,
    quant: Optional[GGMLType] = None,
    tokenizer_metadata: Optional[Mapping[str, Any]] = None,
    imatrix: Optional[Mapping[str, np.ndarray]] = None,  # imatrix.py taps
) -> None:
    """Write a GGUF file from a HF state dict. ``imatrix`` switches the
    k-quant fit to the activation-weighted variant (imatrix-guided ISQ)."""
    arch = cfg.arch
    w = GGUFWriter(out_path)
    w.add_metadata("general.architecture", arch)
    w.add_metadata("general.name", f"{arch}-converted")
    w.add_metadata(f"{arch}.block_count", np.uint32(cfg.num_layers))
    w.add_metadata(f"{arch}.context_length", np.uint32(cfg.max_position_embeddings))
    w.add_metadata(f"{arch}.embedding_length", np.uint32(cfg.hidden_size))
    w.add_metadata(f"{arch}.feed_forward_length", np.uint32(cfg.intermediate_size))
    w.add_metadata(f"{arch}.attention.head_count", np.uint32(cfg.num_heads))
    w.add_metadata(f"{arch}.attention.head_count_kv", np.uint32(cfg.num_kv_heads))
    w.add_metadata(f"{arch}.attention.key_length", np.uint32(cfg.head_dim))
    w.add_metadata(f"{arch}.attention.value_length", np.uint32(cfg.head_dim))
    w.add_metadata(
        f"{arch}.attention.layer_norm_rms_epsilon", np.float32(cfg.rms_norm_eps)
    )
    w.add_metadata(f"{arch}.rope.freq_base", np.float32(cfg.rope_theta))
    w.add_metadata(f"{arch}.vocab_size", np.uint32(cfg.vocab_size))
    if cfg.bos_token_id is not None:
        w.add_metadata("tokenizer.ggml.bos_token_id", np.uint32(cfg.bos_token_id))
    if cfg.eos_token_ids:
        w.add_metadata("tokenizer.ggml.eos_token_id", np.uint32(cfg.eos_token_ids[0]))
    for key, value in (tokenizer_metadata or {}).items():
        w.add_metadata(key, value)

    prefix = "model." if any(k.startswith("model.") for k in sd) else ""
    permute = arch in _PERMUTED_QK_ARCHS

    def put(gguf_name: str, arr: np.ndarray, layer: int = -1, key: str = ""):
        t = _pick_type(gguf_name, arr, quant)
        if imatrix is not None and layer >= 0 and t is not None:
            from .gguf.quants import quantize_imatrix
            from .imatrix import imatrix_rows_for_key

            rows = imatrix_rows_for_key(imatrix, key)
            if rows is not None and rows.shape[-1] == arr.shape[-1]:
                raw = quantize_imatrix(
                    np.asarray(arr, np.float32), t, rows[layer % len(rows)]
                )
                w.add_raw_tensor(gguf_name, raw, tuple(arr.shape), t)
                return
        w.add_tensor(gguf_name, np.asarray(arr, np.float32), t)

    put("token_embd.weight", sd[prefix + "embed_tokens.weight"])
    put("output_norm.weight", sd[prefix + "norm.weight"])
    if "lm_head.weight" in sd:
        put("output.weight", sd["lm_head.weight"])

    for i in range(cfg.num_layers):
        lp = f"{prefix}layers.{i}."
        for suffix, key in _HF_TO_KEY.items():
            if lp + suffix not in sd:
                continue
            arr = sd[lp + suffix]
            if permute and key in ("wq", "wk"):
                heads = cfg.num_heads if key == "wq" else cfg.num_kv_heads
                arr = _permute_rows(arr, heads)
            put(f"blk.{i}.{_GGUF_NAMES[key]}", arr, layer=i, key=key)

    w.write()
