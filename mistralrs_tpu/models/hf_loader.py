"""HF safetensors → model weights loader (the analog of the reference's
`NormalPipeline` load path: `mistralrs-core/src/pipeline/normal.rs:353` with
`mistralrs-quant/src/safetensors.rs` mmap shard slicing).

Loads a HF-format model directory (``config.json`` + ``*.safetensors``) into
the stacked-layer pytree of :mod:`.llama`, optionally applying ISQ
(in-situ quantization to a GGUF k-quant type) per tensor — the analog of the
reference's ISQ flow (`pipeline/isq_flow/`).
"""

from __future__ import annotations

import json
import os
import re
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Any, Callable, Mapping, Optional

import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType
from ..quant.qtensor import QTensor
from .config import ModelConfig, config_from_hf
from .llama import layer_rope_flags, layer_windows

# tensors that stay dense regardless of ISQ (reference: "sensitive tensor
# precision", docs/reference/quantization-types.md — norms stay fp; embeddings
# and lm_head get a higher-precision quant, handled by the isq plan)
_NORM_RE = re.compile(r"(norm|layernorm)", re.IGNORECASE)


def load_safetensors_dir(path: str | os.PathLike) -> dict[str, np.ndarray]:
    """mmap-load every ``*.safetensors`` shard in a directory."""
    from safetensors import safe_open

    tensors: dict[str, np.ndarray] = {}
    files = sorted(Path(path).glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no safetensors files in {path}")
    for f in files:
        with safe_open(str(f), framework="np") as st:
            for name in st.keys():
                tensors[name] = st.get_tensor(name)
    return tensors


# HF tensor name templates for the llama superfamily
_HF_LAYER_MAP = {
    "input_layernorm.weight": "attn_norm",
    "self_attn.q_proj.weight": "wq",
    "self_attn.k_proj.weight": "wk",
    "self_attn.v_proj.weight": "wv",
    "self_attn.o_proj.weight": "wo",
    "self_attn.q_proj.bias": "wq_bias",
    "self_attn.k_proj.bias": "wk_bias",
    "self_attn.v_proj.bias": "wv_bias",
    "self_attn.o_proj.bias": "wo_bias",
    "self_attn.q_norm.weight": "q_norm",
    "self_attn.k_norm.weight": "k_norm",
    "self_attn.query_layernorm.weight": "q_norm",  # hunyuan (post-rope)
    "self_attn.key_layernorm.weight": "k_norm",
    "post_attention_layernorm.weight": "ffn_norm",
    "mlp.gate_proj.weight": "gate",
    "mlp.up_proj.weight": "up",
    "mlp.down_proj.weight": "down",
    "mlp.c_fc.weight": "up",  # starcoder2 gateless MLP
    "mlp.c_proj.weight": "down",
    "mlp.c_fc.bias": "up_bias",
    "mlp.c_proj.bias": "down_bias",
    "input_layernorm.bias": "attn_norm_bias",
    "post_attention_layernorm.bias": "ffn_norm_bias",
    "pre_feedforward_layernorm.weight": "ffn_norm",  # gemma2/3
    "post_feedforward_layernorm.weight": "post_ffn_norm",
    "block_sparse_moe.gate.weight": "router",  # mixtral
    "mlp.gate.weight": "router",  # qwen-moe
    "post_self_attn_layernorm.weight": "post_attn_norm",  # glm4 sandwich
    "post_mlp_layernorm.weight": "post_ffn_norm",
    "self_attn.dense.weight": "wo",  # phi2
    "self_attn.dense.bias": "wo_bias",
    "mlp.fc1.weight": "up",  # phi2 gateless MLP
    "mlp.fc1.bias": "up_bias",
    "mlp.fc2.weight": "down",
    "mlp.fc2.bias": "down_bias",
    "mlp.shared_expert_gate.weight": "shared_expert_gate",  # qwen2moe
    "mlp.shared_expert.gate_proj.weight": "se_gate",
    "mlp.shared_expert.up_proj.weight": "se_up",
    "mlp.shared_expert.down_proj.weight": "se_down",
    "mlp.shared_experts.gate_proj.weight": "se_gate",  # glm4moe / deepseek
    "mlp.shared_experts.up_proj.weight": "se_up",
    "mlp.shared_experts.down_proj.weight": "se_down",
    "mlp.gate.wg.weight": "router",  # hunyuan_moe
    "mlp.shared_mlp.gate_proj.weight": "se_gate",  # hunyuan_moe
    "mlp.shared_mlp.up_proj.weight": "se_up",
    "mlp.shared_mlp.down_proj.weight": "se_down",
    "mlp.gate.e_score_correction_bias": "router_correction_bias",
    "self_attn.sinks": "sinks",  # gpt_oss
    "mlp.router.weight": "router",
    "mlp.router.bias": "router_bias",
    "mlp.experts.gate_up_proj": "oss_gate_up",  # [E, H, 2I], interleaved
    "mlp.experts.gate_up_proj_bias": "oss_gate_up_bias",
    "mlp.experts.down_proj": "oss_down",  # [E, I, H]
    "mlp.experts.down_proj_bias": "oss_down_bias",
}
# gemma2/3 use post_attention_layernorm as the *post* norm and
# pre_feedforward_layernorm as the pre-FFN norm; remap per-arch below.
_GEMMA_LAYER_MAP = dict(_HF_LAYER_MAP)
_GEMMA_LAYER_MAP["post_attention_layernorm.weight"] = "post_attn_norm"

# phi3 fused projections → split at load
_PHI3_FUSED = {
    "self_attn.qkv_proj.weight": ("wq", "wk", "wv"),
    "mlp.gate_up_proj.weight": ("gate", "up"),
}


_ROW_PARALLEL_KEYS = {"wo", "down", "exp_down", "se_down"}


def _quantize_tensor(
    w: np.ndarray, t: GGMLType, chunks: int = 1,
    imatrix_row: Optional[np.ndarray] = None,
) -> QTensor:
    from ..gguf.planar import to_planar
    from ..gguf.quants import quantize as gguf_quantize
    from ..gguf.quants import quantize_imatrix

    w = np.asarray(w, np.float32)
    if imatrix_row is not None and imatrix_row.shape[-1] == w.shape[-1]:
        raw = quantize_imatrix(w, t, imatrix_row)
    else:
        raw = gguf_quantize(w, t)
    return QTensor.from_planar(to_planar(raw, t), w.shape, ggml_type=t, chunks=chunks)


def default_isq_plan(
    isq: Optional[GGMLType],
) -> Callable[[str, tuple[int, ...]], Optional[GGMLType]]:
    """Per-tensor quant-type resolution (the analog of
    `pipeline/isq_flow/plan.rs`): norms/biases dense; embeddings & lm_head at
    Q8_0 ("sensitive tensor precision"); everything else at ``isq``."""

    def plan(name: str, shape: tuple[int, ...]) -> Optional[GGMLType]:
        if isq is None:
            return None
        if len(shape) != 2 or _NORM_RE.search(name) or name.endswith("bias"):
            return None
        if shape[1] % 256 != 0:
            return None  # k-quant superblocks need K % 256 == 0
        if "embed" in name or "lm_head" in name:
            return GGMLType.Q8_0
        return isq

    return plan


def weights_from_state_dict(
    sd: Mapping[str, np.ndarray],
    cfg: ModelConfig,
    *,
    dtype=jnp.bfloat16,
    isq: Optional[GGMLType] = None,
    isq_plan: Optional[Callable[[str, tuple[int, ...]], Optional[GGMLType]]] = None,
    num_threads: int = 8,
    row_parallel_chunks: int = 1,
    quant_config: Optional[Mapping[str, Any]] = None,
    topology=None,  # Topology: per-layer ISQ overrides (topology.py)
    imatrix: Optional[Mapping[str, np.ndarray]] = None,  # imatrix.py taps
) -> dict:
    """Build the stacked-layer weights pytree from a HF state dict.

    ``quant_config`` is the HF ``quantization_config`` dict: GPTQ/AWQ
    checkpoints store ``<name>.qweight/qzeros/scales`` instead of
    ``<name>.weight``; those decode straight into planar QTensors (see
    `quant/gptq_awq.py`).
    """
    plan = isq_plan or default_isq_plan(isq)
    prefix = "model." if any(k.startswith("model.") for k in sd) else ""
    # gemma1 keeps the standard pre-FFN placement; only 2/3 remap it
    layer_map = (
        _GEMMA_LAYER_MAP if cfg.arch in ("gemma2", "gemma3") else _HF_LAYER_MAP
    )
    quant_method = (quant_config or {}).get("quant_method")
    q_bits = int((quant_config or {}).get("bits", 4))
    # GPTQ checkpoints are "v1" (zero+1) unless checkpoint_format says v2
    gptq_zero_offset = 0 if (quant_config or {}).get("checkpoint_format") == "gptq_v2" else 1

    def get(name: str, key: str = "", chunks: int = 1):
        """Fetch a tensor; decodes GPTQ/AWQ triplets when present."""
        base = prefix + name
        arr = sd.get(base)
        if arr is not None:
            if quant_method == "bitsandbytes":
                from ..quant.bnb import decode_bnb_param

                dec = decode_bnb_param(sd, base)
                if dec is not None:
                    return dec
            return arr
        if name.endswith(".weight") and quant_method in ("gptq", "awq"):
            stem = base[: -len(".weight")]
            qw = sd.get(stem + ".qweight")
            if qw is not None:
                from ..quant.gptq_awq import awq_to_qtensor, gptq_to_qtensor

                if quant_method == "awq":
                    return awq_to_qtensor(
                        qw, sd[stem + ".qzeros"], sd[stem + ".scales"],
                        bits=q_bits, chunks=chunks,
                    )
                return gptq_to_qtensor(
                    qw, sd[stem + ".qzeros"], sd[stem + ".scales"],
                    g_idx=sd.get(stem + ".g_idx"), bits=q_bits,
                    zero_offset=gptq_zero_offset, chunks=chunks,
                )
        if quant_method == "mxfp4":
            # gpt-oss MXFP4 expert banks: <stem>_blocks/_scales store the
            # TRANSPOSED layout ([..., out, in_blocks]); decode then swap
            # back to the dense orientation
            from ..quant.mxfp4 import decode_mxfp4_param

            stem = base[: -len(".weight")] if base.endswith(".weight") else base
            arr = decode_mxfp4_param(sd, stem)
            if arr is not None:
                return np.swapaxes(arr, -1, -2)
        return None

    # collect per-layer dense tensors first
    per_layer: dict[str, list[np.ndarray]] = {}

    def add(key: str, i: int, arr: np.ndarray):
        per_layer.setdefault(key, [None] * cfg.num_layers)[i] = arr

    for i in range(cfg.num_layers):
        lp = f"layers.{i}."
        for suffix, key in layer_map.items():
            chunks = row_parallel_chunks if key in _ROW_PARALLEL_KEYS else 1
            arr = get(lp + suffix, key, chunks)
            if arr is not None:
                add(key, i, arr)
        for suffix, keys in _PHI3_FUSED.items():
            arr = get(lp + suffix)
            if arr is not None:
                if len(keys) == 3:
                    qd, kvd = cfg.q_dim, cfg.kv_dim
                    add("wq", i, arr[:qd])
                    add("wk", i, arr[qd : qd + kvd])
                    add("wv", i, arr[qd + kvd :])
                else:
                    half = arr.shape[0] // 2
                    add("gate", i, arr[:half])
                    add("up", i, arr[half:])
        # MoE experts (mixtral: block_sparse_moe.experts.N.w1/w3/w2;
        # qwen-moe: mlp.experts.N.gate_proj/up_proj/down_proj)
        for e in range(cfg.num_experts):
            for hf_names, key in (
                (("block_sparse_moe.experts.%d.w1.weight", "mlp.experts.%d.gate_proj.weight"), "exp_gate"),
                (("block_sparse_moe.experts.%d.w3.weight", "mlp.experts.%d.up_proj.weight"), "exp_up"),
                (("block_sparse_moe.experts.%d.w2.weight", "mlp.experts.%d.down_proj.weight"), "exp_down"),
            ):
                for hf_name in hf_names:
                    arr = get(lp + hf_name % e)
                    if arr is not None:
                        per_layer.setdefault(key, [None] * (cfg.num_layers * cfg.num_experts))[
                            i * cfg.num_experts + e
                        ] = arr

    def build_stacked(key: str, tensors: list):
        import jax

        if isinstance(tensors[0], QTensor):  # pre-quantized (GPTQ/AWQ)
            return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *tensors)
        name = f"layers.{key}"
        base_t = plan(name, tensors[0].shape)
        if topology is not None and base_t is not None:
            types = [
                topology.type_for_layer(i) if topology.type_for_layer(i) is not None
                else base_t
                for i in range(len(tensors))
            ]
        else:
            types = [base_t] * len(tensors)
        if all(t is None for t in types):
            return jnp.asarray(np.stack(tensors), dtype)
        if any(t is None for t in types):
            raise ValueError(
                f"{key}: topology mixes quantized and unquantized layers"
            )
        chunks = row_parallel_chunks if key in _ROW_PARALLEL_KEYS else 1
        im_rows = None
        if imatrix is not None:
            from ..imatrix import imatrix_rows_for_key

            im_rows = imatrix_rows_for_key(imatrix, key)
        with ThreadPoolExecutor(num_threads) as ex:
            qts = list(
                ex.map(
                    lambda wt: _quantize_tensor(
                        wt[0], wt[1], chunks,
                        None if im_rows is None else im_rows[wt[2] % len(im_rows)],
                    ),
                    [(w_, t_, i_) for i_, (w_, t_) in enumerate(zip(tensors, types))],
                )
            )
        if len(set(types)) > 1:
            # mixed types per layer: re-extract planar and widen to a common
            # form so the stack stays uniform (same trick as the GGUF loader)
            from ..gguf.planar import widen_planar, to_planar
            from ..gguf.quants import quantize as gguf_quantize

            planars = []
            for w, t in zip(tensors, types):
                w32 = np.asarray(w, np.float32)
                planars.append(widen_planar(to_planar(gguf_quantize(w32, t), t)))
            qts = [
                QTensor.from_planar(p, np.asarray(w).shape)
                for p, w in zip(planars, tensors)
            ]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *qts)

    def assemble(lo: int, hi: int) -> dict:
        """Stack layers [lo, hi) into one uniform pytree segment."""
        seg: dict[str, Any] = {}
        for key, tensors in per_layer.items():
            if key.startswith("exp_"):
                continue
            sub = tensors[lo:hi]
            if all(x is None for x in sub):
                continue
            if any(x is None for x in sub):
                missing = [i + lo for i, x in enumerate(sub) if x is None]
                raise ValueError(f"{key}: missing layers {missing}")
            seg[key] = build_stacked(key, sub)

        if "se_gate" in seg:  # qwen2moe/glm4moe always-on shared expert
            seg["shared_expert"] = {
                "gate": seg.pop("se_gate"),
                "up": seg.pop("se_up"),
                "down": seg.pop("se_down"),
            }
        if "oss_gate_up" in seg:  # gpt_oss pre-stacked expert banks
            # scan iterates leading (expert) axis: [L, E, ...] → xs [E, ...]
            seg["experts"] = {
                "gate_up": seg.pop("oss_gate_up"),
                "gate_up_bias": seg.pop("oss_gate_up_bias"),
                "down": seg.pop("oss_down"),
                "down_bias": seg.pop("oss_down_bias"),
            }
        if "exp_gate" in per_layer:
            import jax

            E = cfg.num_experts
            sub = per_layer["exp_gate"][lo * E : hi * E]
            if not all(x is None for x in sub):
                experts: dict[str, Any] = {}
                for key, out_key in (
                    ("exp_gate", "gate"), ("exp_up", "up"), ("exp_down", "down")
                ):
                    tensors = per_layer[key][lo * E : hi * E]
                    per_l = [
                        build_stacked(key, tensors[l * E : (l + 1) * E])
                        for l in range(hi - lo)
                    ]
                    experts[out_key] = jax.tree_util.tree_map(
                        lambda *xs: jnp.stack(xs), *per_l
                    )
                seg["experts"] = experts
        return seg

    # dense-prefix MoE (glm4moe/deepseek-style first_k_dense_replace): the
    # prefix and MoE layers have different structures → two stacked segments
    k0 = cfg.first_k_dense if (cfg.num_experts and cfg.first_k_dense) else 0
    k0 = min(k0, cfg.num_layers)
    if 0 < k0 < cfg.num_layers:
        layers = assemble(0, k0)
        layers_moe: Optional[dict] = assemble(k0, cfg.num_layers)
    else:
        layers = assemble(0, cfg.num_layers)
        layers_moe = None

    embed = get("embed_tokens.weight")
    lm_head = sd.get("lm_head.weight")
    lm_head_bias = sd.get("lm_head.bias")  # phi2
    final_norm = get("norm.weight")
    if final_norm is None:
        final_norm = get("final_layernorm.weight")  # phi2
    final_norm_bias = get("norm.bias")
    if final_norm_bias is None:
        final_norm_bias = get("final_layernorm.bias")

    def maybe_quant(name: str, arr):
        if arr is None:
            return None
        if isinstance(arr, QTensor):
            return arr
        t = plan(name, arr.shape)
        if t is None:
            return jnp.asarray(arr, dtype)
        return _quantize_tensor(arr, t)

    out = {
        "embed": maybe_quant("embed_tokens", embed),
        "layers": layers,
        "final_norm": jnp.asarray(final_norm, dtype),
        "lm_head": maybe_quant("lm_head", lm_head),
        "layer_windows": jnp.asarray(layer_windows(cfg)),
        "layer_use_rope": jnp.asarray(layer_rope_flags(cfg)),
    }
    if layers_moe is not None:
        out["layers_moe"] = layers_moe
    if final_norm_bias is not None:
        out["final_norm_bias"] = jnp.asarray(final_norm_bias, dtype)
    if lm_head_bias is not None:
        out["lm_head_bias"] = jnp.asarray(lm_head_bias, dtype)
    from ..quant.qtensor import apply_scale_dtype

    return apply_scale_dtype(out)


def load_hf_model(
    path: str | os.PathLike,
    *,
    dtype=jnp.bfloat16,
    isq: Optional[GGMLType] = None,
    row_parallel_chunks: int = 1,
    from_uqff: Optional[str] = None,
    imatrix: Optional[Mapping[str, np.ndarray]] = None,
) -> tuple[ModelConfig, dict, dict[str, Any]]:
    """Load a HF model directory (plain, GPTQ or AWQ).

    ``from_uqff``: overlay a mistral.rs-produced UQFF artifact — its
    pre-quantized layers (decoded through the GGUF codecs) replace the base
    checkpoint's tensors, the reference's `--from-uqff` flow
    (`mistralrs-quant/src/uqff/reader.rs`).
    Returns (config, weights, config-dict)."""
    path = Path(path)
    with open(path / "config.json") as f:
        hf_cfg = json.load(f)
    cfg = config_from_hf(hf_cfg)
    sd = dict(load_safetensors_dir(path))
    if from_uqff is not None:
        from ..uqff import load_reference_uqff

        sd.update(load_reference_uqff(from_uqff))
    weights = weights_from_state_dict(
        sd, cfg, dtype=dtype, isq=isq,
        row_parallel_chunks=row_parallel_chunks,
        quant_config=hf_cfg.get("quantization_config"),
        imatrix=imatrix,
    )
    return cfg, weights, hf_cfg
