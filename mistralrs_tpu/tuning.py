"""Hardware-aware quantization/tuning recommendation — the analog of
`auto_tune` (`mistralrs-core/src/tuning.rs:482`): given a model config and
the chip's HBM budget, report which quant levels fit (weights + KV cache +
activations) with quality tiers, and recommend the best-fitting one.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from .models.config import ModelConfig

# quality tiers, best first (reference docs/quantization-types.md ordering)
QUANT_LEVELS = [
    ("bf16", 16.0, "full precision"),
    ("q8_0", 8.5, "near-lossless"),
    ("q6k", 6.6, "excellent"),
    ("q5k", 5.7, "very good"),
    ("q4k", 4.8, "good (recommended floor for production)"),
    ("q4_0", 4.6, "fair"),
    ("q3k", 3.5, "degraded"),
    ("q2k", 2.8, "heavily degraded"),
]

V5E_HBM_BYTES = 16 << 30
V5P_HBM_BYTES = 95 << 30
V6E_HBM_BYTES = 32 << 30


def _param_count(cfg: ModelConfig) -> int:
    H, I, L, V = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers, cfg.vocab_size
    attn = H * cfg.q_dim + 2 * H * cfg.kv_dim + cfg.q_dim * H
    if cfg.num_experts:
        moe_i = cfg.moe_intermediate_size or I
        mlp = cfg.num_experts * 3 * H * moe_i + H * cfg.num_experts
    else:
        mlp = 3 * H * I
    embed = V * H * (1 if cfg.tie_word_embeddings else 2)
    return L * (attn + mlp) + embed


@dataclass
class TuneEntry:
    quant: str
    quality: str
    weight_gb: float
    kv_gb: float
    total_gb: float
    fits: bool
    max_context_tokens: int


def auto_tune(
    cfg: ModelConfig,
    *,
    hbm_bytes: int = V5E_HBM_BYTES,
    context_len: int = 4096,
    batch: int = 8,
    kv_dtype_bytes: int = 2,
    activation_reserve_frac: float = 0.1,
) -> dict:
    """Fit report + recommendation."""
    params = _param_count(cfg)
    kv_per_token = cfg.num_layers * cfg.kv_dim * 2 * kv_dtype_bytes
    kv_bytes = kv_per_token * context_len * batch
    budget = hbm_bytes * (1.0 - activation_reserve_frac)
    entries = []
    recommended: Optional[str] = None
    for name, bpw, quality in QUANT_LEVELS:
        weight_bytes = int(params * bpw / 8)
        total = weight_bytes + kv_bytes
        fits = total <= budget
        free_for_kv = max(budget - weight_bytes, 0)
        max_ctx = int(free_for_kv // max(kv_per_token * batch, 1))
        entries.append(
            TuneEntry(
                quant=name, quality=quality,
                weight_gb=round(weight_bytes / 2**30, 2),
                kv_gb=round(kv_bytes / 2**30, 2),
                total_gb=round(total / 2**30, 2),
                fits=fits, max_context_tokens=max_ctx,
            )
        )
        if fits and recommended is None:
            recommended = name
    return {
        "params_b": round(params / 1e9, 2),
        "hbm_gb": round(hbm_bytes / 2**30, 1),
        "context_len": context_len,
        "batch": batch,
        "recommended": recommended,
        "entries": [e.__dict__ for e in entries],
    }


def recommend_mesh(
    cfg: ModelConfig,
    n_chips: int,
    *,
    hbm_bytes: int = V5E_HBM_BYTES,
    context_len: int = 4096,
    batch: int = 8,
    quant_bpw: float = 4.8,  # q4k default
    kv_dtype_bytes: int = 2,
    activation_reserve_frac: float = 0.1,
) -> dict:
    """(tp, dp) mesh recommendation — the TPU analog of the reference's
    auto device mapping (`pipeline/loaders/auto_device_map.rs`): instead of
    per-layer GPU offload, pick the smallest tensor-parallel degree whose
    per-chip share (weights/tp + this group's KV + activations) fits HBM,
    and spend the remaining chips on data parallelism (throughput).

    TP must divide the head counts and FFN width (the same auto-step-down
    rule as `resolve_tensor_parallelism`, distributed.rs:67); MoE experts
    shard expert-parallel when tp divides them."""
    params = _param_count(cfg)
    weight_bytes = int(params * quant_bpw / 8)
    kv_per_token = cfg.num_layers * cfg.kv_dim * 2 * kv_dtype_bytes
    budget = hbm_bytes * (1.0 - activation_reserve_frac)

    def divides(tp: int) -> bool:
        if cfg.num_heads % tp or cfg.num_kv_heads % tp:
            return False
        if cfg.num_experts:
            if cfg.num_experts % tp:
                return False
        elif cfg.intermediate_size % tp:
            return False
        return True

    candidates = []
    for tp in range(1, n_chips + 1):
        if n_chips % tp or not divides(tp):
            continue
        dp = n_chips // tp
        if batch % dp:
            continue
        per_chip_w = weight_bytes / tp
        group_batch = batch // dp
        kv = kv_per_token * context_len * group_batch
        total = per_chip_w + kv
        fits = total <= budget
        free_for_kv = max(budget - per_chip_w, 0)
        max_ctx = int(free_for_kv // max(kv_per_token * group_batch, 1))
        candidates.append({
            "tp": tp, "dp": dp, "fits": fits,
            "per_chip_gb": round(total / 2**30, 2),
            "weight_share_gb": round(per_chip_w / 2**30, 2),
            "kv_gb": round(kv / 2**30, 2),
            "max_context_tokens": max_ctx,
        })
    # smallest fitting tp (most dp) wins; else the largest-tp candidate
    # (closest to fitting) so the caller sees what would be needed
    fitting = [c for c in candidates if c["fits"]]
    pick = (min(fitting, key=lambda c: c["tp"]) if fitting
            else (max(candidates, key=lambda c: c["tp"])
                  if candidates else None))
    return {
        "n_chips": n_chips,
        "quant_bpw": quant_bpw,
        "recommended": None if pick is None else
        {"tp": pick["tp"], "dp": pick["dp"]},
        "fits": bool(pick and pick["fits"]),
        "candidates": candidates,
    }
