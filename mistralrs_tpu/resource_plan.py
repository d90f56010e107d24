"""Paged-KV resource planning across multiple loaded models (the analog of
`plan_paged_kv`, mistralrs-core/src/resource_plan.rs:35): divide the HBM
budget left after weights fairly by each model's per-token KV cost so every
model gets the same usable context."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from .models.config import ModelConfig


@dataclass
class KvPlanEntry:
    model_id: str
    num_blocks: int
    context_tokens: int


def plan_paged_kv(
    models: Sequence[tuple[str, ModelConfig, int]],  # (id, cfg, weight_bytes)
    *,
    hbm_bytes: int,
    block_size: int = 16,
    kv_dtype_bytes: int = 2,
    reserve_frac: float = 0.1,
) -> list[KvPlanEntry]:
    """Fair-context split: each model receives blocks proportional to its
    per-token KV cost so all models support the same context length."""
    budget = hbm_bytes * (1 - reserve_frac) - sum(w for _, _, w in models)
    if budget <= 0:
        raise ValueError("weights alone exceed the HBM budget")
    costs = [
        (mid, cfg, cfg.num_layers * cfg.kv_dim * 2 * kv_dtype_bytes)
        for mid, cfg, _ in models
    ]
    total_per_token = sum(c for _, _, c in costs)
    fair_tokens = int(budget // total_per_token)
    out = []
    for mid, cfg, per_token in costs:
        blocks = max(1, fair_tokens // block_size)
        out.append(
            KvPlanEntry(
                model_id=mid,
                num_blocks=blocks,
                context_tokens=blocks * block_size,
            )
        )
    return out
