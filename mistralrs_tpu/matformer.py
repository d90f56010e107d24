"""Matformer elastic submodel slicing (the analog of
`mistralrs-core/src/matformer.rs` + `matformer_configs/`): carve a smaller
nested model out of a Gemma3n-style Matryoshka checkpoint by keeping a
per-layer FFN prefix and skipping whole layers.

Config format (reference-compatible subset):

    name: e2b
    ffn_hidden_dims: [8192, 8192, ...]   # per kept layer
    layers_skipped: [5, 11, 17]          # dropped entirely
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp

from .models.config import ModelConfig
from .quant.qtensor import QTensor


@dataclass
class MatformerSlice:
    name: str
    ffn_hidden_dims: Optional[Sequence[int]] = None  # per kept layer
    layers_skipped: Sequence[int] = ()

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "MatformerSlice":
        return cls(
            name=d.get("name", "slice"),
            ffn_hidden_dims=d.get("ffn_hidden_dims"),
            layers_skipped=tuple(d.get("layers_skipped", ())),
        )


def _take_layers(w, keep: Sequence[int]):
    idx = jnp.asarray(list(keep), jnp.int32)
    if isinstance(w, QTensor):
        return jax.tree_util.tree_map(lambda x: jnp.take(x, idx, axis=0), w)
    return jnp.take(w, idx, axis=0)


def _slice_ffn(w, key: str, dims: Sequence[int], full_dim: int):
    """Slice stacked FFN weights to per-layer prefix dims (padded to the max
    so the stack stays rectangular; masked columns are zeroed)."""
    max_dim = max(dims)
    if isinstance(w, QTensor):
        raise NotImplementedError(
            "matformer slicing of quantized FFN weights: slice before ISQ"
        )
    if key in ("gate", "up"):  # [L, I, H] — slice out-features
        out = w[:, :max_dim]
        mask = (
            jnp.arange(max_dim)[None, :] < jnp.asarray(dims)[:, None]
        )  # [L, max_dim]
        return out * mask[:, :, None].astype(out.dtype)
    if key == "down":  # [L, H, I] — slice in-features
        out = w[:, :, :max_dim]
        mask = jnp.arange(max_dim)[None, None, :] < jnp.asarray(dims)[:, None, None]
        return out * mask.astype(out.dtype)
    return w


def apply_matformer(
    cfg: ModelConfig, weights: dict, slice_cfg: MatformerSlice
) -> tuple[ModelConfig, dict]:
    """Produce the sliced (config, weights). Dense weights only — apply
    before ISQ (quantize the sliced model)."""
    import dataclasses

    keep = [i for i in range(cfg.num_layers) if i not in set(slice_cfg.layers_skipped)]
    layers = {k: _take_layers(v, keep) for k, v in weights["layers"].items()
              if not isinstance(v, dict)}
    for k, v in weights["layers"].items():
        if isinstance(v, dict):  # experts / lora subtrees
            layers[k] = jax.tree_util.tree_map(
                lambda x: jnp.take(x, jnp.asarray(keep, jnp.int32), axis=0), v
            )

    new_inter = cfg.intermediate_size
    if slice_cfg.ffn_hidden_dims is not None:
        dims = list(slice_cfg.ffn_hidden_dims)
        if len(dims) != len(keep):
            raise ValueError(
                f"ffn_hidden_dims has {len(dims)} entries for {len(keep)} kept layers"
            )
        for k in ("gate", "up", "down"):
            if k in layers:
                layers[k] = _slice_ffn(layers[k], k, dims, cfg.intermediate_size)
        new_inter = max(dims)

    new_cfg = dataclasses.replace(
        cfg,
        num_layers=len(keep),
        intermediate_size=new_inter,
        layer_types=(
            [cfg.layer_types[i] for i in keep] if cfg.layer_types else None
        ),
        no_rope_layers=(
            [cfg.no_rope_layers[i] for i in keep] if cfg.no_rope_layers else None
        ),
    )
    out = dict(weights)
    out["layers"] = layers
    from .models.llama import layer_rope_flags, layer_windows

    out["layer_windows"] = jnp.asarray(layer_windows(new_cfg))
    out["layer_use_rope"] = jnp.asarray(layer_rope_flags(new_cfg))
    return new_cfg, out
