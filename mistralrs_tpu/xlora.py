"""X-LoRA — mixture of LoRA experts with a scaling classifier (the analog of
`mistralrs-core/src/xlora_models/`: scratch pass → classifier scalings →
second pass with per-adapter weighted deltas).

Flow (per the X-LoRA paper / reference implementation):
1. scratch forward WITHOUT adapters → final hidden states;
2. classifier MLP on the hidden states → per-token softmax scalings over
   the adapter set (optionally temperature-scaled);
3. real forward where every projection adds Σ_a s_a · (x Aᵀ_a) Bᵀ_a.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .lora import _collect
from .models.config import ModelConfig
from .models.llama import KVCache, forward


@dataclass
class XLoraConfig:
    n_adapters: int
    softmax_temperature: float = 1.0
    scaling_pass_value: float = 0.0  # adapter weight during the scratch pass


def attach_xlora(
    weights: dict,
    adapters: Sequence[tuple[Mapping[str, Any], Mapping[str, np.ndarray]]],
    num_layers: int,
    dtype=jnp.float32,
) -> dict:
    """Attach A stacked adapters: ``<key>_xlora = {"a": [L, A, r, K],
    "b": [L, A, N, r]}`` (scaling folded into B)."""
    by_key: dict[str, dict] = {}
    for ai, (acfg, at) in enumerate(adapters):
        scale = float(acfg.get("lora_alpha", 1.0)) / float(acfg.get("r", 1))
        for (layer, key), ab in _collect(at).items():
            ent = by_key.setdefault(key, {})
            ent.setdefault(ai, {})[layer] = (ab["A"], ab["B"] * scale)
    new_layers = dict(weights["layers"])
    n_adapters = len(adapters)
    for key, per_adapter in by_key.items():
        sample_a, sample_b = next(iter(next(iter(per_adapter.values())).values()))
        r, k_in = sample_a.shape
        n_out = sample_b.shape[0]
        a = np.zeros((num_layers, n_adapters, r, k_in), np.float32)
        b = np.zeros((num_layers, n_adapters, n_out, r), np.float32)
        for ai, per_layer in per_adapter.items():
            for layer, (A, B) in per_layer.items():
                a[layer, ai] = A
                b[layer, ai] = B
        new_layers[key + "_xlora"] = {"a": jnp.asarray(a, dtype), "b": jnp.asarray(b, dtype)}
    out = dict(weights)
    out["layers"] = new_layers
    return out


def make_classifier(hidden_size: int, n_adapters: int, depth: int = 2,
                    inner: int = 128, seed: int = 0, dtype=jnp.float32) -> dict:
    rng = np.random.default_rng(seed)
    dims = [hidden_size] + [inner] * (depth - 1) + [n_adapters]
    return {
        "layers": [
            {
                "w": jnp.asarray(
                    rng.standard_normal((dims[i + 1], dims[i])) / np.sqrt(dims[i]),
                    dtype,
                ),
                "b": jnp.zeros((dims[i + 1],), dtype),
            }
            for i in range(depth)
        ]
    }


def classifier_forward(classifier: dict, hidden: jax.Array) -> jax.Array:
    h = hidden
    layers = classifier["layers"]
    for i, lw in enumerate(layers):
        h = h @ lw["w"].T + lw["b"]
        if i + 1 < len(layers):
            h = jax.nn.relu(h)
    return h  # [B, T, A] logits


def xlora_forward(
    weights: dict,
    cfg: ModelConfig,
    xcfg: XLoraConfig,
    classifier: dict,
    input_ids: jax.Array,
    positions: jax.Array,
    cache: KVCache,
    kv_start: jax.Array,
    *,
    backend=None,
    compute_dtype=jnp.float32,
    logits_last_only: bool = False,
):
    """Two-pass X-LoRA forward. Returns (logits, new_cache, scalings)."""
    # pass 1: scratch (no adapters) to get hidden states for the classifier
    base_layers = {
        k: v for k, v in weights["layers"].items() if not k.endswith("_xlora")
    }
    base_weights = dict(weights, layers=base_layers)
    scratch_cache = KVCache.create(
        cfg, input_ids.shape[0], cache.capacity, dtype=compute_dtype
    )
    hidden, _ = forward(
        base_weights, cfg, input_ids, positions, scratch_cache, kv_start,
        backend=backend, compute_dtype=compute_dtype, return_hidden=True,
    )
    logits_a = classifier_forward(classifier, hidden.astype(jnp.float32))
    scalings = jax.nn.softmax(
        logits_a / xcfg.softmax_temperature, axis=-1
    )  # [B, T, A]

    # pass 2: adapters active, weighted per token. The scan slices every
    # leaf's leading (layer) dim, so scalings are broadcast to [L, B, T, A].
    mixed_layers = dict(base_layers)
    scal_l = jnp.broadcast_to(
        scalings[None], (cfg.num_layers, *scalings.shape)
    )
    for key, ab in weights["layers"].items():
        if not key.endswith("_xlora"):
            continue
        base_key = key[: -len("_xlora")]
        mixed_layers[base_key + "_lora"] = {
            "a": ab["a"], "b": ab["b"], "xlora_scalings": scal_l,
        }
    mixed = dict(weights, layers=mixed_layers)
    logits, new_cache = forward(
        mixed, cfg, input_ids, positions, cache, kv_start,
        backend=backend, compute_dtype=compute_dtype,
        logits_last_only=logits_last_only,
    )
    return logits, new_cache, scalings
