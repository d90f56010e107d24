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
    """Mirror of the reference's `xlora_config.json` surface
    (`mistralrs-core/src/xlora_models/config.rs:31`)."""

    n_adapters: int
    softmax_temperature: float = 1.0
    scaling_pass_value: float = 0.0  # adapter weight during the scratch pass
    xlora_depth: int = 2
    xlora_size: int = 2048
    layerwise_scalings: bool = False  # last layer emits L×A instead of A
    enable_softmax: bool = True
    enable_relu_and_dropout: bool = False
    use_bias: bool = True
    top_k_lora: Optional[int] = None  # keep top-k adapters, zero the rest
    global_scaling_weight: float = 1.0

    @classmethod
    def from_json(cls, d: Mapping[str, Any], n_adapters: Optional[int] = None) -> "XLoraConfig":
        adapters = d.get("adapters")
        if n_adapters is None:
            n_adapters = len(adapters) if adapters is not None else 0
        return cls(
            n_adapters=n_adapters,
            softmax_temperature=float(d.get("softmax_temperature", 1.0)),
            scaling_pass_value=float(d.get("scaling_pass_value", 0.0)),
            xlora_depth=int(d.get("xlora_depth", 1)),
            xlora_size=int(d.get("xlora_size", 2048)),
            layerwise_scalings=bool(d.get("layerwise_scalings", False)),
            enable_softmax=bool(d.get("enable_softmax", True)),
            enable_relu_and_dropout=bool(d.get("enable_relu_and_dropout", False)),
            use_bias=bool(d.get("use_bias", True)),
            top_k_lora=d.get("top_k_lora"),
            global_scaling_weight=float(d.get("global_scaling_weight", 1.0)),
        )


def load_classifier(
    source, xcfg: XLoraConfig, dtype=jnp.float32
) -> dict:
    """Load a TRAINED X-LoRA classifier checkpoint (the analog of
    `XLoraClassifier::new` reading `inner.{i}.*`/`last.*` tensors,
    `mistralrs-core/src/xlora_models/classifier.rs:31`).

    ``source`` is a state-dict mapping or a safetensors path; keys may be
    prefixed (HF saves ``internal_xlora_classifier.``)."""
    if not isinstance(source, Mapping):
        from safetensors.numpy import load_file

        source = load_file(str(source))
    sd = {}
    for k, v in source.items():
        for pre in ("internal_xlora_classifier.", "xlora_classifier."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        sd[k] = np.asarray(v, np.float32)
    layers = []
    i = 0
    while f"inner.{i}.weight" in sd:
        layers.append({
            "w": jnp.asarray(sd[f"inner.{i}.weight"], dtype),
            "b": (jnp.asarray(sd[f"inner.{i}.bias"], dtype)
                  if f"inner.{i}.bias" in sd else None),
        })
        i += 1
    if "last.weight" not in sd:
        raise ValueError(
            f"classifier checkpoint has no last.weight (keys: {sorted(sd)[:8]}…)"
        )
    layers.append({
        "w": jnp.asarray(sd["last.weight"], dtype),
        "b": jnp.asarray(sd["last.bias"], dtype) if "last.bias" in sd else None,
    })
    expect = xcfg.xlora_depth
    if len(layers) != expect:
        raise ValueError(
            f"classifier depth mismatch: checkpoint has {len(layers)} "
            f"linear layers, xlora_config says xlora_depth={expect}"
        )
    return {"layers": layers}


def load_xlora_dir(path, dtype=jnp.float32):
    """Load a saved X-LoRA artifact directory:

        xlora_config.json
        xlora_classifier.safetensors
        adapters/<name>/{adapter_config.json, adapter_model.safetensors}

    Returns (xcfg, classifier, adapters) where ``adapters`` feeds
    :func:`attach_xlora`. Reference: ordering follows the config's adapter
    list (`xlora_models/mod.rs` loads adapters by config order)."""
    import json
    from pathlib import Path

    from safetensors.numpy import load_file

    p = Path(path)
    with open(p / "xlora_config.json") as f:
        raw = json.load(f)
    names = raw.get("adapters")
    if isinstance(names, dict):
        names = sorted(names)
    xcfg = XLoraConfig.from_json(raw, n_adapters=len(names or []))
    classifier = load_classifier(p / "xlora_classifier.safetensors", xcfg, dtype)
    adapters = []
    for name in names or []:
        adir = p / "adapters" / name
        with open(adir / "adapter_config.json") as f:
            acfg = json.load(f)
        adapters.append((acfg, load_file(str(adir / "adapter_model.safetensors"))))
    return xcfg, classifier, adapters


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


def classifier_forward(classifier: dict, hidden: jax.Array,
                       xcfg: Optional[XLoraConfig] = None) -> jax.Array:
    """Classifier logits [B, T, A] (or [B, T, L*A] with layerwise
    scalings). ReLU between layers follows `enable_relu_and_dropout`
    (dropout is an inference no-op); the legacy default keeps ReLU on."""
    h = hidden
    layers = classifier["layers"]
    relu = xcfg.enable_relu_and_dropout if xcfg is not None else True
    for i, lw in enumerate(layers):
        h = h @ lw["w"].T
        if lw.get("b") is not None:
            h = h + lw["b"]
        if relu and i + 1 < len(layers):
            h = jax.nn.relu(h)
    return h


def classifier_scalings(
    classifier: dict, hidden: jax.Array, xcfg: XLoraConfig, num_layers: int
) -> jax.Array:
    """Per-token, per-LAYER adapter scalings [B, T, L, A] — the full
    reference semantics (`classifier.rs:251-305`): optional layerwise last
    layer, temperature softmax, top-k masking WITHOUT renormalization."""
    logits = classifier_forward(classifier, hidden, xcfg)
    b, t = logits.shape[:2]
    a = xcfg.n_adapters
    if xcfg.layerwise_scalings:
        scal = logits.reshape(b, t, num_layers, a)
    else:
        scal = jnp.broadcast_to(logits[:, :, None, :], (b, t, num_layers, a))
    if xcfg.enable_softmax:
        scal = jax.nn.softmax(scal / xcfg.softmax_temperature, axis=-1)
    if xcfg.top_k_lora is not None and xcfg.top_k_lora < a:
        kth = jnp.sort(scal, axis=-1)[..., -xcfg.top_k_lora][..., None]
        scal = jnp.where(scal >= kth, scal, 0.0)
    return scal


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
    scalings = classifier_scalings(
        classifier, hidden.astype(jnp.float32), xcfg, cfg.num_layers
    )  # [B, T, L, A]

    # pass 2: adapters active, weighted per token. The scan slices every
    # leaf's leading (layer) dim → [L, B, T, A]; the global scaling weight
    # multiplies the deltas (linear in the scalings, so folded here).
    mixed_layers = dict(base_layers)
    scal_l = jnp.transpose(scalings, (2, 0, 1, 3)) * xcfg.global_scaling_weight
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
    return logits, new_cache, scalings[:, :, 0]
