"""LoRA adapters — static merge and dynamic runtime application (the analog
of `mistralrs-quant/src/lora/{static_lora,dynamic}.rs` and the adapter
registry `mistralrs-core/src/adapter/`).

* **Static merge**: fold ``W += (alpha/r) * B @ A`` into the dense weights
  before ISQ/loading — zero runtime cost (`get_delta_from_lora_ab` analog).
* **Dynamic**: keep (A, B) unmerged; each projection adds
  ``(x @ Aᵀ) @ Bᵀ`` at forward (scaling premultiplied into B). Adapters can
  be attached/detached between requests without touching the quantized base
  weights — the analog of runtime LoRA swap (`adapter/runtime.rs`).

PEFT checkpoint conventions: ``adapter_config.json`` (r, lora_alpha,
target_modules) + ``adapter_model.safetensors`` with keys like
``base_model.model.model.layers.N.self_attn.q_proj.lora_A.weight``.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

# HF module name → our layer-weight key
_MODULE_TO_KEY = {
    "q_proj": "wq",
    "k_proj": "wk",
    "v_proj": "wv",
    "o_proj": "wo",
    "gate_proj": "gate",
    "up_proj": "up",
    "down_proj": "down",
}

_LORA_RE = re.compile(
    r"layers\.(\d+)\.(?:self_attn|mlp)\.(\w+)\.lora_(A|B)\.weight$"
)


def load_adapter(path: str | Path) -> tuple[dict[str, Any], dict[str, np.ndarray]]:
    """Read a PEFT adapter directory → (config, tensors)."""
    path = Path(path)
    with open(path / "adapter_config.json") as f:
        cfg = json.load(f)
    from safetensors import safe_open

    tensors = {}
    for f_ in sorted(path.glob("*.safetensors")):
        with safe_open(str(f_), framework="np") as st:
            for k in st.keys():
                tensors[k] = st.get_tensor(k)
    return cfg, tensors


def _collect(adapter: Mapping[str, np.ndarray]):
    """→ {(layer, key): {"A": arr, "B": arr}}"""
    out: dict[tuple[int, str], dict[str, np.ndarray]] = {}
    for name, arr in adapter.items():
        m = _LORA_RE.search(name)
        if not m:
            continue
        layer, module, ab = int(m.group(1)), m.group(2), m.group(3)
        key = _MODULE_TO_KEY.get(module)
        if key is None:
            continue
        out.setdefault((layer, key), {})[ab] = arr
    return out


def merge_lora_into_state_dict(
    sd: dict[str, np.ndarray],
    adapter_cfg: Mapping[str, Any],
    adapter: Mapping[str, np.ndarray],
) -> dict[str, np.ndarray]:
    """Static merge: returns a new state dict with deltas folded in."""
    scale = float(adapter_cfg.get("lora_alpha", 1.0)) / float(adapter_cfg.get("r", 1))
    if adapter_cfg.get("use_rslora"):
        scale = float(adapter_cfg["lora_alpha"]) / float(adapter_cfg["r"]) ** 0.5
    out = dict(sd)
    hf_key = {v: k for k, v in _MODULE_TO_KEY.items()}
    prefix = "model." if any(k.startswith("model.") for k in sd) else ""
    for (layer, key), ab in _collect(adapter).items():
        if "A" not in ab or "B" not in ab:
            continue
        mod = hf_key[key]
        group = "self_attn" if key.startswith("w") else "mlp"
        name = f"{prefix}layers.{layer}.{group}.{mod}.weight"
        if name not in out:
            continue
        delta = (ab["B"].astype(np.float32) @ ab["A"].astype(np.float32)) * scale
        out[name] = out[name].astype(np.float32) + delta
    return out


def attach_dynamic_lora(
    weights: dict,
    adapter_cfg: Mapping[str, Any],
    adapter: Mapping[str, np.ndarray],
    num_layers: int,
    dtype=jnp.bfloat16,
) -> dict:
    """Attach unmerged (A, B) pairs to the stacked-layer pytree.

    Adds ``<key>_lora = {"a": [L, r, K], "b": [L, N, r]}`` entries (scaling
    premultiplied into B; zero-filled for layers the adapter doesn't touch).
    """
    scale = float(adapter_cfg.get("lora_alpha", 1.0)) / float(adapter_cfg.get("r", 1))
    pairs = _collect(adapter)
    by_key: dict[str, dict[int, dict[str, np.ndarray]]] = {}
    for (layer, key), ab in pairs.items():
        by_key.setdefault(key, {})[layer] = ab
    new_layers = dict(weights["layers"])
    for key, per_layer in by_key.items():
        sample = next(iter(per_layer.values()))
        r, k_in = sample["A"].shape
        n_out = sample["B"].shape[0]
        a = np.zeros((num_layers, r, k_in), np.float32)
        b = np.zeros((num_layers, n_out, r), np.float32)
        for layer, ab in per_layer.items():
            a[layer] = ab["A"]
            b[layer] = ab["B"] * scale
        new_layers[key + "_lora"] = {
            "a": jnp.asarray(a, dtype),
            "b": jnp.asarray(b, dtype),
        }
    out = dict(weights)
    out["layers"] = new_layers
    return out


def detach_dynamic_lora(weights: dict) -> dict:
    out = dict(weights)
    out["layers"] = {
        k: v for k, v in weights["layers"].items() if not k.endswith("_lora")
    }
    return out


def apply_lora_delta(out: jax.Array, x: jax.Array, lora: Optional[dict]) -> jax.Array:
    """out += (x @ Aᵀ) @ Bᵀ (scaling already folded into B).

    Multi-adapter (X-LoRA) entries carry a leading adapter axis plus
    per-token mixing weights ``xlora_scalings`` [B, T, A]."""
    if lora is None:
        return out
    a, b = lora["a"], lora["b"]  # [r, K], [N, r] (layer-sliced by the scan)
    if a.ndim == 3:  # [A, r, K] / [A, N, r]: X-LoRA mixture
        s = lora["xlora_scalings"].astype(jnp.float32)  # [B, T, A]
        xf = x.astype(jnp.float32)
        down = jnp.einsum("btk,ark->btar", xf, a.astype(jnp.float32))
        per = jnp.einsum("btar,anr->btan", down, b.astype(jnp.float32))
        delta = jnp.einsum("btan,bta->btn", per, s)
        return out + delta.astype(out.dtype)
    nd = x.ndim - 1
    down = jax.lax.dot_general(
        x, a.astype(x.dtype), (((nd,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    delta = jax.lax.dot_general(
        down.astype(x.dtype), b.astype(x.dtype), (((nd,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out + delta.astype(out.dtype)


def attach_adapter_bank(
    weights: dict,
    adapters: "list[tuple[str, Mapping[str, Any], Mapping[str, np.ndarray]]]",
    num_layers: int,
    dtype=jnp.bfloat16,
) -> dict:
    """Attach MULTIPLE named adapters for per-request selection — the analog
    of the reference's adapter runtime (`adapter/selection.rs`): every
    touched target gets ``<key>_lora = {"a": [L, A, r, K], "b": [L, A, N,
    r]}`` (ranks padded to the bank max, scaling folded into B) and
    ``weights["lora_names"]`` records the order. At run time the engine
    feeds a per-slot one-hot over A through the X-LoRA mixing path, so a
    request selects its adapter (or none) with zero recompilation."""
    names = [n for n, _, _ in adapters]
    per_key: dict[str, list] = {}
    max_r: dict[str, int] = {}
    dims: dict[str, tuple[int, int]] = {}
    collected = []
    for _, cfg, sd in adapters:
        scale = float(cfg.get("lora_alpha", 1.0)) / float(cfg.get("r", 1))
        pairs = _collect(sd)
        by_key: dict[str, dict[int, dict]] = {}
        for (layer, key), ab in pairs.items():
            by_key.setdefault(key, {})[layer] = ab
            r, k_in = ab["A"].shape
            n_out = ab["B"].shape[0]
            max_r[key] = max(max_r.get(key, 0), r)
            dims[key] = (k_in, n_out)
        collected.append((scale, by_key))
    new_layers = dict(weights["layers"])
    n_a = len(adapters)
    for key, (k_in, n_out) in dims.items():
        r = max_r[key]
        a = np.zeros((num_layers, n_a, r, k_in), np.float32)
        b = np.zeros((num_layers, n_a, n_out, r), np.float32)
        for ai, (scale, by_key) in enumerate(collected):
            for layer, ab in by_key.get(key, {}).items():
                ra = ab["A"].shape[0]
                a[layer, ai, :ra] = ab["A"]
                b[layer, ai, :, :ra] = ab["B"] * scale
        new_layers[key + "_lora"] = {
            "a": jnp.asarray(a, dtype),
            "b": jnp.asarray(b, dtype),
        }
    out = dict(weights)
    out["layers"] = new_layers
    out["lora_names"] = tuple(names)
    return out
