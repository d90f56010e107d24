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


def _collect(adapter: Mapping[str, np.ndarray],
             module_to_key: Optional[Mapping[str, str]] = None):
    """→ {(layer, key): {"A": arr, "B": arr}}"""
    m2k = module_to_key if module_to_key is not None else _MODULE_TO_KEY
    out: dict[tuple[int, str], dict[str, np.ndarray]] = {}
    for name, arr in adapter.items():
        m = _LORA_RE.search(name)
        if not m:
            continue
        layer, module, ab = int(m.group(1)), m.group(2), m.group(3)
        key = m2k.get(module)
        if key is None:
            continue
        out.setdefault((layer, key), {})[ab] = arr
    return out


#: PEFT module names → deepseek weight keys (absorbed-MLA layout,
#: models/deepseek.py): LoRA targets the unabsorbed projections (q paths,
#: o_proj) and the dense-segment MLP; kv_b is absorbed into w_uk/w_uv and
#: is not a runtime target.
DEEPSEEK_MODULE_TO_KEY = {
    "q_proj": "q",
    "q_a_proj": "q_a",
    "q_b_proj": "q_b",
    "o_proj": "o",
    "gate_proj": "gate",
    "up_proj": "up",
    "down_proj": "down",
}

#: PEFT module names → qwen3next per-layer weight keys (attention layers
#: carry wq/wk/wv/wo; GDN layers have none of these so their bank slices
#: are never injected; dense MLP gate/up/down when present).
QWEN3NEXT_MODULE_TO_KEY = {
    "q_proj": "wq",
    "k_proj": "wk",
    "v_proj": "wv",
    "o_proj": "wo",
    "gate_proj": "gate",
    "up_proj": "up",
    "down_proj": "down",
}


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
    module_to_key: Optional[Mapping[str, str]] = None,
    cfg=None,  # ModelConfig: needed to place deltas when the base weights
    # are fused (wqkv / wgateup, fuse_projections) — see below
) -> dict:
    """Attach MULTIPLE named adapters for per-request selection — the analog
    of the reference's adapter runtime (`adapter/selection.rs`): every
    touched target gets ``<key>_lora = {"a": [L, A, r, K], "b": [L, A, N,
    r]}`` (ranks padded to the bank max, scaling folded into B) and
    ``weights["lora_names"]`` records the order. At run time the engine
    feeds a per-slot one-hot over A through the X-LoRA mixing path, so a
    request selects its adapter (or none) with zero recompilation.

    Weight layouts supported (per-request LoRA composes with arch-adapter
    engines the way the reference's adapter runtime composes with any
    pipeline, `adapter/selection.rs` + `speculative/driver.rs:18`):

    * ``weights["layers"]`` a dict of stacked arrays (llama family):
      stacked ``[L, A, r, K]`` banks, layer-sliced by the model's scan.
    * ``weights["layers"]`` a LIST of per-layer dicts (qwen3next-style
      Python layer loop): each touched layer gets its own ``[A, r, K]``
      slice, injected only where the base key exists.
    * ``weights["segments"]`` (deepseek MLA): the stacked bank is split
      dense-first/moe-second to mirror the loader's segment order; a key
      is injected only into segments that carry the base projection (the
      moe segment's expert MLPs are not LoRA targets).
    """
    names = [n for n, _, _ in adapters]
    m2k = dict(module_to_key) if module_to_key is not None else dict(_MODULE_TO_KEY)
    max_r: dict[str, int] = {}
    dims: dict[str, tuple[int, int]] = {}
    collected = []
    for _, acfg, sd in adapters:
        scale = float(acfg.get("lora_alpha", 1.0)) / float(acfg.get("r", 1))
        pairs = _collect(sd, m2k)
        by_key: dict[str, dict[int, dict]] = {}
        for (layer, key), ab in pairs.items():
            by_key.setdefault(key, {})[layer] = ab
            r, k_in = ab["A"].shape
            n_out = ab["B"].shape[0]
            max_r[key] = max(max_r.get(key, 0), r)
            dims[key] = (k_in, n_out)
        collected.append((scale, by_key))
    n_a = len(adapters)
    banks: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for key, (k_in, n_out) in dims.items():
        r = max_r[key]
        a = np.zeros((num_layers, n_a, r, k_in), np.float32)
        b = np.zeros((num_layers, n_a, n_out, r), np.float32)
        for ai, (scale, by_key) in enumerate(collected):
            for layer, ab in by_key.get(key, {}).items():
                ra = ab["A"].shape[0]
                a[layer, ai, :ra] = ab["A"]
                b[layer, ai, :, :ra] = ab["B"] * scale
        banks[key] = (a, b)

    out = dict(weights)
    layers = weights.get("layers")
    if isinstance(layers, (list, tuple)):
        new_list = [dict(lw) for lw in layers]
        for key, (a, b) in banks.items():
            for li, lw in enumerate(new_list):
                if key in lw:
                    lw[key + "_lora"] = {
                        "a": jnp.asarray(a[li], dtype),
                        "b": jnp.asarray(b[li], dtype),
                    }
        out["layers"] = type(layers)(new_list)
    elif layers is not None:
        new_layers = dict(layers)
        # fused base layouts (fuse_projections, the new_merged analog): fold
        # the per-projection banks into ONE bank on the fused output — A
        # matrices concat on the rank axis, B blocks land at each
        # projection's output offset (exact: the block-diagonal B makes the
        # fused delta the concatenation of the per-projection deltas)
        for fused_key, parts in (
            ("wqkv", ("wq", "wk", "wv")),
            ("wgateup", ("gate", "up")),
        ):
            present = [k for k in parts if k in banks]
            if fused_key not in layers or not present:
                continue
            if cfg is None:
                raise ValueError(
                    f"base weights are fused ({fused_key}); pass cfg= so "
                    "the adapter deltas can be placed at the right output "
                    "offsets"
                )
            # raw fields only: cfg may be a frozen dict-like without the
            # ModelConfig q_dim/kv_dim properties
            if fused_key == "wqkv":
                hd = cfg.head_dim
                q_dim = cfg.num_heads * hd
                kv_dim = cfg.num_kv_heads * hd
                offs = {"wq": 0, "wk": q_dim, "wv": q_dim + kv_dim}
                n_total = q_dim + 2 * kv_dim
            else:
                offs = {"gate": 0, "up": cfg.intermediate_size}
                n_total = 2 * cfg.intermediate_size
            r_tot = sum(banks[k][0].shape[2] for k in present)
            k_in = banks[present[0]][0].shape[3]
            a = np.zeros((num_layers, n_a, r_tot, k_in), np.float32)
            b = np.zeros((num_layers, n_a, n_total, r_tot), np.float32)
            ro = 0
            for k in present:
                ak, bk = banks.pop(k)
                r = ak.shape[2]
                a[:, :, ro : ro + r, :] = ak
                b[:, :, offs[k] : offs[k] + bk.shape[2], ro : ro + r] = bk
                ro += r
            banks[fused_key] = (a, b)
        for key, (a, b) in banks.items():
            new_layers[key + "_lora"] = {
                "a": jnp.asarray(a, dtype),
                "b": jnp.asarray(b, dtype),
            }
        out["layers"] = new_layers
    elif "segments" in weights:
        segs = dict(weights["segments"])
        start = 0
        for seg_name in ("dense", "moe"):
            if seg_name not in segs:
                continue
            seg = dict(segs[seg_name])
            n_seg = _seg_layers(seg)
            for key, (a, b) in banks.items():
                if key in seg:
                    seg[key + "_lora"] = {
                        "a": jnp.asarray(a[start : start + n_seg], dtype),
                        "b": jnp.asarray(b[start : start + n_seg], dtype),
                    }
            segs[seg_name] = seg
            start += n_seg
        out["segments"] = segs
    else:
        raise ValueError("weights carry neither 'layers' nor 'segments'")
    out["lora_names"] = tuple(names)
    return out


def _seg_layers(seg: Mapping[str, Any]) -> int:
    """Layer count of a stacked deepseek segment (leading dim of any
    stacked projection)."""
    for v in seg.values():
        leaf = v
        if isinstance(v, Mapping):
            leaf = next(iter(v.values()))
        if hasattr(leaf, "shape") and getattr(leaf, "ndim", 0) >= 1:
            return int(leaf.shape[0])
        if hasattr(leaf, "data"):
            return int(leaf.data.shape[0])
    raise ValueError("cannot infer segment layer count")
