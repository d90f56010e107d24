"""UQFF-TPU: pre-quantized model serialization (the analog of the reference's
UQFF format, `mistralrs-quant/src/uqff/` — a safetensors container holding
per-layer quantized tensors + typed metadata).

One ``.uqff`` file = a safetensors archive of the entire stacked-weights
pytree (QTensor codes/scales/biases, dense norms/embeddings) plus a JSON
metadata header carrying the model config and per-entry static quant
metadata. Loading is mmap + device_put — no quantization work, the analog of
`UqffReader` (`pipeline/normal.rs:402`).
"""

from __future__ import annotations

import json
from dataclasses import asdict
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .gguf.constants import GGMLType
from .models.config import ModelConfig
from .quant.fp8 import Fp8Tensor
from .quant.qtensor import QTensor

UQFF_TPU_VERSION = 1


def _flatten(weights: dict, prefix: str = "") -> list[tuple[str, Any]]:
    out = []
    for k, v in weights.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.extend(_flatten(v, key + "."))
        else:
            out.append((key, v))
    return out


def save_uqff(path: str, cfg: ModelConfig, weights: dict) -> None:
    from safetensors.numpy import save_file

    tensors: dict[str, np.ndarray] = {}
    meta_entries: dict[str, Any] = {}
    for key, v in _flatten(weights):
        if v is None:
            meta_entries[key] = {"kind": "none"}
        elif isinstance(v, QTensor):
            tensors[key + ".data"] = np.asarray(v.data)
            tensors[key + ".scale"] = np.asarray(v.scale)
            if v.bias is not None:
                tensors[key + ".bias"] = np.asarray(v.bias)
            meta_entries[key] = {
                "kind": "qtensor",
                "group_size": v.group_size,
                "packed": v.packed,
                "code_bits": v.code_bits,
                "ggml_type": int(v.ggml_type) if v.ggml_type is not None else None,
                "chunks": v.chunks,
                "has_bias": v.bias is not None,
            }
        elif isinstance(v, Fp8Tensor):
            tensors[key + ".data"] = np.asarray(v.data).view(np.uint8)
            tensors[key + ".scale"] = np.asarray(v.scale)
            meta_entries[key] = {
                "kind": "fp8",
                "block_shape": list(v.block_shape) if v.block_shape else None,
                "shape": list(v.data.shape),
            }
        else:
            arr = np.asarray(v)
            if arr.dtype == jnp.bfloat16:
                tensors[key] = arr.view(np.uint16)
                meta_entries[key] = {"kind": "bf16"}
            else:
                tensors[key] = arr
                meta_entries[key] = {"kind": "dense"}
    header = {
        "uqff_tpu_version": UQFF_TPU_VERSION,
        "config": asdict(cfg),
        "entries": meta_entries,
    }
    save_file(tensors, path, metadata={"uqff_tpu": json.dumps(header)})


def load_uqff(path: str) -> tuple[ModelConfig, dict]:
    from safetensors import safe_open

    with safe_open(str(path), framework="np") as st:
        meta = st.metadata()
        header = json.loads(meta["uqff_tpu"])
        if header["uqff_tpu_version"] > UQFF_TPU_VERSION:
            raise ValueError(
                f"uqff version {header['uqff_tpu_version']} newer than supported"
            )
        raw = {name: st.get_tensor(name) for name in st.keys()}

    cfg_d = header["config"]
    cfg_d["eos_token_ids"] = tuple(cfg_d.get("eos_token_ids") or ())
    cfg = ModelConfig(**cfg_d)

    weights: dict[str, Any] = {}

    def put(key: str, value):
        parts = key.split(".")
        d = weights
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = value

    for key, ent in header["entries"].items():
        kind = ent["kind"]
        if kind == "none":
            put(key, None)
        elif kind == "qtensor":
            bias = raw.get(key + ".bias") if ent["has_bias"] else None
            put(
                key,
                QTensor(
                    data=jnp.asarray(raw[key + ".data"]),
                    scale=jnp.asarray(raw[key + ".scale"]),
                    bias=None if bias is None else jnp.asarray(bias),
                    group_size=ent["group_size"],
                    packed=ent["packed"],
                    code_bits=ent["code_bits"],
                    ggml_type=(
                        GGMLType(ent["ggml_type"]) if ent["ggml_type"] is not None else None
                    ),
                    chunks=ent["chunks"],
                ),
            )
        elif kind == "fp8":
            put(
                key,
                Fp8Tensor(
                    data=jnp.asarray(raw[key + ".data"]).view(jnp.float8_e4m3fn),
                    scale=jnp.asarray(raw[key + ".scale"]),
                    block_shape=tuple(ent["block_shape"]) if ent["block_shape"] else None,
                ),
            )
        elif kind == "bf16":
            put(key, jnp.asarray(raw[key]).view(jnp.bfloat16))
        else:
            put(key, jnp.asarray(raw[key]))
    return cfg, weights

# ---------------------------------------------------------------------------
# reference-format UQFF (v1.x) reading — interop with mistral.rs artifacts
# ---------------------------------------------------------------------------
#
# The reference's UQFF (mistralrs-quant/src/uqff/) is a safetensors container:
# version scalars `uqff.version.{major,minor,patch}` (u32), and per quantized
# layer `<prefix>.weight.format` (u8: QuantizedSerdeType), plus
# format-specific tensors — GGUF layers carry raw GGML bytes + a dtype code +
# shape; unquant layers a plain typed tensor; `<prefix>.bias` optional.

_UQFF_GGML_CODES = {
    0: "F32", 1: "F16", 2: GGMLType.Q4_0, 3: GGMLType.Q4_1,
    6: GGMLType.Q5_0, 7: GGMLType.Q5_1, 8: GGMLType.Q8_0,
    10: GGMLType.Q2_K, 11: GGMLType.Q3_K, 12: GGMLType.Q4_K,
    13: GGMLType.Q5_K, 14: GGMLType.Q6_K, 30: "BF16",
}

_SERDE_GGUF, _SERDE_UNQUANT = 0, 1


def is_reference_uqff(path: str) -> bool:
    from safetensors import safe_open

    try:
        with safe_open(path, framework="np") as st:
            return "uqff.version.major" in set(st.keys())
    except Exception:  # noqa: BLE001 — not a safetensors file
        return False


def load_reference_uqff(path: str) -> dict[str, Any]:
    """Read a mistral.rs-produced ``.uqff`` artifact into a state dict of
    ``{hf_name: QTensor | np.ndarray}`` ready for
    ``weights_from_state_dict`` (its pre-quantized path stacks QTensors)."""
    from safetensors import safe_open

    sd: dict[str, Any] = {}
    with safe_open(path, framework="np") as st:
        names = set(st.keys())
        major = int(st.get_tensor("uqff.version.major").reshape(-1)[0])
        if major != 1:
            raise ValueError(f"unsupported UQFF major version {major}")
        consumed: set[str] = {
            "uqff.version.major", "uqff.version.minor", "uqff.version.patch",
        }
        for name in sorted(names):
            if not name.endswith(".weight.format"):
                continue
            prefix = name[: -len(".weight.format")]
            fmt = int(st.get_tensor(name).reshape(-1)[0])
            consumed.add(name)
            if fmt == _SERDE_UNQUANT:
                sd[prefix + ".weight"] = st.get_tensor(prefix + ".weight")
                consumed.add(prefix + ".weight")
            elif fmt == _SERDE_GGUF:
                code = int(
                    st.get_tensor(prefix + ".weight.dtype").reshape(-1)[0]
                )
                ggml = _UQFF_GGML_CODES.get(code)
                if ggml is None:
                    raise ValueError(
                        f"{prefix}: unsupported UQFF ggml dtype code {code}"
                    )
                shape = [
                    int(x) for x in st.get_tensor(prefix + ".weight.shape")
                ]
                raw = st.get_tensor(prefix + ".weight")
                consumed |= {
                    prefix + ".weight", prefix + ".weight.dtype",
                    prefix + ".weight.shape",
                }
                if ggml in ("F32", "F16", "BF16"):
                    import ml_dtypes

                    dt = {
                        "F32": np.float32, "F16": np.float16,
                        "BF16": ml_dtypes.bfloat16,
                    }[ggml]
                    sd[prefix + ".weight"] = (
                        np.frombuffer(raw.tobytes(), dt)
                        .reshape(shape)
                        .astype(np.float32)
                    )
                else:
                    sd[prefix + ".weight"] = QTensor.from_gguf_raw(
                        np.asarray(raw, np.uint8), ggml, tuple(shape)
                    )
            else:
                raise ValueError(
                    f"{prefix}: UQFF serde type {fmt} not supported yet "
                    "(gguf/unquant only)"
                )
            if prefix + ".bias" in names:
                sd[prefix + ".bias"] = st.get_tensor(prefix + ".bias")
                consumed.add(prefix + ".bias")
        # pass through any remaining plain tensors (norms, embeddings)
        for name in names - consumed:
            if name.startswith("uqff."):
                continue
            sd[name] = st.get_tensor(name)
    return sd


_UQFF_GGML_WRITE_CODES = {v: k for k, v in _UQFF_GGML_CODES.items()
                          if not isinstance(v, str)}
_UQFF_WRITE_VERSION = (1, 2, 0)


def save_reference_uqff(
    path: str,
    sd: "dict[str, np.ndarray]",
    quant,  # GGMLType | {hf_name → GGMLType | None}
    *,
    sensitive_boost: bool = True,
) -> None:
    """Write a mistral.rs-compatible UQFF v1.x artifact from a FLOAT state
    dict (the inverse of :func:`load_reference_uqff`; reference container:
    `mistralrs-quant/src/uqff/` — version scalars + per-layer
    ``<prefix>.weight.format/dtype/shape`` keys with raw GGML block bytes).

    ``quant`` is a single GGML type or a per-tensor map (None → store
    unquantized with the UNQUANT serde tag). 1-D tensors and shapes the
    k-quant block layout cannot cover pass through as plain tensors.
    ``sensitive_boost`` applies the reference's sensitive-tensor policy
    (embeddings / lm_head at Q8_0 when a ≤4-bit type is requested)."""
    from .gguf.constants import type_traits
    from .gguf.quants import QUANTIZERS, quantize

    out: dict[str, np.ndarray] = {}
    maj, minor, patch = _UQFF_WRITE_VERSION
    out["uqff.version.major"] = np.asarray([maj], np.uint32)
    out["uqff.version.minor"] = np.asarray([minor], np.uint32)
    out["uqff.version.patch"] = np.asarray([patch], np.uint32)

    def type_for(name: str, arr) -> Any:
        t = quant.get(name) if isinstance(quant, dict) else quant
        if t is None or arr.ndim != 2:
            return None
        if sensitive_boost and (
            "embed" in name or "lm_head" in name or "output.weight" in name
        ):
            from .gguf.constants import GGMLType as _G

            bits4 = t in (_G.Q4_0, _G.Q4_1, _G.Q4_K, _G.Q2_K, _G.Q3_K)
            t = _G.Q8_0 if bits4 else t
        if t not in QUANTIZERS:
            return None
        blk = type_traits(t).block_size
        return t if arr.shape[-1] % blk == 0 else None

    for name, arr in sd.items():
        arr = np.asarray(arr)
        if not name.endswith(".weight"):
            out[name] = arr.astype(np.float32)
            continue
        prefix = name[: -len(".weight")]
        t = type_for(name, arr)
        if t is None:
            out[name] = arr.astype(np.float32)
            # linear weights still need the serde tag so the reference
            # loader recognizes them; plain norms are residual tensors
            if arr.ndim == 2:
                out[name + ".format"] = np.asarray([_SERDE_UNQUANT], np.uint8)
            continue
        raw = quantize(arr.astype(np.float32), t)
        out[name] = np.asarray(raw, np.uint8)
        out[name + ".format"] = np.asarray([_SERDE_GGUF], np.uint8)
        out[name + ".dtype"] = np.asarray(
            [_UQFF_GGML_WRITE_CODES[t]], np.uint8
        )
        out[name + ".shape"] = np.asarray(arr.shape, np.uint32)
        bias = sd.get(prefix + ".bias")
        if bias is not None:
            out[prefix + ".bias"] = np.asarray(bias, np.float32)
    from safetensors.numpy import save_file

    save_file(out, path)
