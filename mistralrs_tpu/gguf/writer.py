"""GGUF container writer.

Used for offline test fixtures, the `quantize` CLI (GGUF export of ISQ'd
models), and roundtrip validation of the reader. Spec-faithful v3 output.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Any

import numpy as np

from .constants import (
    GGUF_DEFAULT_ALIGNMENT,
    GGUF_MAGIC,
    GGUF_VERSION,
    GGMLType,
    GGUFValueType,
    row_byte_size,
)
from .quants import quantize


_NP_SCALAR_TYPES = {
    np.uint8: GGUFValueType.UINT8,
    np.int8: GGUFValueType.INT8,
    np.uint16: GGUFValueType.UINT16,
    np.int16: GGUFValueType.INT16,
    np.uint32: GGUFValueType.UINT32,
    np.int32: GGUFValueType.INT32,
    np.uint64: GGUFValueType.UINT64,
    np.int64: GGUFValueType.INT64,
    np.float32: GGUFValueType.FLOAT32,
    np.float64: GGUFValueType.FLOAT64,
    np.bool_: GGUFValueType.BOOL,
}


def _infer_value_type(v: Any) -> GGUFValueType:
    if isinstance(v, bool):
        return GGUFValueType.BOOL
    if type(v) in _NP_SCALAR_TYPES:
        return _NP_SCALAR_TYPES[type(v)]
    if isinstance(v, int):
        return GGUFValueType.INT64 if v < 0 else GGUFValueType.UINT64
    if isinstance(v, float):
        return GGUFValueType.FLOAT32
    if isinstance(v, str):
        return GGUFValueType.STRING
    if isinstance(v, (list, tuple, np.ndarray)):
        return GGUFValueType.ARRAY
    raise TypeError(f"cannot infer GGUF value type for {type(v)}")


class GGUFWriter:
    def __init__(self, path: str, alignment: int = GGUF_DEFAULT_ALIGNMENT):
        self.path = Path(path)
        self.alignment = alignment
        self._kv: list[tuple[str, GGUFValueType, Any]] = []
        self._tensors: list[tuple[str, tuple[int, ...], GGMLType, np.ndarray]] = []

    def add_metadata(self, key: str, value: Any, vtype: GGUFValueType | None = None):
        self._kv.append((key, vtype or _infer_value_type(value), value))

    def add_tensor(
        self,
        name: str,
        data: np.ndarray,
        ggml_type: GGMLType | None = None,
    ):
        """Add a tensor. Float input is quantized to `ggml_type` if given."""
        if ggml_type is None:
            ggml_type = GGMLType.F32
        if data.dtype == np.uint8 and ggml_type not in (GGMLType.F32, GGMLType.F16):
            raw = data.reshape(-1)
            expected = row_byte_size(ggml_type, int(np.prod(data.shape)))
            if raw.size != expected:
                raise ValueError("pre-quantized byte size mismatch")
            shape = data.shape
            raise ValueError("pass logical shape explicitly for raw bytes")
        shape = tuple(int(d) for d in data.shape)
        raw = quantize(np.asarray(data, dtype=np.float32), ggml_type)
        self._tensors.append((name, shape, ggml_type, raw))

    def add_raw_tensor(
        self, name: str, raw: np.ndarray, shape: tuple[int, ...], ggml_type: GGMLType
    ):
        expected = row_byte_size(ggml_type, int(np.prod(shape)))
        raw = np.ascontiguousarray(raw, dtype=np.uint8).reshape(-1)
        if raw.size != expected:
            raise ValueError(f"raw size {raw.size} != expected {expected}")
        self._tensors.append((name, tuple(int(d) for d in shape), ggml_type, raw))

    # -- serialization -------------------------------------------------------

    def _write_string(self, out, s: str):
        b = s.encode("utf-8")
        out += struct.pack("<Q", len(b))
        out += b
        return out

    def _write_value(self, out: bytearray, vtype: GGUFValueType, v: Any) -> bytearray:
        fmt = {
            GGUFValueType.UINT8: "B",
            GGUFValueType.INT8: "b",
            GGUFValueType.UINT16: "H",
            GGUFValueType.INT16: "h",
            GGUFValueType.UINT32: "I",
            GGUFValueType.INT32: "i",
            GGUFValueType.FLOAT32: "f",
            GGUFValueType.UINT64: "Q",
            GGUFValueType.INT64: "q",
            GGUFValueType.FLOAT64: "d",
        }
        if vtype in fmt:
            out += struct.pack("<" + fmt[vtype], v)
        elif vtype == GGUFValueType.BOOL:
            out += struct.pack("<B", 1 if v else 0)
        elif vtype == GGUFValueType.STRING:
            out = self._write_string(out, v)
        elif vtype == GGUFValueType.ARRAY:
            seq = list(v)
            if seq and isinstance(seq[0], str):
                elem = GGUFValueType.STRING
            elif seq and isinstance(seq[0], bool):
                elem = GGUFValueType.BOOL
            elif seq and isinstance(seq[0], float):
                elem = GGUFValueType.FLOAT32
            else:
                elem = GGUFValueType.INT32
            out += struct.pack("<IQ", int(elem), len(seq))
            for item in seq:
                out = self._write_value(out, elem, item)
        else:
            raise TypeError(f"unsupported metadata type {vtype}")
        return out

    def write(self):
        out = bytearray()
        out += struct.pack("<IIQQ", GGUF_MAGIC, GGUF_VERSION, len(self._tensors), len(self._kv))
        for key, vtype, v in self._kv:
            out = self._write_string(out, key)
            out += struct.pack("<I", int(vtype))
            out = self._write_value(out, vtype, v)
        # tensor infos; offsets are relative to the aligned data section
        rel = 0
        infos = []
        for name, shape, ggml_type, raw in self._tensors:
            infos.append(rel)
            rel += (raw.size + self.alignment - 1) // self.alignment * self.alignment
        for (name, shape, ggml_type, raw), rel_off in zip(self._tensors, infos):
            out = self._write_string(out, name)
            dims = tuple(reversed(shape))  # GGUF stores innermost-first
            out += struct.pack("<I", len(dims))
            for d in dims:
                out += struct.pack("<Q", d)
            out += struct.pack("<IQ", int(ggml_type), rel_off)
        pad = (-len(out)) % self.alignment
        out += b"\x00" * pad
        for name, shape, ggml_type, raw in self._tensors:
            out += raw.tobytes()
            out += b"\x00" * ((-raw.size) % self.alignment)
        self.path.write_bytes(bytes(out))
        return self.path
