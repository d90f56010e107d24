"""bitsandbytes 4-bit (NF4 / FP4) checkpoint decoding — the analog of the
reference's bitsandbytes support (`mistralrs-quant/src/bitsandbytes/`).

Format (bnb serialization as saved by HF `save_pretrained` on a 4-bit
model): each linear stores
- ``<name>.weight``              uint8 [n*k/2, 1], two codes per byte,
                                 FIRST element in the HIGH nibble
- ``<name>.weight.absmax``       per-``blocksize`` block scales (uint8 when
                                 double-quantized, float32 otherwise)
- ``<name>.weight.quant_map``    the 16-entry code table (NF4 or FP4)
- double quantization (default): ``nested_absmax`` f32, ``nested_quant_map``
  [256] f32, and ``<name>.weight.absmax`` holds uint8 indices:
  ``absmax = nested_quant_map[idx] * nested_absmax[i // 256] + offset``
- ``<name>.weight.quant_state.bitsandbytes__nf4`` (or ``__fp4``) packs the
  shape/blocksize metadata

Like MXFP4, the code table is nonlinear, so tensors decode to dense (bf16);
re-quantize with ISQ for the fused-kernel path.
"""

from __future__ import annotations

import json
from typing import Mapping, Optional

import numpy as np

# the published NF4 quantiles (QLoRA, Dettmers et al. 2023)
NF4_CODE = np.array(
    [-1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
     -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
     0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
     0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
     0.7229568362236023, 1.0],
    dtype=np.float32,
)
# bnb FP4: e2m1 magnitudes with bnb's sign-in-high-bit ordering
FP4_CODE = np.array(
    [0.0, 0.0052083334, 0.6666667, 1.0, 0.3333333, 0.5, 0.16666667, 0.25,
     -0.0, -0.0052083334, -0.6666667, -1.0, -0.3333333, -0.5, -0.16666667,
     -0.25],
    dtype=np.float32,
)

BLOCKSIZE = 64
NESTED_BLOCKSIZE = 256


def _unpack_nibbles(packed: np.ndarray, n: int) -> np.ndarray:
    """uint8 bytes → n 4-bit codes (first element in the HIGH nibble)."""
    p = np.asarray(packed, np.uint8).reshape(-1)
    out = np.empty(p.size * 2, np.uint8)
    out[0::2] = p >> 4
    out[1::2] = p & 0xF
    return out[:n]


def dequantize_4bit(
    packed: np.ndarray,
    absmax: np.ndarray,
    quant_map: np.ndarray,
    shape: tuple[int, ...],
    blocksize: int = BLOCKSIZE,
    nested_absmax: Optional[np.ndarray] = None,
    nested_quant_map: Optional[np.ndarray] = None,
    absmax_offset: float = 0.0,
) -> np.ndarray:
    n = int(np.prod(shape))
    codes = _unpack_nibbles(packed, n)
    am = np.asarray(absmax)
    if nested_absmax is not None:  # double quantization of the block scales
        nm = np.asarray(nested_quant_map, np.float32)
        na = np.asarray(nested_absmax, np.float32)
        idx = am.astype(np.int64).reshape(-1)
        blocks = idx // NESTED_BLOCKSIZE
        am = nm[idx] * na[np.minimum(blocks, na.size - 1)] + absmax_offset
    am = am.astype(np.float32).reshape(-1)
    vals = np.asarray(quant_map, np.float32)[codes]
    block_ids = np.arange(n) // blocksize
    return (vals * am[block_ids]).reshape(shape)


def quantize_4bit(
    w: np.ndarray, quant_map: np.ndarray = NF4_CODE, blocksize: int = BLOCKSIZE
) -> tuple[np.ndarray, np.ndarray]:
    """float [..] → (packed uint8 [ceil(n/2), 1], absmax f32 [n/blocksize]).
    (Testing/round-trip; no double quantization.)"""
    flat = np.asarray(w, np.float32).reshape(-1)
    n = flat.size
    pad = (-n) % blocksize
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, np.float32)])
    g = flat.reshape(-1, blocksize)
    absmax = np.abs(g).max(axis=1)
    scaled = g / np.where(absmax[:, None] > 0, absmax[:, None], 1.0)
    codes = np.abs(scaled[..., None] - quant_map[None, None]).argmin(-1)
    codes = codes.reshape(-1)[:n].astype(np.uint8)
    if n % 2:
        codes = np.concatenate([codes, np.zeros(1, np.uint8)])
    packed = ((codes[0::2] << 4) | codes[1::2]).reshape(-1, 1)
    return packed, absmax


def decode_bnb_param(sd: Mapping[str, np.ndarray], stem: str):
    """Decode ``<stem>`` (packed) + its bnb sidecar tensors, or None."""
    packed = sd.get(stem)
    state = None
    for suffix in (".quant_state.bitsandbytes__nf4",
                   ".quant_state.bitsandbytes__fp4"):
        if stem + suffix in sd:
            state = np.asarray(sd[stem + suffix])
            break
    if packed is None or state is None:
        return None
    meta = json.loads(bytes(state.astype(np.uint8)).decode("utf-8"))
    shape = tuple(meta["shape"])
    blocksize = int(meta.get("blocksize", BLOCKSIZE))
    return dequantize_4bit(
        packed,
        sd[stem + ".absmax"],
        sd[stem + ".quant_map"],
        shape,
        blocksize=blocksize,
        nested_absmax=sd.get(stem + ".nested_absmax"),
        nested_quant_map=sd.get(stem + ".nested_quant_map"),
        absmax_offset=float(meta.get("offset", 0.0)),
    )
