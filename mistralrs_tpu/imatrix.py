"""Importance-matrix (imatrix) collection and imatrix-guided ISQ — the analog
of the reference's imatrix support (`mistralrs-core/src/pipeline/isq_flow/`
imatrix plumbing and llama.cpp-compatible collection).

An imatrix records, for every quantizable projection, the mean squared input
activation per input column over a calibration corpus. The weighted k-quant
fit (`gguf/quants.py::quantize_imatrix`) then minimizes the *activation-
weighted* reconstruction error — columns that carry large activations get
quantized more faithfully.

Collection taps the layer scan (`models/llama.py::forward(collect_moments=
True)`): per layer, Σx² of the attention input (q/k/v projections), the
attention output (o projection), the FFN input (gate/up) and the FFN hidden
(down projection).
"""

from __future__ import annotations

from typing import Mapping, Optional

import jax.numpy as jnp
import numpy as np

from .models.config import ModelConfig
from .models.llama import KVCache, forward

# imatrix key → the stacked-layer weight keys it covers
_KEY_MAP = {
    "attn_in": ("wq", "wk", "wv", "wqkv"),
    "o_in": ("wo",),
    "mlp_in": ("gate", "up", "wgateup"),
    "down_in": ("down",),
}


class ImatrixCollector:
    """Accumulates per-layer activation second moments over calibration runs."""

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        self.sums: Optional[dict[str, np.ndarray]] = None
        self.tokens = 0

    def update(self, weights: dict, input_ids: np.ndarray) -> None:
        """Run one calibration batch [B, T] through the model and accumulate."""
        ids = np.asarray(input_ids, np.int32)
        b, t = ids.shape
        cache = KVCache.create(self.cfg, b, t, dtype=jnp.float32)
        positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t)).astype(jnp.int32)
        _, _, moments = forward(
            weights, self.cfg, jnp.asarray(ids), positions, cache,
            jnp.zeros((b,), jnp.int32), compute_dtype=jnp.float32,
            collect_moments=True, logits_last_only=True,
        )
        moments = {k: np.asarray(v) for k, v in moments.items()}
        if self.sums is None:
            self.sums = moments
        else:
            for k, v in moments.items():
                self.sums[k] = self.sums[k] + v
        self.tokens += b * t

    def finalize(self) -> dict[str, np.ndarray]:
        """Mean squared activations: {tap: [L, dim] float32}."""
        if self.sums is None:
            raise ValueError("no calibration batches collected")
        return {k: (v / max(self.tokens, 1)).astype(np.float32)
                for k, v in self.sums.items()}


def save_imatrix(path, imatrix: Mapping[str, np.ndarray]) -> None:
    np.savez(path, **dict(imatrix))


def load_imatrix(path) -> dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def imatrix_rows_for_key(
    imatrix: Optional[Mapping[str, np.ndarray]], key: str
) -> Optional[np.ndarray]:
    """Per-layer importance rows [L, K] for a stacked weight key, or None."""
    if imatrix is None:
        return None
    for tap, keys in _KEY_MAP.items():
        if key in keys and tap in imatrix:
            return np.asarray(imatrix[tap])
    return None
