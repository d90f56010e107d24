"""Non-paged prefix cacher — the analog of the reference's
`PrefixCacheManagerV2` (`mistralrs-core/src/prefix_cacher.rs:161`):
device-resident KV-cache snapshots keyed by token prefix, with
longest-prefix lookup and LRU eviction by resident bytes.

The paged engine has its own block-level prefix cache (`kv/block_pool.py`);
this one serves the contiguous-cache `generate()` path, where a snapshot is
the whole `KVCache` up to a given length (system prompts, few-shot
preambles re-used across calls)."""

from __future__ import annotations

from collections import OrderedDict
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models.config import ModelConfig
from .models.llama import KVCache, forward


@dataclass
class PrefixHit:
    tokens: tuple[int, ...]
    cache: KVCache  # valid through len(tokens)


class PrefixCacheManager:
    """LRU map: token prefix → KVCache snapshot (device arrays)."""

    def __init__(self, max_bytes: int = 2 << 30):
        self.max_bytes = max_bytes
        self._store: OrderedDict[tuple[int, ...], KVCache] = OrderedDict()
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    @staticmethod
    def _nbytes(cache: KVCache) -> int:
        return sum(x.size * x.dtype.itemsize
                   for x in jax.tree_util.tree_leaves(cache))

    def insert(self, tokens, cache: KVCache) -> None:
        key = tuple(int(t) for t in tokens)
        if key in self._store:
            self._bytes -= self._nbytes(self._store.pop(key))
        self._store[key] = cache
        self._bytes += self._nbytes(cache)
        while self._bytes > self.max_bytes and len(self._store) > 1:
            _, evicted = self._store.popitem(last=False)
            self._bytes -= self._nbytes(evicted)

    def lookup(self, tokens) -> Optional[PrefixHit]:
        """Longest COMMON prefix with any stored snapshot (reference
        `search_for_matching_cache` semantics): the snapshot's cache is
        valid through the shared length, the divergent tail re-prefills.
        Capped at len(tokens)-1 so the last token's logits still compute."""
        toks = tuple(int(t) for t in tokens)
        best_key: Optional[tuple[int, ...]] = None
        best_common = 0
        for key in self._store:
            limit = min(len(key), len(toks) - 1)
            common = 0
            while common < limit and key[common] == toks[common]:
                common += 1
            if common > best_common:
                best_common = common
                best_key = key
        if best_key is None or best_common == 0:
            self.misses += 1
            return None
        self._store.move_to_end(best_key)
        self.hits += 1
        return PrefixHit(toks[:best_common], self._store[best_key])

    @property
    def num_entries(self) -> int:
        return len(self._store)


def generate_with_prefix_cache(
    manager: PrefixCacheManager,
    weights: dict,
    cfg: ModelConfig,
    prompt_ids,
    *,
    max_new_tokens: int = 64,
    compute_dtype=jnp.float32,
    stop_tokens=None,
    snapshot: bool = True,
) -> list[int]:
    """`generate()` with snapshot reuse: restores the longest cached prefix,
    prefills only the suffix, and (optionally) stores the full-prompt
    snapshot for the next call. Token-identical to plain `generate`."""
    ids = [int(t) for t in prompt_ids]
    t_total = len(ids)
    capacity = min(cfg.max_position_embeddings, t_total + max_new_tokens)
    hit = manager.lookup(ids)
    start = len(hit.tokens) if hit else 0
    cache = KVCache.create(cfg, 1, capacity, dtype=compute_dtype)
    if hit:
        # copy the snapshot into the (possibly larger) fresh cache
        # (cache layout [L, B, S, n_kv, hd]; S is axis 2)
        n = min(hit.cache.k.shape[2], start)
        cache = KVCache(
            k=cache.k.at[:, :, :n].set(hit.cache.k[:, :, :n]),
            v=cache.v.at[:, :, :n].set(hit.cache.v[:, :, :n]),
        )
    suffix = jnp.asarray(np.asarray(ids[start:], np.int32)[None])
    positions = (start + jnp.arange(t_total - start))[None].astype(jnp.int32)
    logits, cache = forward(
        weights, cfg, suffix, positions, cache,
        jnp.full((1,), start, jnp.int32), compute_dtype=compute_dtype,
        logits_last_only=True,
    )
    if snapshot:
        manager.insert(ids, cache)
    stops = stop_tokens if stop_tokens is not None else set(cfg.eos_token_ids)
    out: list[int] = []
    tok = jnp.argmax(logits[:, -1], axis=-1)
    for step in range(max_new_tokens):
        tok_i = int(tok[0])
        if tok_i in stops:
            break
        out.append(tok_i)
        pos = jnp.asarray([[t_total + step]], jnp.int32)
        logits, cache = forward(
            weights, cfg, tok[None].astype(jnp.int32), pos, cache,
            jnp.full((1,), t_total + step, jnp.int32),
            compute_dtype=compute_dtype, logits_last_only=True,
        )
        tok = jnp.argmax(logits[:, -1], axis=-1)
    return out
