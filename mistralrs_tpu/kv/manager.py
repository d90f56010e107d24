"""Per-request block-table management (the analog of `KVCacheManager`,
`mistralrs-core/src/paged_attention/kv_cache_manager.rs:43`):
prefix-cache lookup on admission, slot allocation as decoding proceeds,
slot-mapping/block-table construction for the kernels."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import numpy as np

from .block_pool import BlockPool, KVCacheBlock, hash_block_tokens


@dataclass
class RequestBlocks:
    blocks: list[KVCacheBlock] = field(default_factory=list)
    num_cached_tokens: int = 0  # tokens covered by prefix-cache hits
    hashes: list[int] = field(default_factory=list)  # chained block hashes
    num_cached_blocks: int = 0  # blocks already published to the prefix cache


class KVCacheManager:
    def __init__(
        self,
        num_blocks: int,
        block_size: int,
        enable_prefix_caching: bool = True,
    ):
        self.block_size = block_size
        self.pool = BlockPool(num_blocks, enable_prefix_caching)
        self._requests: dict[str, RequestBlocks] = {}

    # data-parallel group interface (trivial for the single-group manager;
    # see GroupedKVManager)
    def assign_group(self, request_id: str, allowed=None) -> int:
        return 0

    def group_of(self, request_id: str) -> int:
        return 0

    # -- admission ----------------------------------------------------------

    def get_computed_blocks(
        self, request_id: str, token_ids: Sequence[int], extra: tuple = ()
    ) -> int:
        """Find the longest cached prefix (full blocks only, never the whole
        prompt — at least one token must be recomputed to produce logits).
        Returns the number of cached tokens; the hit blocks are recorded (but
        not yet ref-counted — `allocate_slots` takes ownership)."""
        bs = self.block_size
        st = self._requests.setdefault(request_id, RequestBlocks())
        n_full = len(token_ids) // bs
        hashes: list[int] = []
        parent = None
        for i in range(n_full):
            h = hash_block_tokens(parent, token_ids[i * bs : (i + 1) * bs], extra)
            hashes.append(h)
            parent = h
        st.hashes = hashes
        hits: list[KVCacheBlock] = []
        for h in hashes:
            b = self.pool.get_cached_block(h)
            if b is None:
                break
            hits.append(b)
        # never serve the entire prompt from cache
        if hits and len(hits) * bs >= len(token_ids):
            hits.pop()
        st.blocks = hits
        st.num_cached_tokens = len(hits) * bs
        st.num_cached_blocks = len(hits)
        return st.num_cached_tokens

    def allocate_slots(
        self,
        request_id: str,
        num_tokens_total: int,
    ) -> bool:
        """Ensure the request has blocks covering ``num_tokens_total`` tokens.
        On first call, takes ownership (touch) of prefix-hit blocks. Returns
        False (allocating nothing) if the pool cannot satisfy the request."""
        st = self._requests.setdefault(request_id, RequestBlocks())
        bs = self.block_size
        needed_blocks = -(-num_tokens_total // bs)
        have = len(st.blocks)
        if not getattr(st, "_owned", False):
            self.pool.touch(st.blocks)
            st._owned = True  # type: ignore[attr-defined]
        new = needed_blocks - have
        if new <= 0:
            return True
        if new > self.pool.num_free_blocks:
            return False
        st.blocks.extend(self.pool.allocate(new))
        return True

    def can_allocate(self, num_new_blocks: int) -> bool:
        return num_new_blocks <= self.pool.num_free_blocks

    # -- progress / publication --------------------------------------------

    def publish_full_blocks(self, request_id: str, num_computed_tokens: int) -> None:
        """Publish blocks that are now fully written to the prefix cache."""
        st = self._requests.get(request_id)
        if st is None:
            return
        bs = self.block_size
        full = num_computed_tokens // bs
        for i in range(st.num_cached_blocks, min(full, len(st.hashes), len(st.blocks))):
            self.pool.cache_block(st.blocks[i], st.hashes[i])
        st.num_cached_blocks = max(st.num_cached_blocks, min(full, len(st.hashes)))

    def extend_hashes(self, request_id: str, token_ids: Sequence[int]) -> None:
        """Extend the hash chain as generated tokens complete new blocks."""
        st = self._requests.get(request_id)
        if st is None:
            return
        bs = self.block_size
        n_full = len(token_ids) // bs
        parent = st.hashes[-1] if st.hashes else None
        for i in range(len(st.hashes), n_full):
            h = hash_block_tokens(parent, token_ids[i * bs : (i + 1) * bs])
            st.hashes.append(h)
            parent = h

    # -- kernel-facing views -------------------------------------------------

    def block_table(self, request_id: str) -> list[int]:
        return [b.block_id for b in self._requests[request_id].blocks]

    def num_cached_tokens(self, request_id: str) -> int:
        st = self._requests.get(request_id)
        return st.num_cached_tokens if st else 0

    def slot_mapping(self, request_id: str, start: int, length: int) -> np.ndarray:
        """Physical slot index for logical token positions [start, start+len)."""
        st = self._requests[request_id]
        bs = self.block_size
        pos = np.arange(start, start + length)
        block_ids = np.asarray([b.block_id for b in st.blocks])
        return block_ids[pos // bs] * bs + pos % bs

    # -- teardown -----------------------------------------------------------

    def free(self, request_id: str) -> None:
        st = self._requests.pop(request_id, None)
        if st is not None and getattr(st, "_owned", False):
            self.pool.free(st.blocks)

    @property
    def num_free_blocks(self) -> int:
        return self.pool.num_free_blocks


class GroupedKVManager:
    """Data-parallel-group-partitioned KV manager: each DP group owns an
    independent pool of ``num_blocks`` blocks — its own slice of the
    slot-axis-sharded device pools — with LOCAL block/slot ids (each shard of
    the shard_mapped forward only ever sees its group's rows, so no global
    offsets are needed). Requests are pinned to the group with the most free
    blocks at admission; prefix caches are per-group (like replica engines).
    """

    def __init__(
        self,
        groups: int,
        num_blocks: int,
        block_size: int,
        enable_prefix_caching: bool = True,
    ):
        self.groups = groups
        self.block_size = block_size
        self.num_blocks = num_blocks
        self.mgrs = [
            KVCacheManager(num_blocks, block_size, enable_prefix_caching)
            for _ in range(groups)
        ]
        self._group: dict[str, int] = {}

    def assign_group(self, request_id: str, allowed=None) -> int:
        g = self._group.get(request_id)
        if g is not None:
            return g
        cands = list(allowed) if allowed is not None else list(range(self.groups))
        g = max(cands, key=lambda i: self.mgrs[i].num_free_blocks)
        self._group[request_id] = g
        return g

    def group_of(self, request_id: str) -> int:
        return self._group.get(request_id, 0)

    def _m(self, request_id: str) -> KVCacheManager:
        return self.mgrs[self._group.get(request_id, 0)]

    def get_computed_blocks(self, request_id, token_ids, extra: tuple = ()) -> int:
        return self._m(request_id).get_computed_blocks(request_id, token_ids, extra)

    def allocate_slots(self, request_id, num_tokens_total) -> bool:
        return self._m(request_id).allocate_slots(request_id, num_tokens_total)

    def publish_full_blocks(self, request_id, num_computed_tokens) -> None:
        self._m(request_id).publish_full_blocks(request_id, num_computed_tokens)

    def extend_hashes(self, request_id, token_ids) -> None:
        self._m(request_id).extend_hashes(request_id, token_ids)

    def block_table(self, request_id):
        return self._m(request_id).block_table(request_id)

    def num_cached_tokens(self, request_id) -> int:
        return self._m(request_id).num_cached_tokens(request_id)

    def slot_mapping(self, request_id, start, length):
        return self._m(request_id).slot_mapping(request_id, start, length)

    def free(self, request_id) -> None:
        self._m(request_id).free(request_id)
        self._group.pop(request_id, None)

    @property
    def num_free_blocks(self) -> int:
        return max(m.num_free_blocks for m in self.mgrs)
