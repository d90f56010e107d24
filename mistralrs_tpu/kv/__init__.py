"""Paged KV-cache subsystem (the analog of `mistralrs-core/src/paged_attention/`)."""

from .block_pool import BlockPool, KVCacheBlock
from .manager import KVCacheManager
from .paged import PagedKVCache

__all__ = ["BlockPool", "KVCacheBlock", "KVCacheManager", "PagedKVCache"]
