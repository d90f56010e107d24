"""Non-paged prefix cacher: snapshot reuse is token-identical to plain
generate, longest-prefix lookup, LRU byte eviction."""

import numpy as np
import pytest

import jax.numpy as jnp

from mistralrs_tpu.generate import generate
from mistralrs_tpu.models import ModelConfig, init_random_weights
from mistralrs_tpu.models.llama import KVCache
from mistralrs_tpu.prefix_cacher import (
    PrefixCacheManager,
    generate_with_prefix_cache,
)

CFG = ModelConfig(
    arch="llama", vocab_size=96, hidden_size=48, intermediate_size=96,
    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=12,
    max_position_embeddings=256,
)
WEIGHTS = init_random_weights(CFG, seed=55, dtype=jnp.float32)


def test_cached_generation_matches_plain():
    mgr = PrefixCacheManager()
    system = [3, 17, 40, 9, 22, 61]
    p1 = system + [5, 8]
    p2 = system + [30, 31, 32]
    ref1 = generate(WEIGHTS, CFG, p1, max_new_tokens=10,
                    compute_dtype=jnp.float32, stop_tokens=set())
    got1 = generate_with_prefix_cache(mgr, WEIGHTS, CFG, p1,
                                      max_new_tokens=10, stop_tokens=set())
    assert got1 == ref1
    assert mgr.misses == 1 and mgr.num_entries == 1
    # second call shares only the system prefix with p1's snapshot; the
    # longest-COMMON-prefix match restores it and re-prefills the tail
    ref2 = generate(WEIGHTS, CFG, p2, max_new_tokens=10,
                    compute_dtype=jnp.float32, stop_tokens=set())
    got2 = generate_with_prefix_cache(mgr, WEIGHTS, CFG, p2,
                                      max_new_tokens=10, stop_tokens=set())
    assert got2 == ref2
    assert mgr.hits == 1


def test_longest_prefix_wins():
    mgr = PrefixCacheManager()
    c1 = KVCache.create(CFG, 1, 2, dtype=jnp.float32)
    c2 = KVCache.create(CFG, 1, 4, dtype=jnp.float32)
    mgr.insert([1, 2], c1)
    mgr.insert([1, 2, 3, 4], c2)
    hit = mgr.lookup([1, 2, 3, 4, 5])
    assert hit is not None and hit.tokens == (1, 2, 3, 4)
    # exact match is capped at len-1 (the last token must re-prefill)
    hit = mgr.lookup([1, 2])
    assert hit is not None and hit.tokens == (1,)
    assert mgr.lookup([9, 9]) is None


def test_lru_eviction_by_bytes():
    one = KVCache.create(CFG, 1, 8, dtype=jnp.float32)
    per = PrefixCacheManager._nbytes(one)
    mgr = PrefixCacheManager(max_bytes=2 * per)
    mgr.insert([1], one)
    mgr.insert([2], KVCache.create(CFG, 1, 8, dtype=jnp.float32))
    mgr.insert([3], KVCache.create(CFG, 1, 8, dtype=jnp.float32))
    assert mgr.num_entries == 2
    assert mgr.lookup([1, 9]) is None  # oldest evicted
    assert mgr.lookup([3, 9]) is not None
