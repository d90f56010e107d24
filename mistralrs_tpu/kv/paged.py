"""Device-side paged KV cache tensors + write/attend ops.

The analog of the reference's `CacheEngine` (physical paged tensors,
`paged_attention/cache_engine.rs`) and the PagedAttention model layer
(`paged_attention/layers/paged_attention.rs`: `reshape_and_cache` write +
paged decode kernel + gather-KV prefill).

Layout: one pool per layer, **head-major** —
``k/v: [L, n_kv, num_blocks * block_size, head_dim]`` — so one (head, block)
stripe is a single contiguous ``block_size × head_dim`` DMA for the Pallas
paged-decode kernel (`ops/paged_attention.py`), and a slot mapping is one
scatter index along the slot axis. The XLA path uses scatter/gather.

Optional KV quantization (INT8/FP8 per-head-group scale) mirrors
`PagedCacheType` (cache_engine.rs:13).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.config import ModelConfig


#: Per-buffer element ceiling for KV pools. The TPU compiler rejects single
#: HBM buffers at/above 2^32 elements (32-bit linear indexing); 2^31 keeps a
#: safety margin AND int32-safe flat slot arithmetic. A monolithic
#: [L, n_kv, S_total, hd] pool crosses this at (for llama-3-8B geometry,
#: 32L × 8kv × 128hd = 32768 elements/slot) S_total ≥ 65536 slots ≈ bs=8 ×
#: 8192 ctx — far below the reference methodology's 16384-depth envelope
#: (`releases/v0.8.2/report.md:42-49`). Layer-chunked pools remove the
#: ceiling: the L axis is split into ceil(total/LIMIT) chunks, each its own
#: buffer, scanned one sub-scan per chunk in forward_paged. The reference
#: has no such ceiling because it allocates per-layer cache tensors
#: (`mistralrs-core/src/paged_attention/cache_engine.rs:56`); chunking is
#: the TPU analog that keeps the one-compiled-layer-body scan.
POOL_MAX_ELEMS = 2**31


def _layer_chunks(num_layers: int, elems_per_layer: int,
                  max_elems: int) -> tuple[int, ...]:
    """Split the layer axis so each chunk's buffer stays under max_elems.
    Returns per-chunk layer counts (sums to num_layers)."""
    per_buffer_layers = max(int(max_elems // max(elems_per_layer, 1)), 1)
    n_chunks = -(-num_layers // per_buffer_layers)
    base, rem = divmod(num_layers, n_chunks)
    return tuple(base + (1 if i < rem else 0) for i in range(n_chunks))


@dataclass(frozen=True)
class PagedKVCache:
    """k/v pools: [L, n_kv, S_total(slots), head_dim] (+ scales if quantized).

    Scales are SLOT-major and PACKED — [L, S_total, SW] bf16 with k scales
    in lanes 0:n_kv and v scales in n_kv:2n_kv (SW = 128-lane multiple) —
    so the fused Pallas decode kernel can DMA a block's scales as ONE
    lane-aligned 8-row sublane slice and RMW this step's scale row exactly
    like the KV write window (the analog of the reference's
    update_kvscales.cu living inside pagedattention_v2).

    When a monolithic pool would cross POOL_MAX_ELEMS, each field is a
    TUPLE of per-chunk arrays ([Lc, n_kv, S_total, hd] with sum(Lc) = L)
    instead of one array; ``layer_chunks`` holds the per-chunk layer
    counts. forward_paged scans chunk by chunk so no single buffer crosses
    the compiler ceiling (the analog of the reference's per-layer cache
    tensors, cache_engine.rs:56)."""

    k: jax.Array
    v: jax.Array
    kv_scale: Optional[jax.Array] = None  # [L, S_total, SW] for int8/fp8 KV:
    # bf16, lanes 0:n_kv = k scales, n_kv:2n_kv = v scales, SW = 128-lane
    # multiple (Mosaic lane quantum — makes per-block scale DMAs legal)

    @classmethod
    def create(
        cls,
        cfg: ModelConfig,
        num_blocks: int,
        block_size: int,
        dtype=jnp.bfloat16,
        kv_quant: Optional[str] = None,  # None | 'int8' | 'fp8'
        groups: int = 1,  # data-parallel groups: slot axis = groups × plane
        tp_shards: int = 1,  # model-axis shards: the packed scale plane's
        # lane axis is tp_shards × 128-lane rows, one per shard, so lane
        # sharding over the model axis hands each shard ITS heads' scales
        head_dim_pad: Optional[int] = None,  # pool head_dim (≥ cfg.head_dim):
        # pad to the 128-lane Mosaic quantum so hd=64/80/96 archs decode
        # through the fused Pallas kernel (forward_paged pads K/V rows on
        # write and slices the attention output back)
        max_buffer_elems: Optional[int] = None,  # per-buffer ceiling
        # (default POOL_MAX_ELEMS, resolved at call time so tests can
        # monkeypatch); pools that would exceed it come back layer-chunked
        # (tuples of arrays)
    ) -> "PagedKVCache":
        # +1 trash block PER GROUP: dropped writes (slot −1) scatter into it
        # so they can never collide with live slots (duplicate scatter
        # indices have nondeterministic winners). Under DP the slot axis is
        # sharded over the "data" mesh axis and each group uses LOCAL ids.
        slots = groups * (num_blocks + 1) * block_size
        hd = max(head_dim_pad or 0, cfg.head_dim)
        elems_per_layer = cfg.num_kv_heads * slots * hd
        chunks = _layer_chunks(
            cfg.num_layers, elems_per_layer,
            POOL_MAX_ELEMS if max_buffer_elems is None else max_buffer_elems,
        )

        def pool(store):
            if len(chunks) == 1:
                return jnp.zeros(
                    (cfg.num_layers, cfg.num_kv_heads, slots, hd), store
                )
            return tuple(
                jnp.zeros((lc, cfg.num_kv_heads, slots, hd), store)
                for lc in chunks
            )

        if kv_quant is None:
            return cls(pool(dtype), pool(dtype))
        store = jnp.int8 if kv_quant == "int8" else jnp.float8_e4m3fn
        n_local = -(-cfg.num_kv_heads // tp_shards)
        sw = tp_shards * max(128, -(-2 * n_local // 128) * 128)
        if len(chunks) == 1:
            scale = jnp.zeros((cfg.num_layers, slots, sw), jnp.bfloat16)
        else:
            scale = tuple(
                jnp.zeros((lc, slots, sw), jnp.bfloat16) for lc in chunks
            )
        return cls(pool(store), pool(store), scale)

    @property
    def quantized(self) -> bool:
        return self.kv_scale is not None

    @property
    def chunked(self) -> bool:
        return isinstance(self.k, tuple)

    @property
    def layer_chunks(self) -> tuple[int, ...]:
        if self.chunked:
            return tuple(c.shape[0] for c in self.k)
        return (self.k.shape[0],)

    @property
    def head_dim(self) -> int:
        return (self.k[0] if self.chunked else self.k).shape[-1]

    @property
    def num_slots(self) -> int:
        return (self.k[0] if self.chunked else self.k).shape[2]


jax.tree_util.register_dataclass(
    PagedKVCache, data_fields=["k", "v", "kv_scale"], meta_fields=[]
)


def auto_head_dim_pad(head_dim: int, backend: Optional[str] = None) -> Optional[int]:
    """Pool head_dim for the fused decode kernel: pad to the next 128-lane
    multiple on TPU so hd=64/80/96 archs (phi2/phi3, gemma2, many small
    models) take the kernel instead of the 3x-traffic gather path. Env
    ``MRSTPU_PA_PAD_HD`` overrides ('0' disables; a number forces a value,
    which CPU tests use to exercise the padded path)."""
    import os

    env = os.environ.get("MRSTPU_PA_PAD_HD")
    if env is not None:
        n = int(env)
        return None if n <= 0 else max(n, head_dim)
    if head_dim % 128 == 0:
        return None
    on_tpu = backend == "pallas" or (
        backend is None and jax.default_backend() == "tpu"
    )
    return -(-head_dim // 128) * 128 if on_tpu else None


def write_kv(
    cache_k: jax.Array,  # [n_kv, S_total, hd] (one layer)
    cache_v: jax.Array,
    k_new: jax.Array,  # [T, n_kv, hd]
    v_new: jax.Array,
    slots: jax.Array,  # [T] int32 physical slot ids; negative → dropped
    kv_scale: Optional[jax.Array] = None,  # [S_total, SW] packed slot-major
):
    """reshape_and_cache: scatter new KV rows into the pool. Dropped rows
    (slot < 0) land in the reserved trash block at the end of the pool.
    Returns updated (cache_k, cache_v, kv_scale)."""
    trash = cache_k.shape[1] - 1  # last slot of the reserved trash block
    safe = jnp.where(slots < 0, trash, slots)
    k_hm = jnp.swapaxes(k_new, 0, 1)  # [n_kv, T, hd]
    v_hm = jnp.swapaxes(v_new, 0, 1)
    if kv_scale is None:
        return (
            cache_k.at[:, safe].set(k_hm.astype(cache_k.dtype)),
            cache_v.at[:, safe].set(v_hm.astype(cache_v.dtype)),
            None,
        )
    # quantized KV: per (head, slot) abs-max scale
    def q(x, cache):  # x: [n_kv, T, hd]
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)  # [n_kv, T]
        if cache.dtype == jnp.int8:
            s = amax / 127.0
            enc = jnp.clip(
                jnp.round(x.astype(jnp.float32) / jnp.maximum(s, 1e-10)[..., None]),
                -127,
                127,
            ).astype(jnp.int8)
        else:  # fp8 e4m3: max normal 448
            s = amax / 448.0
            enc = (x.astype(jnp.float32) / jnp.maximum(s, 1e-10)[..., None]).astype(
                cache.dtype
            )
        return cache.at[:, safe].set(enc), jnp.swapaxes(s, 0, 1)  # s → [T, n_kv]

    n_kv = cache_k.shape[0]
    ck, ks = q(k_hm, cache_k)
    cv, vs = q(v_hm, cache_v)
    packed = jnp.zeros((ks.shape[0], kv_scale.shape[1]), kv_scale.dtype)
    packed = packed.at[:, :n_kv].set(ks.astype(kv_scale.dtype))
    packed = packed.at[:, n_kv:2 * n_kv].set(vs.astype(kv_scale.dtype))
    return ck, cv, kv_scale.at[safe].set(packed)


def gather_kv(
    cache_k: jax.Array,  # [n_kv, S_total, hd]
    cache_v: jax.Array,
    block_table: jax.Array,  # [B, max_blocks] int32 (−1 padding allowed)
    block_size: int,
    kv_scale: Optional[jax.Array] = None,  # [S_total, SW] packed slot-major
    dtype=jnp.bfloat16,
):
    """Materialize per-sequence KV [B, max_blocks*block_size, n_kv, hd] from
    the pool (the gather-KV path; validity masked downstream via kv_len)."""
    bt = jnp.maximum(block_table, 0)
    slots = (bt[:, :, None] * block_size + jnp.arange(block_size)[None, None, :]).reshape(
        block_table.shape[0], -1
    )  # [B, S]
    k = cache_k[:, slots]  # [n_kv, B, S, hd]
    v = cache_v[:, slots]
    if kv_scale is not None:
        # packed slot-major scales [S_total, SW] → [n_kv, B, S, 1]
        n_kv = cache_k.shape[0]
        sc = kv_scale[slots].astype(jnp.float32)  # [B, S, SW]
        k = k.astype(jnp.float32) * jnp.transpose(sc[..., :n_kv], (2, 0, 1))[..., None]
        v = v.astype(jnp.float32) * jnp.transpose(
            sc[..., n_kv:2 * n_kv], (2, 0, 1)
        )[..., None]
    # → [B, S, n_kv, hd] (XLA fuses the transpose into the gather consumer)
    return (
        jnp.transpose(k, (1, 2, 0, 3)).astype(dtype),
        jnp.transpose(v, (1, 2, 0, 3)).astype(dtype),
    )


def calculate_cache_config(
    cfg,
    *,
    block_size: int = 16,
    max_model_len: int,
    max_batch: int,
    kv_quant: bool = False,
    compute_dtype=None,
    utilization: float = 0.90,
    weight_bytes: int | None = None,
    hbm_bytes: int | None = None,
    tp_shards: int = 1,
) -> int:
    """HBM-utilization-driven KV pool sizing — the analog of the reference's
    `calculate_cache_config` (`paged_attention/mod.rs:149`): fill
    ``utilization`` of the device's free HBM (after weights) with KV blocks,
    clamped to [enough for max_batch sequences at max_model_len … what fits].

    Falls back to a fraction of total memory when the backend exposes no
    memory stats (CPU tests)."""
    import jax
    import jax.numpy as jnp

    dtype = compute_dtype or jnp.bfloat16
    dsize = 1 if kv_quant else jnp.dtype(dtype).itemsize
    bytes_per_slot = 2 * cfg.num_layers * cfg.num_kv_heads * cfg.head_dim * dsize
    if kv_quant:  # packed bf16 per-(head,slot) scale plane (128-lane rows);
        # MUST match PagedKVCache.create's SW = tp_shards × per-shard rows,
        # or mesh engines over-allocate blocks and OOM at startup
        n_local = -(-cfg.num_kv_heads // tp_shards)
        sw = tp_shards * max(128, -(-2 * n_local // 128) * 128)
        bytes_per_slot += cfg.num_layers * sw * 2
    bytes_per_block = bytes_per_slot * block_size

    if hbm_bytes is None:
        dev = jax.devices()[0]
        stats = getattr(dev, "memory_stats", lambda: None)() or {}
        limit = stats.get("bytes_limit")
        in_use = stats.get("bytes_in_use", 0)
        if limit:
            free = limit - in_use
            if weight_bytes is not None and in_use < weight_bytes:
                # weights not resident yet — subtract their projected size
                free -= weight_bytes - in_use
        else:  # CPU / no stats: assume 16 GiB budget (tests override)
            free = 16 << 30
            if weight_bytes:
                free -= weight_bytes
    else:
        free = hbm_bytes - (weight_bytes or 0)

    budget = int(free * utilization)
    # create() allocates num_blocks + 1 (the trash block for dropped writes)
    num_blocks = max(budget // bytes_per_block - 1, 1)
    # the engine needs at least max_batch sequences' worth of headroom for
    # one block each, and no more than full-length capacity for max_batch
    min_blocks = max_batch * 2
    max_useful = -(-max_model_len // block_size) * max_batch
    return int(min(max(num_blocks, min_blocks), max_useful))
