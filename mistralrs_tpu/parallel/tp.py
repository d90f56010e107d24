"""Tensor-parallel execution over a device mesh.

The TPU-native analog of the reference's TP stack
(`mistralrs-quant/src/distributed/layers.rs` Row/ColumnParallel +
`src/distributed/mod.rs` NcclComm): a (data, model) `Mesh`, NamedSharding
placement of the weight pytree, and a `shard_map`-wrapped forward whose
row-parallel boundaries all-reduce with `psum` over ICI.

Sharding plan (megatron-style, quantized-aware — specs address the K-major
QTensor storage):

  wq/wk/wv/gate/up : column-parallel (shard out-features = heads/ffn)
  wo/down          : row-parallel    (shard in-features; psum after)
  lm_head          : column-parallel over vocab (+ all_gather of logits)
  embed/norms      : replicated
  KV cache         : sharded over kv-heads (model) and batch (data)
  MoE experts      : TP-sharded intra-expert (single psum after combine)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig
from ..models.llama import KVCache, forward
from ..quant.qtensor import QTensor

TP_AXIS = "model"
DP_AXIS = "data"

_COLUMN_KEYS = {"wq", "wk", "wv", "gate", "up"}
_ROW_KEYS = {"wo", "down"}
_REPL = P()


def resolve_tp(requested: int, n_heads: int, n_kv_heads: int, vocab: int,
               intermediate: int = 0) -> int:
    """Auto step-down so heads divide evenly (analog of
    `resolve_tensor_parallelism`, mistralrs-core/src/distributed.rs:149)."""
    tp = requested
    while tp > 1 and (
        n_heads % tp or n_kv_heads % tp or vocab % tp or intermediate % tp
    ):
        tp -= 1
    return max(tp, 1)


def build_mesh(tp: int, dp: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if devices.size < tp * dp:
        raise ValueError(f"need {tp * dp} devices, have {devices.size}")
    grid = devices[: tp * dp].reshape(dp, tp)
    return Mesh(grid, (DP_AXIS, TP_AXIS))


def expert_parallel(cfg: ModelConfig, tp: int) -> bool:
    """EP (shard the expert bank over the model axis — each shard computes
    its FULL local experts, one psum combines) when the expert count
    divides; override with MRSTPU_MOE_SHARD=tp for intra-expert sharding.
    The reference only TP-shards within experts (moe/experts/mod.rs:36) —
    EP keeps full-width expert matmuls on each chip."""
    import os

    if tp == 1 or cfg.num_experts == 0:
        return False
    if os.environ.get("MRSTPU_MOE_SHARD", "ep") == "tp":
        return False
    return cfg.num_experts % tp == 0


def local_config(cfg: ModelConfig, tp: int, ep: bool = False) -> ModelConfig:
    """Per-shard config: head/ffn dims divided by TP (expert width kept
    whole under EP)."""
    if tp == 1:
        return cfg
    if cfg.num_heads % tp or cfg.num_kv_heads % tp or cfg.intermediate_size % tp:
        raise ValueError(f"tp={tp} does not divide model dims")
    return dataclasses.replace(
        cfg,
        num_heads=cfg.num_heads // tp,
        num_kv_heads=cfg.num_kv_heads // tp,
        intermediate_size=cfg.intermediate_size // tp,
        moe_intermediate_size=(
            None if cfg.moe_intermediate_size is None or ep
            else cfg.moe_intermediate_size // tp
        ),
    )


def _qtensor_specs(qt: QTensor, kind: str, lead: int) -> QTensor:
    pre = (None,) * lead
    if kind == "column":  # shard N (last dim of every K-major leaf)
        spec = P(*pre, None, TP_AXIS)
    elif kind == "row":  # shard K/G (second-to-last dim)
        spec = P(*pre, TP_AXIS, None)
    else:
        spec = P()
    return QTensor(
        data=spec,
        scale=spec,
        bias=None if qt.bias is None else spec,
        group_size=qt.group_size,
        packed=qt.packed,
        code_bits=qt.code_bits,
        ggml_type=qt.ggml_type,
        chunks=qt.chunks,
    )


def _dense_specs(arr, kind: str, lead: int):
    pre = (None,) * lead
    if kind == "column":  # dense [.., N, K]: shard N
        return P(*pre, TP_AXIS, None) if arr.ndim == lead + 2 else P(*pre, TP_AXIS)
    if kind == "row":  # dense [.., N, K]: shard K
        return P(*pre, None, TP_AXIS)
    return P()


def _entry_spec(key: str, w, lead: int):
    base = key.removesuffix("_bias")
    if base in _COLUMN_KEYS:
        kind = "column" if not key.endswith("_bias") else "column_bias"
    elif base in _ROW_KEYS:
        # row-parallel bias is added AFTER the psum → replicated
        kind = "row" if not key.endswith("_bias") else "repl"
    else:
        kind = "repl"
    if kind == "column_bias":
        return P(*((None,) * lead), TP_AXIS)
    if isinstance(w, QTensor):
        return _qtensor_specs(w, kind, lead)
    return _dense_specs(w, kind, lead)


def _ep_spec(w):
    """Shard the EXPERT axis (index 1 of [L, E, ...] leaves)."""
    spec = P(None, TP_AXIS)
    if isinstance(w, QTensor):
        return QTensor(
            data=spec, scale=spec,
            bias=None if w.bias is None else spec,
            group_size=w.group_size, packed=w.packed, code_bits=w.code_bits,
            ggml_type=w.ggml_type, chunks=w.chunks,
        )
    return spec


def _lora_specs(base: str, entry: dict) -> dict:
    """Sharding for a per-target LoRA dict {a, b} (single [L,r,K]/[L,N,r] or
    bank [L,A,r,K]/[L,A,N,r]): column targets shard B's N axis, row targets
    shard A's K axis. The delta then lands in the same layout as the base
    matmul's local output — column deltas are N-local, row deltas are
    K-partial and ride the existing psum in `_row_linear`
    (models/llama.py:56)."""
    out: dict[str, Any] = {}
    for kk, arr in entry.items():
        nd = arr.ndim
        if kk == "a" and base in _ROW_KEYS:
            out[kk] = P(*(None,) * (nd - 1), TP_AXIS)  # [..., r, K]: shard K
        elif kk == "b" and base in _COLUMN_KEYS:
            out[kk] = P(*(None,) * (nd - 2), TP_AXIS, None)  # [..., N, r]
        else:
            out[kk] = P()
    return out


def _layer_specs(layers_in: dict, ep: bool = False) -> dict:
    layers: dict[str, Any] = {}
    for key, w in layers_in.items():
        if key.endswith(("_lora", "_xlora")) and isinstance(w, dict):
            base = key.rsplit("_", 1)[0]
            layers[key] = _lora_specs(base, w)
        elif key == "experts":
            if ep:
                layers[key] = {ek: _ep_spec(ew) for ek, ew in w.items()}
            elif "gate_up" in w:
                # gpt_oss bank layout [L, E, in, out] — replicate (its
                # interleaved gate/up pairs don't split on the TP axis)
                layers[key] = {ek: P() for ek in w}
            else:
                layers[key] = {
                    ek: _entry_spec(ek, ew, lead=2) for ek, ew in w.items()
                }
        elif isinstance(w, dict):  # shared_expert etc: per-layer sub-MLP
            layers[key] = {ek: _entry_spec(ek, ew, lead=1) for ek, ew in w.items()}
        else:
            layers[key] = _entry_spec(key, w, lead=1)
    return layers


def weight_pspecs(weights: dict, ep: bool = False) -> dict:
    """PartitionSpec pytree matching the model weights pytree."""
    layers = _layer_specs(weights["layers"], ep=ep)

    lm_head = weights.get("lm_head")
    if lm_head is None:
        head_spec = None
    elif isinstance(lm_head, QTensor):
        head_spec = _qtensor_specs(lm_head, "column", 0)
    else:
        head_spec = P(TP_AXIS, None)

    embed = weights["embed"]
    embed_spec = _qtensor_specs(embed, "repl", 0) if isinstance(embed, QTensor) else P()

    specs = {
        "embed": embed_spec,
        "layers": layers,
        "final_norm": P(),
        "lm_head": head_spec,
        "layer_windows": P(),
    }
    if "layers_moe" in weights:  # dense-prefix MoE models (glm4moe)
        specs["layers_moe"] = _layer_specs(weights["layers_moe"], ep=ep)
    # replicate any other top-level entries (rope flags, extra norms, ...)
    for key in weights:
        if key not in specs:
            specs[key] = P()
    return specs


def shard_weights(mesh: Mesh, weights: dict, specs: Optional[dict] = None) -> dict:
    specs = specs or weight_pspecs(weights)
    return jax.tree_util.tree_map(
        lambda w, s: None if w is None else jax.device_put(w, NamedSharding(mesh, s)),
        weights,
        specs,
        is_leaf=lambda x: x is None,
    )


def cache_pspecs() -> KVCache:
    spec = P(None, DP_AXIS, None, TP_AXIS, None)
    return KVCache(k=spec, v=spec)


def paged_cache_pspecs(quantized_kv: bool = False, chunks: int = 1):
    """PartitionSpecs for kv.paged.PagedKVCache pools [L, n_kv, S, hd]:
    kv-heads shard over the model axis; the slot axis shards over the data
    axis (each DP group owns an independent pool plane with LOCAL block/slot
    ids — see kv/manager.py GroupedKVManager). ``chunks > 1`` mirrors a
    layer-chunked pool (tuple of per-chunk buffers, kv/paged.py)."""
    from ..kv.paged import PagedKVCache

    spec = P(None, TP_AXIS, DP_AXIS, None)
    # packed slot-major scales [L, S_total, tp·128]: slots over data; the
    # lane axis shards over model in per-shard 128-lane rows, so each shard
    # locally sees [L, S_local, 128] with ITS heads' scales in lanes
    # 0:n_kv_local (k) and n_kv_local:2n_kv_local (v)
    sspec = P(None, DP_AXIS, TP_AXIS) if quantized_kv else None
    if chunks > 1:
        return PagedKVCache(
            k=(spec,) * chunks, v=(spec,) * chunks,
            kv_scale=(sspec,) * chunks if quantized_kv else None,
        )
    return PagedKVCache(k=spec, v=spec, kv_scale=sspec)


def replicated_cache_pspecs(quantized_kv: bool = False, chunks: int = 1):
    """Paged-pool specs with KV heads REPLICATED over the model axis (slot
    axis still shards over data) — for small draft models in speculative
    serving whose head counts don't divide tp."""
    from ..kv.paged import PagedKVCache

    spec = P(None, None, DP_AXIS, None)
    sspec = P(None, DP_AXIS, None) if quantized_kv else None
    if chunks > 1:
        return PagedKVCache(
            k=(spec,) * chunks, v=(spec,) * chunks,
            kv_scale=(sspec,) * chunks if quantized_kv else None,
        )
    return PagedKVCache(k=spec, v=spec, kv_scale=sspec)


def shard_paged_cache(mesh: Mesh, cache, replicate_model: bool = False):
    """Place the paged pools on the mesh."""
    from ..kv.paged import PagedKVCache

    chunks = len(cache.k) if isinstance(cache.k, tuple) else 1
    specs = (
        replicated_cache_pspecs(cache.kv_scale is not None, chunks)
        if replicate_model
        else paged_cache_pspecs(cache.kv_scale is not None, chunks)
    )
    put = lambda a, s: None if a is None else jax.device_put(a, NamedSharding(mesh, s))
    tput = lambda a, s: (
        None if a is None
        else tuple(put(ac, sc) for ac, sc in zip(a, s))
        if isinstance(a, tuple) else put(a, s)
    )
    return PagedKVCache(
        k=tput(cache.k, specs.k),
        v=tput(cache.v, specs.v),
        kv_scale=tput(cache.kv_scale, specs.kv_scale),
    )


def paged_tp_forward_fn(
    mesh: Mesh,
    cfg: ModelConfig,
    weights: dict,
    *,
    block_size: int,
    backend: Optional[str] = None,
    compute_dtype=jnp.bfloat16,
    quantized_kv: bool = False,
    with_embeds: bool = False,
    with_rope3: bool = False,  # M-RoPE streams [3, B, T] (qwen-VL family)
    with_deepstack: bool = False,  # [k, B, T, H] qwen3-vl DeepStack rows
    with_lora: bool = False,  # per-request adapter mix [B, T, A]
    replicate_model: bool = False,  # weights/KV-heads replicated (small
    # draft models whose head counts don't divide tp); batch still shards
    # over the data axis
    cache_chunks: int = 1,  # layer-chunked pool (kv/paged.py): tuple fields
    donate_cache: bool = True,  # alias the KV pools through the jit — an
    # un-donated multi-GB pool forces XLA to copy it every step (exactly
    # the failure bench.py's plain path donates against); callers must
    # thread the returned cache and never touch the old one
):
    """Build the jitted multi-chip PAGED forward for the serving engine —
    the composition the reference achieves with Row/ColumnParallelLayer
    driven by the engine loop (`mistralrs-quant/src/distributed/layers.rs:58`
    + `mistralrs-core/src/engine/mod.rs:962`), here as ONE shard_map over the
    (data, model) mesh:

      (weights, ids [B,T], positions [B,T], cache, block_tables [B,W],
       slot_mapping [B,T], kv_lens [B][, input_embeds [B,T,H]])
         → (logits [B,1,V], cache)

    The batch axis shards over `data` (group-major slots, local block ids per
    group); weights and KV heads shard over `model` with psum/all_gather at
    the row-parallel boundaries inside forward_paged."""
    from ..models.llama import forward_paged

    tp = mesh.shape[TP_AXIS]
    if replicate_model:
        tp, ep = 1, False
        lcfg = cfg
        wspecs = jax.tree_util.tree_map(lambda _: P(), weights)
        cspecs = replicated_cache_pspecs(quantized_kv, cache_chunks)
    else:
        ep = expert_parallel(cfg, tp)
        lcfg = local_config(cfg, tp, ep)
        wspecs = weight_pspecs(weights, ep=ep)
        cspecs = paged_cache_pspecs(quantized_kv, cache_chunks)

    def body(w, ids, positions, cache, bt, slot_map, kv_lens, last_idx,
             *extras):
        extras = list(extras)
        emb = extras.pop(0) if with_embeds else None
        rope3 = extras.pop(0) if with_rope3 else None
        ds = extras.pop(0) if with_deepstack else None
        lora = extras.pop(0) if with_lora else None
        return forward_paged(
            w, lcfg, ids, positions, cache, bt, slot_map.reshape(-1), kv_lens,
            block_size=block_size, backend=backend, logits_last_only=True,
            compute_dtype=compute_dtype,
            tp_axis=TP_AXIS if tp > 1 else None, input_embeds=emb,
            last_indices=last_idx, rope_positions3=rope3, deepstack=ds,
            lora_scalings=lora,
        )

    in_specs = [
        wspecs,
        P(DP_AXIS, None),  # ids
        P(DP_AXIS, None),  # positions
        cspecs,
        P(DP_AXIS, None),  # block tables (local ids per group)
        P(DP_AXIS, None),  # slot mapping [B, T] (local ids per group)
        P(DP_AXIS),  # kv_lens
        P(DP_AXIS),  # last_indices (per-row last valid position)
    ]
    if with_embeds:
        in_specs.append(P(DP_AXIS, None, None))
    if with_rope3:
        in_specs.append(P(None, DP_AXIS, None))
    if with_deepstack:
        in_specs.append(P(None, DP_AXIS, None, None))
    if with_lora:
        in_specs.append(P(DP_AXIS, None, None))
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(DP_AXIS, None, None), cspecs),
        check_vma=False,
    )
    # cache is positional arg 3 of body — donating it lets the output pool
    # alias the input pool (no per-step multi-GB copy); ignored on CPU
    return jax.jit(mapped, donate_argnums=(3,) if donate_cache else ())


def paged_tp_decode_chain_fn(
    mesh: Mesh,
    cfg: ModelConfig,
    weights: dict,
    *,
    block_size: int,
    n_steps: int,
    backend: Optional[str] = None,
    compute_dtype=jnp.bfloat16,
    quantized_kv: bool = False,
    cache_chunks: int = 1,
):
    """N greedy decode steps as ONE executable over the mesh: the step loop
    (slot math → fused forward → argmax feedback) runs as a `lax.scan`
    INSIDE the shard_map body, so the whole chain is a single dispatch with
    the KV pools donated through it. This is the full multi-chip analog of
    the reference's captured CUDA decode graph (`pipeline/cuda_graph.rs:666`)
    — and the r5 shard_map ablation (exp/shardmap_ablation_r5.log) shows it
    recovers ~100% of the plain-path throughput: per-step dispatch (~3.3 ms)
    and un-donated pool copies (~2.9 ms) were the entire r4 "shard_map gap";
    the kernels themselves lose nothing inside the mesh.

      (weights, cache, tokens [B], kv_lens [B], block_tables [B, W])
        → (tokens-per-step [n_steps, B], cache)

    kv_lens counts the valid KV BEFORE each step (the step writes its token
    at position kv_lens and attends over kv_lens+1 entries, matching the
    engine's decode convention)."""
    tp = mesh.shape[TP_AXIS]
    ep = expert_parallel(cfg, tp)
    lcfg = local_config(cfg, tp, ep)
    wspecs = weight_pspecs(weights, ep=ep)
    cspecs = paged_cache_pspecs(quantized_kv, cache_chunks)
    from ..models.llama import forward_paged

    def body(w, cache, tokens, kv_lens, bt):
        b = tokens.shape[0]

        def step(carry, _):
            cache, tok, lens = carry
            slots = (
                bt[jnp.arange(b), lens // block_size] * block_size
                + lens % block_size
            ).astype(jnp.int32)
            logits, cache = forward_paged(
                w, lcfg, tok[:, None], lens[:, None], cache, bt,
                slots[:, None].reshape(-1), lens + 1,
                block_size=block_size, backend=backend,
                logits_last_only=True, compute_dtype=compute_dtype,
                tp_axis=TP_AXIS if tp > 1 else None,
            )
            tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (cache, tok, lens + 1), tok

        (cache, _, _), toks = jax.lax.scan(
            step, (cache, tokens, kv_lens), None, length=n_steps
        )
        return toks, cache

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(wspecs, cspecs, P(DP_AXIS), P(DP_AXIS), P(DP_AXIS, None)),
        out_specs=(P(None, DP_AXIS), cspecs),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(1,))


def tp_forward_fn(
    mesh: Mesh,
    cfg: ModelConfig,
    weights: dict,
    *,
    backend: Optional[str] = None,
    logits_last_only: bool = True,
    compute_dtype=jnp.bfloat16,
):
    """Build the jitted multi-chip forward:
    (weights, ids, positions, cache, kv_start) → (logits, cache)."""
    tp = mesh.shape[TP_AXIS]
    ep = expert_parallel(cfg, tp)
    lcfg = local_config(cfg, tp, ep)
    wspecs = weight_pspecs(weights, ep=ep)

    def body(w, ids, positions, cache, kv_start):
        return forward(
            w, lcfg, ids, positions, cache, kv_start,
            backend=backend, logits_last_only=logits_last_only,
            compute_dtype=compute_dtype, tp_axis=TP_AXIS if tp > 1 else None,
        )

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            wspecs,
            P(DP_AXIS, None),  # ids
            P(DP_AXIS, None),  # positions
            cache_pspecs(),
            P(DP_AXIS),  # kv_start
        ),
        out_specs=(P(DP_AXIS, None, None), cache_pspecs()),
        check_vma=False,
    )
    return jax.jit(mapped)
