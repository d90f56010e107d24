"""The serving engine: continuous batching over the paged KV cache.

The analog of `Engine::run` (`mistralrs-core/src/engine/mod.rs:423`) +
`Pipeline::step` (`pipeline/mod.rs:1314`), re-designed for XLA's compilation
model:

* Decode runs with a **fixed slot batch** [max_batch] — one compiled
  executable for the whole serving lifetime (the analog of CUDA-graph
  capture keyed by batch shape, `cuda_graph.rs:666`). Empty slots carry
  dummy tokens whose KV writes are dropped (slot −1).
* Prefill runs per-sequence in bucketed chunk lengths (static shapes,
  cached executables per bucket).
* Block tables are bucketed in width and passed per step; sampling state
  (penalty counts, per-slot params) lives on device and is updated in-graph.
"""

from __future__ import annotations

import functools
import itertools
import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..generate import _freeze
from ..kv.manager import KVCacheManager
from ..kv.paged import PagedKVCache
from ..models.config import ModelConfig
from ..models.llama import forward_paged
from .sampler import (
    BatchSamplingState, SamplingParams, _transformed_probs, dry_penalty_row,
    sample, sample_row, speculative_accept,
)
from .scheduler import Scheduler, SchedulerOutput
from .sequence import Sequence, SequenceState, StopReason

_PREFILL_BUCKETS = (16, 32, 64, 128, 256, 512, 1024)


def _bucket(n: int, buckets=_PREFILL_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


@functools.partial(
    jax.jit, static_argnames=("cfg", "block_size", "backend", "compute_dtype"),
    donate_argnums=(4,),  # cache: callers thread the returned pool; an
    # un-donated multi-GB pool would be copied whole every step
)
def _prefill_fn(weights, cfg, ids, positions, cache, block_tables, slot_map,
                kv_lens, last_indices, block_size, backend, compute_dtype,
                input_embeds=None, rope_pos3=None, lora_scalings=None,
                deepstack=None):
    return forward_paged(
        weights, cfg, ids, positions, cache, block_tables, slot_map, kv_lens,
        block_size=block_size, backend=backend, logits_last_only=True,
        compute_dtype=compute_dtype, input_embeds=input_embeds,
        last_indices=last_indices, rope_positions3=rope_pos3,
        lora_scalings=lora_scalings, deepstack=deepstack,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "block_size", "backend", "compute_dtype"),
    donate_argnums=(4, 8),  # cache + samp_state (both threaded by the caller)
)
def _decode_fn(weights, cfg, tokens, positions, cache, block_tables, slot_map,
               kv_lens, samp_state, key, block_size, backend, compute_dtype,
               rope_pos3=None, lora_scalings=None):
    logits, cache = forward_paged(
        weights, cfg, tokens[:, None], positions[:, None], cache, block_tables,
        slot_map[:, None], kv_lens, block_size=block_size, backend=backend,
        logits_last_only=True, compute_dtype=compute_dtype,
        rope_positions3=rope_pos3, lora_scalings=lora_scalings,
    )
    new_tokens, logprobs, tops, samp_state = sample(logits[:, -1], samp_state, key)
    return new_tokens, logprobs, tops, cache, samp_state


@functools.partial(
    jax.jit, static_argnames=("cfg", "block_size", "backend", "compute_dtype"),
    donate_argnums=(4,),  # cache threaded by the caller
)
def _greedy_step_fn(weights, cfg, tokens, positions, cache, block_tables,
                    slot_map, kv_lens, block_size, backend, compute_dtype):
    """One greedy decode step (speculative draft rollout)."""
    logits, cache = forward_paged(
        weights, cfg, tokens[:, None], positions[:, None], cache, block_tables,
        slot_map[:, None], kv_lens, block_size=block_size, backend=backend,
        logits_last_only=True, compute_dtype=compute_dtype,
    )
    return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), cache


@functools.partial(
    jax.jit, static_argnames=("cfg", "block_size", "backend", "compute_dtype"),
    donate_argnums=(4,),  # cache threaded by the caller
)
def _draft_step_sample_fn(weights, cfg, tokens, positions, cache, block_tables,
                          slot_map, kv_lens, samp_state, key, block_size,
                          backend, compute_dtype):
    """One draft proposal step: sample from the draft's sampler-transformed
    distribution and return it for acceptance (the reference's proposer,
    speculative/proposer.rs; greedy slots reduce to argmax)."""
    logits, cache = forward_paged(
        weights, cfg, tokens[:, None], positions[:, None], cache, block_tables,
        slot_map[:, None], kv_lens, block_size=block_size, backend=backend,
        logits_last_only=True, compute_dtype=compute_dtype,
    )
    probs = _transformed_probs(logits[:, -1], samp_state)
    tok = jax.random.categorical(
        key, jnp.log(jnp.maximum(probs, 1e-20)), axis=-1
    ).astype(jnp.int32)
    return tok, probs, cache


@functools.partial(
    jax.jit, static_argnames=("cfg", "block_size", "backend", "compute_dtype"),
    donate_argnums=(4,),  # cache threaded by the caller
)
def _verify_probs_fn(weights, cfg, ids, positions, cache, block_tables,
                     slot_map, kv_lens, samp_state, block_size, backend,
                     compute_dtype, lora_scalings=None):
    """Target verification: sampler-transformed probs at ALL gamma+1
    positions in one forward (the speculative core — reference
    `speculative/driver.rs` + `verifier.rs`). Per-request LoRA applies to
    the TARGET only — the draft proposes from the base model and the
    acceptance test keeps the committed tokens exactly target-distributed
    (adapter divergence only lowers the acceptance rate; reference composes
    adapters with speculative the same way, speculative/driver.rs:18)."""
    logits, cache = forward_paged(
        weights, cfg, ids, positions, cache, block_tables, slot_map, kv_lens,
        block_size=block_size, backend=backend, logits_last_only=False,
        compute_dtype=compute_dtype, lora_scalings=lora_scalings,
    )
    probs = jnp.stack(
        [
            _transformed_probs(logits[:, j].astype(jnp.float32), samp_state)
            for j in range(logits.shape[1])
        ],
        axis=1,
    )
    return probs, cache


def _samp_state_pspecs(dp_axis):
    """Sampler-state PartitionSpecs: every field is [B]- or [B, V]-leading,
    sharded over the data axis (matches Engine's mesh placement)."""
    from jax.sharding import PartitionSpec as P

    f1, f2 = P(dp_axis), P(dp_axis, None)
    return BatchSamplingState(
        temperature=f1, top_k=f1, top_p=f1, min_p=f1,
        frequency_penalty=f1, presence_penalty=f1, repetition_penalty=f1,
        counts=f2, logit_bias=f2, constraint_bias=f2,
    )


def _tp_model_specs(mesh, cfg, weights, replicate_model, quantized_kv=False):
    """(local_cfg, tp_axis, weight_specs, cache_specs) for running `cfg` on
    the mesh — TP-sharded, or fully replicated over the model axis (small
    draft models whose dims don't divide tp). ``quantized_kv`` must match the
    target cache's layout: a quantized pool carries a packed kv_scale plane
    and the spec pytree must mirror it or shard_map fails at trace time."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.tp import (
        TP_AXIS, expert_parallel, local_config,
        paged_cache_pspecs, replicated_cache_pspecs, weight_pspecs,
    )

    tp = mesh.shape[TP_AXIS]
    if replicate_model or tp == 1:
        wspecs = (
            jax.tree_util.tree_map(lambda _: P(), weights)
            if replicate_model else weight_pspecs(weights)
        )
        return cfg, None, wspecs, (
            replicated_cache_pspecs() if replicate_model
            else paged_cache_pspecs(quantized_kv)
        )
    ep = expert_parallel(cfg, tp)
    return (
        local_config(cfg, tp, ep), TP_AXIS,
        weight_pspecs(weights, ep=ep), paged_cache_pspecs(quantized_kv),
    )


def _draft_tp_step_fn(mesh, cfg, weights, *, block_size, backend,
                      compute_dtype, replicate_model):
    """Mesh variant of `_draft_step_sample_fn` (speculative proposer on a
    TP×DP mesh — the composition the reference reaches with its TP layers
    driven from `speculative/driver.rs` over `distributed/layers.rs:58`).
    The sampling key folds in the data-axis index so dp groups draw
    independent randomness; greedy requests stay identical to one chip."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.tp import DP_AXIS

    lcfg, tp_ax, wspecs, cspecs = _tp_model_specs(
        mesh, cfg, weights, replicate_model
    )
    sspecs = _samp_state_pspecs(DP_AXIS)

    def body(w, tokens, positions, cache, bt, slot_map, kv_lens, samp, key):
        logits, cache = forward_paged(
            w, lcfg, tokens[:, None], positions[:, None], cache, bt,
            slot_map[:, None], kv_lens, block_size=block_size,
            backend=backend, logits_last_only=True,
            compute_dtype=compute_dtype, tp_axis=tp_ax,
        )
        probs = _transformed_probs(logits[:, -1], samp)
        key = jax.random.fold_in(key, jax.lax.axis_index(DP_AXIS))
        tok = jax.random.categorical(
            key, jnp.log(jnp.maximum(probs, 1e-20)), axis=-1
        ).astype(jnp.int32)
        return tok, probs, cache

    b2 = P(DP_AXIS, None)
    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(wspecs, P(DP_AXIS), P(DP_AXIS), cspecs, b2, P(DP_AXIS),
                  P(DP_AXIS), sspecs, P()),
        out_specs=(P(DP_AXIS), b2, cspecs),
        check_vma=False,
    ))


def _verify_tp_fn(mesh, cfg, weights, *, block_size, backend, compute_dtype,
                  n_pos, quantized_kv=False, with_lora=False):
    """Mesh variant of `_verify_probs_fn`: target transformed probs at all
    gamma+1 positions, TP-sharded like the engine's main forward. With an
    attached adapter bank (``with_lora``) the per-slot one-hot scalings ride
    as a trailing [B, γ+1, A] arg, dp-sharded like the token rows."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.tp import DP_AXIS

    lcfg, tp_ax, wspecs, cspecs = _tp_model_specs(
        mesh, cfg, weights, False, quantized_kv
    )
    sspecs = _samp_state_pspecs(DP_AXIS)

    def body(w, ids, positions, cache, bt, slot_map, kv_lens, samp,
             lora_scalings=None):
        logits, cache = forward_paged(
            w, lcfg, ids, positions, cache, bt, slot_map.reshape(-1),
            kv_lens, block_size=block_size, backend=backend,
            logits_last_only=False, compute_dtype=compute_dtype,
            tp_axis=tp_ax, lora_scalings=lora_scalings,
        )
        probs = jnp.stack(
            [
                _transformed_probs(logits[:, j].astype(jnp.float32), samp)
                for j in range(n_pos)
            ],
            axis=1,
        )
        return probs, cache

    b2 = P(DP_AXIS, None)
    in_specs = [wspecs, b2, b2, cspecs, b2, b2, P(DP_AXIS), sspecs]
    if with_lora:
        in_specs.append(P(DP_AXIS, None, None))
    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(DP_AXIS, None, None), cspecs),
        check_vma=False,
    ))


@functools.partial(jax.jit, donate_argnums=(0,))
def _admit_slot(state: BatchSamplingState, slot, scalars, counts_row, bias_row,
                cbias_row):
    (temp, tk, tp, mp, fp, pp, rp) = scalars
    return BatchSamplingState(
        temperature=state.temperature.at[slot].set(temp),
        top_k=state.top_k.at[slot].set(tk),
        top_p=state.top_p.at[slot].set(tp),
        min_p=state.min_p.at[slot].set(mp),
        frequency_penalty=state.frequency_penalty.at[slot].set(fp),
        presence_penalty=state.presence_penalty.at[slot].set(pp),
        repetition_penalty=state.repetition_penalty.at[slot].set(rp),
        counts=state.counts.at[slot].set(counts_row),
        logit_bias=state.logit_bias.at[slot].set(bias_row),
        constraint_bias=state.constraint_bias.at[slot].set(cbias_row),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def _set_constraint_bias(state: BatchSamplingState, slot, cbias_row):
    import dataclasses

    return dataclasses.replace(
        state, constraint_bias=state.constraint_bias.at[slot].set(cbias_row)
    )


class Engine:
    """Single-model serving engine (synchronous step loop; the async server
    drives it from an executor thread)."""

    def __init__(
        self,
        cfg: ModelConfig,
        weights: dict,
        *,
        num_blocks: int = 512,
        block_size: int = 16,
        max_batch: int = 8,
        max_model_len: Optional[int] = None,
        prefill_chunk: int = 512,
        backend: Optional[str] = None,
        compute_dtype=jnp.bfloat16,
        kv_quant: Optional[str] = None,
        enable_prefix_caching: bool = True,
        tokenizer=None,
        seed: int = 0,
        draft: Optional[tuple[ModelConfig, dict]] = None,  # speculative pair
        gamma: int = 4,  # draft tokens per verification step
        mesh=None,  # jax.sharding.Mesh (data, model): TP×DP sharded serving
        adapter=None,  # arch adapter (engine/adapters.py): MLA/GDN/hybrid
    ):
        self.adapter = adapter
        if adapter is not None:
            # composition matrix (reference pairs speculative with ANY
            # pipeline, speculative/driver.rs:18, and quantizes any paged
            # cache): adapters opt in per capability
            if draft is not None and not hasattr(adapter, "verify"):
                raise NotImplementedError(
                    f"{type(adapter).__name__} does not support speculative "
                    "verification"
                )
            if kv_quant is not None and not getattr(
                adapter, "supports_kv_quant", False
            ):
                raise NotImplementedError(
                    f"{type(adapter).__name__} does not support quantized KV"
                )
            if mesh is not None:
                if not hasattr(adapter, "shard"):
                    raise NotImplementedError(
                        f"{type(adapter).__name__} does not support mesh serving"
                    )
                adapter.shard(mesh)  # TP over the model axis (dp=1)
            if not adapter.supports_prefix_cache:
                enable_prefix_caching = False
        self.cfg = cfg
        self._fcfg = _freeze(cfg)
        self.block_size = block_size
        self.max_batch = max_batch
        self.max_model_len = max_model_len or cfg.max_position_embeddings
        self.backend = backend
        self.compute_dtype = compute_dtype
        self.tokenizer = tokenizer
        # -- mesh-sharded serving (the analog of the reference's TP engine:
        # Row/ColumnParallel layers driven by the engine loop,
        # distributed/layers.rs:58 + engine/mod.rs:962) ---------------------
        self.mrope = bool(getattr(cfg, "mrope_section", ()))
        self.mesh = mesh
        self.dp = 1
        if mesh is not None:
            from ..parallel.tp import DP_AXIS as _DPA

            # dp groups apply to adapter engines too (group-major slots,
            # group-local block ids, dp-sharded slot pools)
            self.dp = int(mesh.shape.get(_DPA, 1))
            if max_batch % self.dp:
                raise ValueError(
                    f"max_batch {max_batch} not divisible by dp={self.dp}"
                )
            if self.dp > 1 and adapter is not None and not getattr(
                adapter, "supports_dp", False
            ):
                raise NotImplementedError(
                    f"{type(adapter).__name__} does not group-partition its "
                    f"state pools: dp={self.dp} needs supports_dp"
                )
        self._tp_fwds: dict = {}  # (embeds, rope3, deepstack, lora) → jitted
        self._kv_quant = kv_quant
        self.lora_names = tuple(weights.pop("lora_names", ()))
        if mesh is not None and adapter is None:
            from ..parallel.tp import (
                DP_AXIS, TP_AXIS, shard_weights,
            )

            tp = int(mesh.shape.get(TP_AXIS, 1))
            self.dp = int(mesh.shape.get(DP_AXIS, 1))
            if tp > 1 and (
                cfg.num_heads % tp or cfg.num_kv_heads % tp
                or cfg.intermediate_size % tp
            ):
                raise ValueError(f"tp={tp} does not divide model dims")
            if max_batch % self.dp:
                raise ValueError(f"max_batch {max_batch} not divisible by dp={self.dp}")
            from ..parallel.tp import expert_parallel, weight_pspecs

            weights = shard_weights(
                mesh, weights,
                specs=weight_pspecs(weights, ep=expert_parallel(cfg, tp)),
            )
        self.weights = weights
        if self.dp > 1:
            from ..kv.manager import GroupedKVManager

            self.kv = GroupedKVManager(
                self.dp, num_blocks, block_size, enable_prefix_caching
            )
        else:
            self.kv = KVCacheManager(num_blocks, block_size, enable_prefix_caching)
        self.scheduler = Scheduler(self.kv, max_batch, prefill_chunk,
                                   groups=self.dp)
        self.scheduler.on_preempt = self._extend_prompt_embeds
        if adapter is not None:
            if kv_quant is not None:
                self.cache = adapter.create_cache(
                    num_blocks, block_size, max_batch, kv_quant=kv_quant)
            else:
                self.cache = adapter.create_cache(
                    num_blocks, block_size, max_batch)
        else:
            from ..kv.paged import auto_head_dim_pad

            from ..parallel.tp import TP_AXIS as _TP

            self.cache = PagedKVCache.create(
                cfg, num_blocks, block_size, dtype=compute_dtype,
                kv_quant=kv_quant, groups=self.dp,
                tp_shards=int(mesh.shape.get(_TP, 1)) if mesh is not None else 1,
                head_dim_pad=auto_head_dim_pad(cfg.head_dim, backend),
            )
        if mesh is not None and adapter is None:
            from ..parallel.tp import shard_paged_cache

            self.cache = shard_paged_cache(mesh, self.cache)
        # speculative decoding (reference `speculative/`): a draft model
        # shares the block tables (identical token positions) with its own
        # KV pools; greedy-exact acceptance
        self.draft_cfg: Optional[ModelConfig] = None
        self.draft_weights: Optional[dict] = None
        self.gamma = gamma
        self._draft_replicated = False
        self._tp_draft_step = self._tp_verify = self._tp_draft_prefill = None
        if draft is not None:
            self.draft_cfg, self.draft_weights = draft
            self._dfcfg = _freeze(self.draft_cfg)
            from ..kv.paged import auto_head_dim_pad as _ahdp

            self.draft_cache = PagedKVCache.create(
                self.draft_cfg, num_blocks, block_size, dtype=compute_dtype,
                groups=self.dp,
                head_dim_pad=_ahdp(self.draft_cfg.head_dim, backend),
            )
            if mesh is not None:
                # draft shards like the target when its dims divide tp,
                # otherwise replicates over the model axis (it's small)
                from ..parallel.tp import (
                    TP_AXIS, shard_paged_cache, shard_weights, weight_pspecs,
                )

                dtp = int(mesh.shape.get(TP_AXIS, 1))
                dcfg = self.draft_cfg
                # fused QKV/gate-up can't column-shard (concatenated N
                # interleaves across shards) → replicate those too
                self._draft_replicated = dtp > 1 and bool(
                    dcfg.num_heads % dtp or dcfg.num_kv_heads % dtp
                    or dcfg.intermediate_size % dtp
                    or "wq" not in self.draft_weights["layers"]
                )
                from jax.sharding import PartitionSpec as _P

                dspecs = (
                    jax.tree_util.tree_map(lambda _: _P(), self.draft_weights)
                    if self._draft_replicated
                    else weight_pspecs(self.draft_weights)
                )
                self.draft_weights = shard_weights(
                    mesh, self.draft_weights, specs=dspecs
                )
                self.draft_cache = shard_paged_cache(
                    mesh, self.draft_cache,
                    replicate_model=self._draft_replicated,
                )
            # decode rounds commit up to gamma+1 tokens → allocate ahead
            self.scheduler.lookahead = gamma + 1
        self.samp_state = BatchSamplingState(
            temperature=jnp.zeros((max_batch,), jnp.float32),
            top_k=jnp.zeros((max_batch,), jnp.int32),
            top_p=jnp.ones((max_batch,), jnp.float32),
            min_p=jnp.zeros((max_batch,), jnp.float32),
            frequency_penalty=jnp.zeros((max_batch,), jnp.float32),
            presence_penalty=jnp.zeros((max_batch,), jnp.float32),
            repetition_penalty=jnp.ones((max_batch,), jnp.float32),
            counts=jnp.zeros((max_batch, cfg.vocab_size), jnp.int32),
            logit_bias=jnp.zeros((max_batch, cfg.vocab_size), jnp.float32),
            constraint_bias=jnp.zeros((max_batch, cfg.vocab_size), jnp.float32),
        )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.tp import DP_AXIS

            def _put(a):
                spec = P(DP_AXIS) if a.ndim == 1 else P(DP_AXIS, None)
                return jax.device_put(a, NamedSharding(mesh, spec))

            self.samp_state = jax.tree_util.tree_map(_put, self.samp_state)
        self._key = jax.random.PRNGKey(seed)
        self._req_counter = itertools.count()
        self._slot_seq: list[Optional[Sequence]] = [None] * max_batch
        # grammar constraints: per-slot (recognizer, state); mask table lazily
        self._slot_constraint: list = [None] * max_batch
        self._mask_builder = None
        # stats (the analog of engine/logger.rs IntervalLogger)
        self.stats = {
            "prompt_tokens": 0, "generated_tokens": 0, "preemptions": 0,
            "prefix_cache_hit_tokens": 0, "steps": 0,
        }

    def _tp_forward(self, embeds=None, rope3=None, deepstack=None, lora=None):
        """Lazily built mesh forward variant (the optional-input combos are
        separate shard_map jits; the common text decode uses the bare one)."""
        key = (embeds is not None, rope3 is not None, deepstack is not None,
               lora is not None)
        fn = self._tp_fwds.get(key)
        if fn is None:
            from ..parallel.tp import paged_tp_forward_fn

            fn = self._tp_fwds[key] = paged_tp_forward_fn(
                self.mesh, self.cfg, self.weights, block_size=self.block_size,
                backend=self.backend, compute_dtype=self.compute_dtype,
                quantized_kv=self._kv_quant is not None,
                with_embeds=key[0], with_rope3=key[1], with_deepstack=key[2],
                with_lora=key[3],
                cache_chunks=(
                    len(self.cache.k) if isinstance(self.cache.k, tuple) else 1
                ),
            )
        return fn

    # -- request lifecycle ---------------------------------------------------

    def add_request(
        self,
        prompt_ids: list[int],
        params: Optional[SamplingParams] = None,
        request_id: Optional[str] = None,
        on_tokens=None,
        priority: int = 0,
        prompt_embeds=None,  # [T, H]: precomputed merged embeddings (VLM)
        mrope_positions=None,  # [3, T] np: M-RoPE streams (qwen2-vl family)
        adapter_state=None,  # arch-adapter per-request state (mllama cross K/V)
        lora=None,  # adapter name from the attached bank (per-request LoRA)
        deepstack_embeds=None,  # [T, k, H] np: qwen3-vl DeepStack rows
        # (zeros at text positions; layer k's slice adds after decoder
        # layer k during prefill)
    ) -> Sequence:
        params = params or SamplingParams()
        if len(prompt_ids) >= self.max_model_len:
            raise ValueError(
                f"prompt length {len(prompt_ids)} ≥ max_model_len {self.max_model_len}"
            )
        if self.draft_cfg is not None:
            # acceptance sampling covers temperature/top-k/top-p/min-p (and
            # greedy as the one-hot special case); penalties/constraints
            # would change the target distribution mid-rollout
            if (params.constraint is not None
                    or params.logit_bias or params.n_logprobs
                    or params.frequency_penalty or params.presence_penalty
                    or params.repetition_penalty != 1.0
                    or params.dry_multiplier > 0.0
                    or prompt_embeds is not None):
                raise ValueError(
                    "speculative engine: no penalties/constraints/logprobs/"
                    "multimodal (sampling via acceptance is supported)"
                )
        seq = Sequence(
            request_id=request_id or f"req-{next(self._req_counter)}",
            prompt_ids=list(prompt_ids),
            params=params,
            on_tokens=on_tokens,
            priority=priority,
        )
        if prompt_embeds is not None:
            seq.prompt_embeds = prompt_embeds  # type: ignore[attr-defined]
            # multimodal prompts repeat identical placeholder token ids, so
            # block hashes MUST chain a content digest or two requests with
            # different images collide in the prefix cache (the analog of the
            # reference's media-hash chaining, block_hash.rs)
            import hashlib

            digest = hashlib.blake2b(
                np.asarray(prompt_embeds).tobytes(), digest_size=8
            ).hexdigest()
            seq.extra_hash = (digest,)
        if adapter_state is not None:
            if self.adapter is None or not hasattr(self.adapter, "admit"):
                raise ValueError("adapter_state needs an admitting adapter")
            seq.adapter_state = adapter_state  # type: ignore[attr-defined]
        if lora is not None:
            if lora not in self.lora_names:
                raise ValueError(
                    f"unknown adapter {lora!r}; attached: {list(self.lora_names)}"
                )
            if self.adapter is not None and not getattr(
                self.adapter, "supports_lora", False
            ):
                raise NotImplementedError(
                    f"per-request LoRA on {type(self.adapter).__name__}"
                )
            seq.lora_name = lora  # type: ignore[attr-defined]
        if deepstack_embeds is not None:
            ds = np.asarray(deepstack_embeds)
            if ds.ndim != 3 or ds.shape[0] != len(prompt_ids):
                raise ValueError(
                    f"deepstack_embeds shape {ds.shape} != (T, k, H)"
                )
            seq.deepstack_embeds = ds  # type: ignore[attr-defined]
        if mrope_positions is not None:
            mp = np.asarray(mrope_positions, np.int32)
            if mp.shape != (3, len(prompt_ids)):
                raise ValueError(f"mrope_positions shape {mp.shape} != (3, T)")
            seq.mrope_positions = mp  # type: ignore[attr-defined]
            # decode positions: all 3 streams advance together from
            # max(prompt streams) + 1 — a per-sequence offset vs the token
            # index (vLLM's mrope_position_delta)
            seq.rope_delta = int(mp.max()) + 1 - len(prompt_ids)  # type: ignore[attr-defined]
        self.scheduler.add(seq)
        return seq

    def abort(self, request_id: str) -> Optional[Sequence]:
        seq = self.scheduler.abort(request_id)
        if seq is not None and seq.slot is not None:
            self._slot_seq[seq.slot] = None
        return seq

    # -- stepping ------------------------------------------------------------

    @property
    def has_work(self) -> bool:
        return self.scheduler.has_work

    def step(self) -> list[Sequence]:
        """Run one engine step. Returns sequences that finished this step.

        Forward errors are contained per-request (the analog of the
        reference's `handle_pipeline_forward_error!`): the offending
        sequence(s) finish with ERROR and the engine loop stays alive.
        Set ``MRSTPU_STEP_TIMING=1`` for a per-step timing line (the analog
        of the reference's is_debug step log, engine/mod.rs:693-718)."""
        import os as _os

        _timing = bool(_os.environ.get("MRSTPU_STEP_TIMING"))
        t_sched0 = time.monotonic()
        out = self.scheduler.schedule()
        t_sched = time.monotonic() - t_sched0
        self.stats["steps"] += 1
        self.stats["preemptions"] = self.scheduler.num_preemptions
        # clear slot-table entries of sequences the scheduler evicted —
        # _preempt nulls seq.slot before we see it, so sweep by membership
        live = {id(s) for s in self.scheduler.running}
        for i, s in enumerate(self._slot_seq):
            if s is not None and id(s) not in live:
                self._slot_seq[i] = None
        if out.is_empty:
            return []
        finished: list[Sequence] = []
        # decode first (latency path), then this step's prompt chunks — one
        # long prompt no longer stalls the decode batch (mixed steps, the
        # analog of `default_scheduler.rs:201`)
        if out.decode:
            t0 = time.monotonic()
            try:
                finished.extend(self._run_decode(out.decode))
            except Exception as e:  # noqa: BLE001
                self._fail_sequences(out.decode, e)
                finished.extend(out.decode)
            self.stats["decode_steps"] = self.stats.get("decode_steps", 0) + 1
            self.stats["decode_time_s"] = (
                self.stats.get("decode_time_s", 0.0) + time.monotonic() - t0
            )
        if out.prefills:
            t0 = time.monotonic()
            try:
                finished.extend(self._run_prefill_batch(out.prefills))
            except Exception as e:  # noqa: BLE001
                seqs = [sp.seq for sp in out.prefills]
                self._fail_sequences(seqs, e)
                finished.extend(seqs)
            self.stats["prefill_steps"] = self.stats.get("prefill_steps", 0) + 1
            self.stats["prefill_time_s"] = (
                self.stats.get("prefill_time_s", 0.0) + time.monotonic() - t0
            )
        if _timing:
            dt_total = time.monotonic() - t_sched0
            n_pf_tok = sum(sp.length for sp in out.prefills)
            print(
                f"[step {self.stats['steps']}] total {dt_total * 1e3:.2f} ms "
                f"(schedule {t_sched * 1e3:.2f} ms) | "
                f"decode bs={len(out.decode)} | "
                f"prefill rows={len(out.prefills)} tok={n_pf_tok} | "
                f"running={len(self.scheduler.running)} "
                f"waiting={len(self.scheduler.waiting)}",
                flush=True,
            )
        return finished

    def _fail_sequences(self, seqs: list[Sequence], err: Exception) -> None:
        import traceback

        traceback.print_exc()
        self.stats["forward_errors"] = self.stats.get("forward_errors", 0) + 1
        for seq in seqs:
            seq.error = f"{type(err).__name__}: {err}"  # type: ignore[attr-defined]
            seq.finish(StopReason.ERROR)
            if seq.slot is not None:
                self._slot_seq[seq.slot] = None
            self.scheduler.release(seq)
            if seq.on_tokens is not None:
                try:
                    seq.on_tokens([], True)
                except Exception:  # noqa: BLE001
                    pass

    def run_to_completion(self) -> list[Sequence]:
        """Drain all queued work (batch/offline mode)."""
        finished = []
        while self.has_work:
            finished.extend(self.step())
        return finished

    # -- internals -----------------------------------------------------------

    def _max_blocks_bucket(self) -> int:
        hard_max = -(-self.max_model_len // self.block_size)
        longest = 1
        for s in self.scheduler.running:
            longest = max(longest, len(self.kv.block_table(s.request_id)))
        b = 32
        while b < longest:
            b *= 2
        return min(b, hard_max) if hard_max >= 32 else hard_max

    def _block_table_array(self, seqs: list[Sequence], width: int) -> np.ndarray:
        bt = np.zeros((len(seqs), width), np.int32)
        for i, s in enumerate(seqs):
            ids = self.kv.block_table(s.request_id)[:width]
            bt[i, : len(ids)] = ids
        return bt

    def _embed_rows(self, ids: list[int]) -> jax.Array:
        """Embedding-table rows (with arch multipliers) for text tokens."""
        from ..quant.linear import embedding_lookup

        rows = embedding_lookup(
            jnp.asarray(ids, jnp.int32), self.weights["embed"],
            dtype=self.compute_dtype,
        )
        if getattr(self.cfg, "arch", "").startswith("gemma"):
            rows = rows * jnp.asarray(
                getattr(self.cfg, "embedding_multiplier", None) or self.cfg.hidden_size**0.5,
                rows.dtype,
            )
        elif getattr(self.cfg, "embedding_multiplier", None):
            rows = rows * jnp.asarray(self.cfg.embedding_multiplier, rows.dtype)
        return rows


    def _lora_scalings_rows(self, seqs_by_row, rows: int, t: int):
        """One-hot adapter mix per row ([rows, t, A]) or None when no bank
        is attached (per-request selection, adapter/selection.rs analog)."""
        if not self.lora_names:
            return None
        a = len(self.lora_names)
        idx = {n: i for i, n in enumerate(self.lora_names)}
        out = np.zeros((rows, 1, a), np.float32)
        for row, seq in seqs_by_row.items():
            name = getattr(seq, "lora_name", None)
            if name is not None:
                out[row, 0, idx[name]] = 1.0
        return jnp.asarray(np.broadcast_to(out, (rows, t, a)))

    def _run_prefill_batch(self, sps) -> list[Sequence]:
        """Run this step's prompt chunks as ONE batched forward.

        Row layout is group-major: rows [g*r, (g+1)*r) belong to DP group g
        (r = bucketed chunks-per-group); under SPMD every shard runs the same
        program and rows outside its group write to the trash slot. Each
        sequence finishing its prompt samples its first token directly from
        the prefill logits at the true last position — no bootstrap decode
        step (the reference samples prompt-final logits in the same way)."""
        per_group: list[list] = [[] for _ in range(self.dp)]
        for sp in sps:
            per_group[self.kv.group_of(sp.seq.request_id)].append(sp)
        r = 1
        while r < max(len(pg) for pg in per_group):
            r *= 2
        rows = self.dp * r
        t = _bucket(max(sp.length for sp in sps))
        ids_arr = np.zeros((rows, t), np.int32)
        positions = np.zeros((rows, t), np.int32)
        slot_map = np.full((rows, t), -1, np.int64)
        kv_lens = np.ones((rows,), np.int32)
        last_idx = np.zeros((rows,), np.int32)
        width = self._max_blocks_bucket()
        for sp in sps:
            need = len(self.kv.block_table(sp.seq.request_id))
            while width < need:
                width *= 2
        bt = np.zeros((rows, width), np.int32)
        row_sp: dict[int, object] = {}
        for g, pg in enumerate(per_group):
            for i, sp in enumerate(pg):
                row = g * r + i
                row_sp[row] = sp
                seq = sp.seq
                ids_arr[row, : sp.length] = seq.prompt_ids[
                    sp.start : sp.start + sp.length
                ]
                positions[row, : sp.length] = np.arange(
                    sp.start, sp.start + sp.length
                )
                slot_map[row, : sp.length] = self.kv.slot_mapping(
                    seq.request_id, sp.start, sp.length
                )
                table = self.kv.block_table(seq.request_id)[:width]
                bt[row, : len(table)] = table
                kv_lens[row] = sp.start + sp.length
                last_idx[row] = sp.length - 1
        rope_pos3 = None
        if self.mrope:
            # text rows: all 3 streams = token index (mrope ≡ standard rope);
            # multimodal rows carry their grid streams
            p3 = np.broadcast_to(positions, (3,) + positions.shape).copy()
            for row, sp in row_sp.items():
                mp = getattr(sp.seq, "mrope_positions", None)
                if mp is not None:
                    p3[:, row, : sp.length] = mp[:, sp.start : sp.start + sp.length]
            rope_pos3 = jnp.asarray(p3)
        embeds = None
        if any(
            getattr(sp.seq, "prompt_embeds", None) is not None for sp in sps
        ):
            h = self.cfg.hidden_size
            embeds = jnp.zeros((rows, t, h), self.compute_dtype)
            for row, sp in row_sp.items():
                pe = getattr(sp.seq, "prompt_embeds", None)
                if pe is None:  # text rows of a mixed batch
                    pe_rows = self._embed_rows(
                        sp.seq.prompt_ids[sp.start : sp.start + sp.length]
                    )
                else:
                    pe_rows = pe[sp.start : sp.start + sp.length]
                embeds = embeds.at[row, : sp.length].set(
                    pe_rows.astype(self.compute_dtype)
                )
        deepstack = None
        if any(
            getattr(sp.seq, "deepstack_embeds", None) is not None for sp in sps
        ):
            n_ds = max(
                getattr(sp.seq, "deepstack_embeds", np.zeros((0, 0, 0))).shape[1]
                for sp in sps
            )
            deepstack = np.zeros(
                (n_ds, rows, t, self.cfg.hidden_size), np.float32
            )
            for row, sp in row_sp.items():
                dse = getattr(sp.seq, "deepstack_embeds", None)
                if dse is not None:
                    deepstack[:, row, : sp.length] = dse[
                        sp.start : sp.start + sp.length
                    ].transpose(1, 0, 2)
            deepstack = jnp.asarray(deepstack, self.compute_dtype)
        if self.adapter is not None:
            slot_ids = np.full((rows,), -1, np.int32)
            resets = np.zeros((rows,), np.int32)
            for row, sp in row_sp.items():
                slot_ids[row] = sp.seq.slot
                resets[row] = 1 if sp.start == 0 else 0
                if sp.start == 0 and hasattr(self.adapter, "admit"):
                    # per-request adapter state (mllama cross K/V) installs
                    # at the claimed slot; text-only requests clear any
                    # stale state left by a prior occupant
                    st = getattr(sp.seq, "adapter_state", None)
                    if st is not None:
                        self.cache = self.adapter.admit(
                            self.cache, sp.seq.slot, st
                        )
                    elif hasattr(self.adapter, "release"):
                        self.cache = self.adapter.release(
                            self.cache, sp.seq.slot
                        )
            pf_kwargs = {}
            if rope_pos3 is not None:
                pf_kwargs["rope_pos3"] = rope_pos3
            if deepstack is not None:
                pf_kwargs["deepstack"] = deepstack
            if self.lora_names and getattr(self.adapter, "supports_lora", False):
                pf_kwargs["lora_scalings"] = self._lora_scalings_rows(
                    {r_: sp.seq for r_, sp in row_sp.items()}, rows, t
                )
            logits, self.cache = self.adapter.prefill(
                self.cache, jnp.asarray(ids_arr), jnp.asarray(positions),
                jnp.asarray(bt), jnp.asarray(slot_map, jnp.int32),
                jnp.asarray(kv_lens), jnp.asarray(last_idx),
                jnp.asarray(slot_ids), jnp.asarray(resets), embeds,
                **pf_kwargs,
            )
        elif self.mesh is not None:
            lora_rows = self._lora_scalings_rows(
                {r_: sp.seq for r_, sp in row_sp.items()}, rows, t
            )
            fwd_args = [
                self.weights, jnp.asarray(ids_arr), jnp.asarray(positions),
                self.cache, jnp.asarray(bt), jnp.asarray(slot_map, jnp.int32),
                jnp.asarray(kv_lens), jnp.asarray(last_idx),
            ]
            for extra in (embeds, rope_pos3, deepstack, lora_rows):
                if extra is not None:
                    fwd_args.append(extra)
            fn = self._tp_forward(embeds, rope_pos3, deepstack, lora_rows)
            logits, self.cache = fn(*fwd_args)
        else:
            logits, self.cache = _prefill_fn(
                self.weights, self._fcfg, jnp.asarray(ids_arr),
                jnp.asarray(positions), self.cache, jnp.asarray(bt),
                jnp.asarray(slot_map, jnp.int32), jnp.asarray(kv_lens),
                jnp.asarray(last_idx), self.block_size, self.backend,
                self.compute_dtype, input_embeds=embeds, rope_pos3=rope_pos3,
                lora_scalings=self._lora_scalings_rows(
                    {r: sp.seq for r, sp in row_sp.items()}, rows, t
                ),
                deepstack=deepstack,
            )
        if self.draft_cfg is not None:
            if self.mesh is not None:
                if self._tp_draft_prefill is None:
                    from ..parallel.tp import paged_tp_forward_fn

                    self._tp_draft_prefill = paged_tp_forward_fn(
                        self.mesh, self.draft_cfg, self.draft_weights,
                        block_size=self.block_size, backend=self.backend,
                        compute_dtype=self.compute_dtype,
                        replicate_model=self._draft_replicated,
                    )
                _, self.draft_cache = self._tp_draft_prefill(
                    self.draft_weights, jnp.asarray(ids_arr),
                    jnp.asarray(positions), self.draft_cache,
                    jnp.asarray(bt), jnp.asarray(slot_map, jnp.int32),
                    jnp.asarray(kv_lens), jnp.asarray(last_idx),
                )
            else:
                _, self.draft_cache = _prefill_fn(
                    self.draft_weights, self._dfcfg, jnp.asarray(ids_arr),
                    jnp.asarray(positions), self.draft_cache, jnp.asarray(bt),
                    jnp.asarray(slot_map, jnp.int32), jnp.asarray(kv_lens),
                    jnp.asarray(last_idx), self.block_size, self.backend,
                    self.compute_dtype,
                )
        finished: list[Sequence] = []
        for row, sp in sorted(row_sp.items()):
            seq = sp.seq
            self.stats["prompt_tokens"] += sp.length
            self.stats["prefix_cache_hit_tokens"] += sp.cached
            self.kv.publish_full_blocks(seq.request_id, sp.start + sp.length)
            if sp.start + sp.length >= seq.prompt_len:
                if self._admit_and_sample_first(seq, logits[row, 0]):
                    finished.append(seq)
        return finished

    def _admit_and_sample_first(self, seq: Sequence, logits_row) -> bool:
        """Install the finished prompt's slot state and sample its first
        token from the prefill logits. Returns True if the sequence finished
        on that token."""
        slot = seq.slot
        self._slot_seq[slot] = seq
        counts = np.zeros((self.cfg.vocab_size,), np.int32)
        uniq, c = np.unique(np.asarray(seq.prompt_ids, np.int64), return_counts=True)
        # special tokens can live beyond the LM-head vocab (mllama's image
        # token is in the embedding's +8 extra rows) — they're unsampleable,
        # so they don't participate in penalties
        in_vocab = uniq < self.cfg.vocab_size
        counts[uniq[in_vocab]] = c[in_vocab]
        bias = np.zeros((self.cfg.vocab_size,), np.float32)
        for tok, val in seq.params.logit_bias.items():
            if 0 <= tok < self.cfg.vocab_size:
                bias[tok] = val
        p = seq.params
        cbias = np.zeros((self.cfg.vocab_size,), np.float32)
        cons = self._resolve_constraint(p.constraint)
        if cons is not None:
            builder = self._get_mask_builder()
            st0 = cons.initial()
            self._slot_constraint[slot] = (cons, st0)
            allow = builder.mask(cons, st0, self.cfg.eos_token_ids)
            cbias = np.where(allow, 0.0, -1e30).astype(np.float32)
        else:
            self._slot_constraint[slot] = None
        if p.dry_multiplier > 0.0:
            dry = dry_penalty_row(list(seq.prompt_ids), p, self.cfg.vocab_size)
            if dry is not None:
                cbias = cbias + dry
        scalars = tuple(
            jnp.asarray(v, jnp.float32 if i != 1 else jnp.int32)
            for i, v in enumerate(
                (p.temperature, p.top_k, p.top_p, p.min_p,
                 p.frequency_penalty, p.presence_penalty, p.repetition_penalty)
            )
        )
        self.samp_state = _admit_slot(
            self.samp_state, slot, scalars, jnp.asarray(counts),
            jnp.asarray(bias), jnp.asarray(cbias),
        )
        self._key, sub = jax.random.split(self._key)
        toks, logprobs, tops, self.samp_state = sample_row(
            logits_row, slot, self.samp_state, sub
        )
        seq.first_token_time = time.monotonic()
        tok = int(np.asarray(toks)[slot])
        lp = float(np.asarray(logprobs)[slot])
        top_vals = np.asarray(tops[0])[slot]
        top_ids = np.asarray(tops[1])[slot]
        return self._commit_token(seq, tok, lp, top_vals, top_ids)

    def _run_decode_spec(self, seqs: list[Sequence]) -> list[Sequence]:
        """Speculative decode round with acceptance sampling: the draft
        proposes gamma tokens from its sampler-transformed distribution, the
        target scores all gamma+1 positions in ONE forward, and each draft
        is accepted with prob min(1, p/q) — the first rejection resamples
        from the residual max(p−q, 0); greedy requests reduce exactly to
        token matching (+1 bonus token). Lossless: committed tokens follow
        the target distribution (reference speculative/verifier.rs). Stale
        KV beyond the committed length is overwritten as later rounds reach
        it."""
        b, g = self.max_batch, self.gamma
        base_tok = np.zeros((b,), np.int32)
        base_pos = np.zeros((b,), np.int32)
        width = self._max_blocks_bucket()
        bt = np.zeros((b, width), np.int32)
        active = [None] * b
        for seq in seqs:
            s = seq.slot
            active[s] = seq
            base_tok[s] = seq.all_ids[-1]
            base_pos[s] = seq.total_len - 1
            table = self.kv.block_table(seq.request_id)[:width]
            bt[s, : len(table)] = table

        def slots_at(offset: int) -> np.ndarray:
            sm = np.full((b,), -1, np.int64)
            for seq in seqs:
                s = seq.slot
                sm[s] = self.kv.slot_mapping(
                    seq.request_id, int(base_pos[s]) + offset, 1
                )[0]
            return sm

        bt_j = jnp.asarray(bt)
        # draft rollout: g+1 sampled steps (the extra step back-fills the KV
        # of the last drafted token for the next round); each step keeps the
        # draft's transformed distribution for acceptance
        drafts_dev = []
        q_rows = []
        cur_tok = jnp.asarray(base_tok)
        if self.mesh is not None and self._tp_draft_step is None:
            self._tp_draft_step = _draft_tp_step_fn(
                self.mesh, self.draft_cfg, self.draft_weights,
                block_size=self.block_size, backend=self.backend,
                compute_dtype=self.compute_dtype,
                replicate_model=self._draft_replicated,
            )
            if self.adapter is None:  # adapters bring their own mesh verify
                self._tp_verify = _verify_tp_fn(
                    self.mesh, self.cfg, self.weights,
                    block_size=self.block_size, backend=self.backend,
                    compute_dtype=self.compute_dtype, n_pos=g + 1,
                    quantized_kv=self._kv_quant is not None,
                    with_lora=bool(self.lora_names),
                )
        for j in range(g + 1):
            pos_j = jnp.asarray(base_pos + j)
            kv_j = jnp.asarray(base_pos + j + 1)
            self._key, sub = jax.random.split(self._key)
            if self.mesh is not None:
                cur_tok, probs, self.draft_cache = self._tp_draft_step(
                    self.draft_weights, cur_tok, pos_j, self.draft_cache,
                    bt_j, jnp.asarray(slots_at(j), jnp.int32), kv_j,
                    self.samp_state, sub,
                )
            else:
                cur_tok, probs, self.draft_cache = _draft_step_sample_fn(
                    self.draft_weights, self._dfcfg, cur_tok, pos_j,
                    self.draft_cache, bt_j,
                    jnp.asarray(slots_at(j), jnp.int32),
                    kv_j, self.samp_state, sub,
                    self.block_size, self.backend, self.compute_dtype,
                )
            if j < g:
                drafts_dev.append(cur_tok)
                q_rows.append(probs)
        drafts_j = jnp.stack(drafts_dev, axis=1)  # [B, g]
        drafts = np.asarray(drafts_j)

        # target verification over [base_tok, drafts...]
        ids = np.concatenate([base_tok[:, None], drafts], axis=1)  # [B, g+1]
        positions = base_pos[:, None] + np.arange(g + 1)[None, :]
        slot_map = np.stack([slots_at(j) for j in range(g + 1)], axis=1)
        lora_rows = self._lora_scalings_rows(
            {seq.slot: seq for seq in seqs}, b, g + 1
        )
        verify_aux = None
        if self.adapter is not None:
            slot_ids = jnp.asarray(
                [s if active[s] is not None else -1 for s in range(b)],
                jnp.int32,
            )
            ver_kwargs = {}
            if self.lora_names and getattr(self.adapter, "supports_lora", False):
                ver_kwargs["lora_scalings"] = lora_rows
            p_probs, self.cache, verify_aux = self.adapter.verify(
                self.cache, jnp.asarray(ids),
                jnp.asarray(positions, jnp.int32), jnp.asarray(bt),
                jnp.asarray(slot_map, jnp.int32),
                jnp.asarray(base_pos + g + 1), self.samp_state,
                slot_ids, **ver_kwargs,
            )
        elif self.mesh is not None:
            verify_args = [
                self.weights, jnp.asarray(ids),
                jnp.asarray(positions, jnp.int32), self.cache, bt_j,
                jnp.asarray(slot_map, jnp.int32),
                jnp.asarray(base_pos + g + 1), self.samp_state,
            ]
            if lora_rows is not None:
                verify_args.append(lora_rows)
            p_probs, self.cache = self._tp_verify(*verify_args)
        else:
            p_probs, self.cache = _verify_probs_fn(
                self.weights, self._fcfg, jnp.asarray(ids),
                jnp.asarray(positions, jnp.int32), self.cache, bt_j,
                jnp.asarray(slot_map.reshape(-1), jnp.int32),
                jnp.asarray(base_pos + g + 1), self.samp_state,
                self.block_size, self.backend, self.compute_dtype,
                lora_scalings=lora_rows,
            )
        # acceptance sampling on device (Leviathan et al.; greedy slots
        # reduce exactly to token matching) — only [B, g+1] results cross
        # to the host, never the vocab-sized distributions
        self._key, sub = jax.random.split(self._key)
        tokens_j, n_acc_j, lp_j = speculative_accept(
            drafts_j, jnp.stack(q_rows, axis=1), p_probs, sub
        )
        tokens_np = np.asarray(tokens_j)
        n_acc_np = np.asarray(n_acc_j)
        lp_np = np.asarray(lp_j)
        if verify_aux is not None:
            # hybrid/recurrent adapters: roll the captured state forward to
            # exactly the accepted prefix (base token + accepted drafts)
            n_commit = np.where(
                [active[s] is not None for s in range(b)], n_acc_np + 1, 0
            ).astype(np.int32)
            self.cache = self.adapter.commit_verify(
                self.cache, verify_aux, slot_ids, jnp.asarray(n_commit)
            )

        finished: list[Sequence] = []
        for seq in seqs:
            s = seq.slot
            acc = int(n_acc_np[s])
            commit = [int(x) for x in tokens_np[s, : acc + 1]]
            chosen_lp = lp_np
            self.stats["spec_drafted"] = self.stats.get("spec_drafted", 0) + g
            self.stats["spec_accepted"] = self.stats.get("spec_accepted", 0) + acc
            reason = None
            emitted: list[int] = []
            for j, tok in enumerate(commit):
                seq.output_ids.append(tok)
                seq.output_logprobs.append(float(chosen_lp[s, j]))
                emitted.append(tok)
                self.stats["generated_tokens"] += 1
                reason = self._check_stop(seq, tok)
                if reason is not None:
                    break
            self.kv.extend_hashes(seq.request_id, seq.all_ids)
            # publish on KV-WRITTEN tokens: the last committed (bonus) token's
            # KV is only written next round (vLLM publishes computed tokens)
            self.kv.publish_full_blocks(seq.request_id, seq.total_len - 1)
            if seq.on_tokens is not None:
                seq.on_tokens(emitted, reason is not None)
            if reason is not None:
                seq.finish(reason)
                self.scheduler.release(seq)
                self._slot_seq[s] = None
                finished.append(seq)
        return finished

    def _run_decode(self, seqs: list[Sequence]) -> list[Sequence]:
        if self.draft_cfg is not None:
            return self._run_decode_spec(seqs)
        b = self.max_batch
        tokens = np.zeros((b,), np.int32)
        positions = np.zeros((b,), np.int32)
        kv_lens = np.zeros((b,), np.int32)
        slot_map = np.full((b,), -1, np.int64)
        width = self._max_blocks_bucket()
        bt = np.zeros((b, width), np.int32)
        active = [None] * b
        for seq in seqs:
            s = seq.slot
            active[s] = seq
            # feed the last generated token (its KV is written this step at
            # position total_len-1; the first one was sampled from prefill
            # logits, so every decode input is a generated token)
            tokens[s] = seq.all_ids[-1]
            pos = seq.total_len - 1
            positions[s] = pos
            kv_lens[s] = pos + 1
            slot_map[s] = self.kv.slot_mapping(seq.request_id, pos, 1)[0]
            table = self.kv.block_table(seq.request_id)[:width]
            bt[s, : len(table)] = table

        self._key, sub = jax.random.split(self._key)
        rope_pos3 = None
        if self.mrope:
            # all 3 streams = token index + per-sequence mrope delta
            deltas = np.zeros((b,), np.int32)
            for seq in seqs:
                deltas[seq.slot] = getattr(seq, "rope_delta", 0)
            rope_pos3 = jnp.asarray(
                np.broadcast_to(positions + deltas, (3, b))[..., None]
            )
        if self.adapter is not None:
            dec_kwargs = {}
            if rope_pos3 is not None:
                dec_kwargs["rope_pos3"] = rope_pos3
            if self.lora_names and getattr(self.adapter, "supports_lora", False):
                dec_kwargs["lora_scalings"] = self._lora_scalings_rows(
                    {s_.slot: s_ for s_ in seqs}, b, 1
                )
            new_tokens, logprobs, tops, self.cache, self.samp_state = (
                self.adapter.decode(
                    self.cache, jnp.asarray(tokens), jnp.asarray(positions),
                    jnp.asarray(bt), jnp.asarray(slot_map, jnp.int32),
                    jnp.asarray(kv_lens), self.samp_state, sub, **dec_kwargs,
                )
            )
        elif self.mesh is not None:
            fwd_args = [
                self.weights, jnp.asarray(tokens)[:, None],
                jnp.asarray(positions)[:, None], self.cache, jnp.asarray(bt),
                jnp.asarray(slot_map, jnp.int32)[:, None], jnp.asarray(kv_lens),
                jnp.zeros((b,), jnp.int32),  # last_indices: T=1 → index 0
            ]
            if rope_pos3 is not None:
                fwd_args.append(rope_pos3)
            lora_rows = self._lora_scalings_rows(
                {s_.slot: s_ for s_ in seqs}, b, 1
            )
            if lora_rows is not None:
                fwd_args.append(lora_rows)
            logits, self.cache = self._tp_forward(
                rope3=rope_pos3, lora=lora_rows
            )(*fwd_args)
            new_tokens, logprobs, tops, self.samp_state = sample(
                logits[:, -1], self.samp_state, sub
            )
        else:
            new_tokens, logprobs, tops, self.cache, self.samp_state = _decode_fn(
                self.weights, self._fcfg, jnp.asarray(tokens), jnp.asarray(positions),
                self.cache, jnp.asarray(bt), jnp.asarray(slot_map, jnp.int32),
                jnp.asarray(kv_lens), self.samp_state, sub,
                self.block_size, self.backend, self.compute_dtype,
                rope_pos3=rope_pos3,
                lora_scalings=self._lora_scalings_rows(
                    {s_.slot: s_ for s_ in seqs}, b, 1
                ),
            )
        new_tokens = np.asarray(new_tokens)
        logprobs = np.asarray(logprobs)
        top_vals, top_ids = (np.asarray(tops[0]), np.asarray(tops[1]))

        finished: list[Sequence] = []
        for seq in seqs:
            s = seq.slot
            if self._commit_token(
                seq, int(new_tokens[s]), float(logprobs[s]),
                top_vals[s], top_ids[s],
            ):
                finished.append(seq)
        return finished

    def _commit_token(self, seq: Sequence, tok: int, logprob: float,
                      top_vals_row, top_ids_row) -> bool:
        """Commit one sampled token: advance grammar state, update constraint
        bias, record outputs, publish KV-complete blocks, and run stop
        checks. Returns True if the sequence finished."""
        s = seq.slot
        # advance grammar constraints with the committed token
        slot_cons = self._slot_constraint[s]
        gram_row: Optional[np.ndarray] = None
        gram_set = False
        if slot_cons is not None:
            cons, st = slot_cons
            builder = self._get_mask_builder()
            st = builder.advance_with_token(cons, st, tok)
            gram_set = True
            if st is None or cons.is_complete(st):
                # dead or complete → stop constraining (EOS-only mask when
                # complete is handled by the stop check below)
                self._slot_constraint[s] = None
                if st is not None and cons.is_complete(st):
                    seq._constraint_done = True  # type: ignore[attr-defined]
            else:
                self._slot_constraint[s] = (cons, st)
                allow = builder.mask(cons, st, self.cfg.eos_token_ids)
                gram_row = np.where(allow, 0.0, -1e30).astype(np.float32)
        if gram_set or seq.params.dry_multiplier > 0.0:
            row = gram_row
            if seq.params.dry_multiplier > 0.0:
                dry = dry_penalty_row(
                    seq.all_ids + [tok], seq.params, self.cfg.vocab_size,
                )
                if dry is not None:
                    row = dry if row is None else row + dry
            if row is None:
                row = np.zeros((self.cfg.vocab_size,), np.float32)
            self.samp_state = _set_constraint_bias(
                self.samp_state, s, jnp.asarray(row)
            )
        if seq.first_token_time is None:
            seq.first_token_time = time.monotonic()
        seq.output_ids.append(tok)
        seq.output_logprobs.append(logprob)
        if seq.params.n_logprobs > 0:
            k = min(seq.params.n_logprobs, top_ids_row.shape[0])
            seq.output_top_logprobs.append(
                {int(i): float(v) for i, v in
                 zip(top_ids_row[:k], top_vals_row[:k])}
            )
        self.stats["generated_tokens"] += 1
        self.kv.extend_hashes(seq.request_id, seq.all_ids)
        # the token just sampled has NO KV yet (written next step) →
        # publish only through total_len - 1 or a block whose last row is
        # zeros leaks into the prefix cache
        self.kv.publish_full_blocks(seq.request_id, seq.total_len - 1)
        reason = self._check_stop(seq, tok)
        if seq.on_tokens is not None:
            seq.on_tokens([tok], reason is not None)
        if reason is not None:
            seq.finish(reason)
            self.scheduler.release(seq)
            self._slot_seq[s] = None
            return True
        return False

    def _resolve_constraint(self, c):
        if c is None:
            return None
        if isinstance(c, str):
            from ..grammar import JsonConstraint, RegexConstraint

            if c in ("json_object", "json"):
                return JsonConstraint(root="object" if c == "json_object" else "any")
            if c.startswith("regex:"):
                return RegexConstraint(c[len("regex:"):])
            if c.startswith("lark:"):
                from ..cfg_grammar import LarkConstraint

                return LarkConstraint(c[len("lark:"):])
            raise ValueError(f"unknown constraint {c!r}")
        return c

    def _get_mask_builder(self):
        if self._mask_builder is None:
            if self.tokenizer is None:
                raise ValueError("grammar constraints require a tokenizer")
            from ..grammar import TokenMaskBuilder

            self._mask_builder = TokenMaskBuilder(self.tokenizer, self.cfg.vocab_size)
        return self._mask_builder

    def _check_stop(self, seq: Sequence, tok: int) -> Optional[StopReason]:
        p = seq.params
        if getattr(seq, "_constraint_done", False):
            return StopReason.STOP_TOKEN
        if tok in p.stop_token_ids:
            return StopReason.STOP_TOKEN
        if tok in self.cfg.eos_token_ids:
            return StopReason.EOS
        if seq.num_generated >= p.max_tokens:
            return StopReason.LENGTH
        if seq.total_len >= self.max_model_len:
            return StopReason.LENGTH
        if p.stop_strings and self.tokenizer is not None:
            # incremental: decode only a token window guaranteed to cover the
            # longest stop string (each token renders ≥ 1 char in practice;
            # +8 margin) — full-output decode every step is O(n²)
            max_ss = max(len(ss) for ss in p.stop_strings)
            ntok = min(len(seq.output_ids), max_ss + 8)
            text = self.tokenizer.decode(seq.output_ids[-ntok:])
            if any(ss in text for ss in p.stop_strings):
                return StopReason.STOP_STRING
        return None

    def _extend_prompt_embeds(self, seq: Sequence, folded_ids: list[int]) -> None:
        """Recompute-preemption folds generated tokens into the prompt; a
        multimodal sequence's prompt_embeds must grow matching rows (plain
        embedding-table rows — generated tokens are always text)."""
        if not folded_ids:
            return
        mp = getattr(seq, "mrope_positions", None)
        if mp is not None:
            # generated tokens advance all 3 streams together from max + 1
            nxt = int(mp.max()) + 1
            ext = np.broadcast_to(
                nxt + np.arange(len(folded_ids), dtype=np.int32), (3, len(folded_ids))
            )
            seq.mrope_positions = np.concatenate([mp, ext], axis=1)  # type: ignore[attr-defined]
        dse = getattr(seq, "deepstack_embeds", None)
        if dse is not None:
            # folded generated tokens are text: zero deepstack rows
            seq.deepstack_embeds = np.concatenate(  # type: ignore[attr-defined]
                [dse, np.zeros((len(folded_ids),) + dse.shape[1:], dse.dtype)],
                axis=0,
            )
        pe = getattr(seq, "prompt_embeds", None)
        if pe is None:
            return
        from ..quant.linear import embedding_lookup

        rows = embedding_lookup(
            jnp.asarray(folded_ids, jnp.int32), self.weights["embed"],
            dtype=pe.dtype,
        )
        if getattr(self.cfg, "arch", "").startswith("gemma"):
            rows = rows * jnp.asarray(
                getattr(self.cfg, "embedding_multiplier", None) or self.cfg.hidden_size**0.5,
                rows.dtype,
            )
        elif getattr(self.cfg, "embedding_multiplier", None):
            rows = rows * jnp.asarray(self.cfg.embedding_multiplier, rows.dtype)
        seq.prompt_embeds = jnp.concatenate([pe, rows], axis=0)  # type: ignore[attr-defined]
