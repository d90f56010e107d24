"""Arch adapters: serve specialized model families through the engine.

The analog of the reference's per-arch Pipeline implementations +
hybrid cache (`mistralrs-core/src/pipeline/` and
`kv_cache/hybrid_cache.rs`): the engine drives ONE loop (scheduler,
paged block accounting, fixed-slot sampler) and an adapter supplies the
arch's forward + cache shape:

* ``DeepseekAdapter`` — absorbed MLA over a paged latent pool.
* ``Qwen3NextAdapter`` — hybrid: paged KV for full-attention layers +
  per-slot conv/recurrent state pools for the GDN layers.
* ``Lfm2Adapter`` — hybrid: paged KV for attention layers + per-slot
  conv state for the short-conv layers.

All per-sequence state is keyed by the engine's fixed decode slot, which
the scheduler claims at ADMISSION so chunked prefill has a stable home.
Prefill rows carry (slot_ids, resets): resets=1 zeroes a row's recurrent
state before processing (fresh prompt or recompute-preemption replay).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..generate import _freeze
from .sampler import sample


def _hashable(cfg):
    return _freeze(cfg)


class DeepseekAdapter:
    """Serve DeepSeek V2/V3 / GLM-4-MoE-Lite (absorbed MLA + DeepSeek-MoE)
    via the engine. Composes with quantized latent pools (int8/fp8 rows +
    per-slot scales) and speculative decoding (the pool is pure KV — partial
    acceptance rolls back by kv_len truncation alone, no recurrent state)."""

    supports_prefix_cache = True
    supports_embeds = False
    supports_kv_quant = True
    supports_lora = True  # per-request bank via attach_adapter_bank

    def __init__(self, cfg, weights, compute_dtype=jnp.float32, backend=None):
        self.cfg = cfg
        # the engine reads bank names from ITS weights dict; the forwards
        # must only see arrays
        self.weights = {k: v for k, v in weights.items() if k != "lora_names"}
        self.compute_dtype = compute_dtype
        self.backend = backend
        self._fcfg = _hashable(cfg)

    def create_cache(self, num_blocks: int, block_size: int, n_slots: int,
                     kv_quant=None):
        from ..models.deepseek import make_paged_cache

        self._block_size = block_size
        return make_paged_cache(
            self.cfg, num_blocks, block_size, dtype=self.compute_dtype,
            kv_quant=kv_quant,
        )

    def prefill(self, cache, ids, positions, bt, slot_map, kv_lens,
                last_indices, slot_ids, resets, embeds=None,
                lora_scalings=None):
        return _ds_fwd(
            self.weights, self._fcfg, ids, positions, cache, bt,
            slot_map.reshape(-1), kv_lens, last_indices,
            self._block_size, self.backend, self.compute_dtype,
            lora_scalings=lora_scalings,
        )

    def decode(self, cache, tokens, positions, bt, slot_map, kv_lens,
               samp_state, key, lora_scalings=None):
        return _ds_decode(
            self.weights, self._fcfg, tokens, positions, cache, bt,
            slot_map, kv_lens, samp_state, key,
            self._block_size, self.backend, self.compute_dtype,
            lora_scalings=lora_scalings,
        )

    def verify(self, cache, ids, positions, bt, slot_map, kv_lens,
               samp_state, slot_ids=None, lora_scalings=None):
        """Speculative target verification: sampler-transformed probs at
        all γ+1 positions (the adapter analog of `_verify_probs_fn`;
        reference pairs speculative with ANY pipeline,
        speculative/driver.rs:18). The latent pool is pure KV — partial
        acceptance needs no commit (aux is None)."""
        probs, cache = _ds_verify(
            self.weights, self._fcfg, ids, positions, cache, bt,
            slot_map.reshape(-1), kv_lens, samp_state,
            self._block_size, self.backend, self.compute_dtype,
            lora_scalings=lora_scalings,
        )
        return probs, cache, None


class Qwen3NextAdapter:
    """Serve Qwen3-Next (hybrid GDN/full-attention MoE) via the engine.

    Paged KV pools for the full-attention layers; conv/recurrent GDN state
    lives in per-slot pools keyed by the engine's fixed decode slot (claimed
    at admission, so chunked prefill continues the same state). Prefix
    caching is off: recurrent state cannot be revived from KV blocks.
    Composes with int8/fp8 attention KV and speculative decoding (GDN
    state rolls back via per-prefix capture + commit)."""

    supports_prefix_cache = False
    supports_embeds = True  # qwen3.5-vl serves through merged embeds
    supports_kv_quant = True
    supports_lora = True  # per-request bank (single-device engine)
    supports_dp = True  # slot pools group-partition over the data axis

    def __init__(self, cfg, weights, compute_dtype=jnp.float32, backend=None):
        self.cfg = cfg
        # the engine reads bank names from ITS weights dict; the forwards
        # must only see arrays
        self.weights = {k: v for k, v in weights.items() if k != "lora_names"}
        self.compute_dtype = compute_dtype
        self.backend = backend
        self._fcfg = _hashable(cfg)
        self.mesh = None
        self._dp = 1
        self._dp_axis = None
        self._tp_fns: dict = {}

    def shard(self, mesh):
        """Shard weights + state pools over the mesh — the mesh×hybrid-arch
        composition (reference: every-model TP,
        `mistralrs-quant/src/distributed/layers.rs:58` from qwen3_next.rs).
        Attention KV shards on kv-heads; the GDN conv window and delta-rule
        state shard on their heads (conv rows permuted to shard-major);
        experts shard EP-style with the router replicated. dp > 1
        partitions the slot axes of ALL pools over the data axis (group-
        local ids, per-group trash — make_paged_cache groups=dp); batch
        rows shard dp-wise and the body localizes engine slot ids."""
        from ..models.qwen3next import (
            permute_gdn_conv_for_tp, q3n_cache_pspecs, q3n_local_config,
            q3n_weight_pspecs,
        )
        from ..parallel.tp import DP_AXIS, TP_AXIS
        from jax.sharding import NamedSharding

        tp = int(mesh.shape[TP_AXIS])
        self._dp = int(mesh.shape.get(DP_AXIS, 1))
        self.mesh = mesh
        self._tp_axis = TP_AXIS
        self._dp_axis = DP_AXIS
        self._lcfg = _hashable(q3n_local_config(self.cfg, tp))
        w = permute_gdn_conv_for_tp(self.weights, self.cfg, tp)
        self._wspecs = q3n_weight_pspecs(w, TP_AXIS)
        self.weights = jax.tree_util.tree_map(
            lambda a, s: None if a is None
            else jax.device_put(a, NamedSharding(mesh, s)),
            w, self._wspecs, is_leaf=lambda x: x is None,
        )
        self._cspecs = q3n_cache_pspecs(
            TP_AXIS, DP_AXIS if self._dp > 1 else None
        )

    def create_cache(self, num_blocks: int, block_size: int, n_slots: int,
                     kv_quant=None):
        from ..models.qwen3next import make_paged_cache

        self._block_size = block_size
        cache = make_paged_cache(
            self.cfg, num_blocks, block_size, n_slots,
            dtype=self.compute_dtype, kv_quant=kv_quant,
            groups=getattr(self, "_dp", 1) or 1,
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding

            cache = jax.tree_util.tree_map(
                lambda a, s: jax.device_put(a, NamedSharding(self.mesh, s)),
                cache, self._cspecs,
            )
        return cache

    def _tp_step(self, decode: bool, embeds, rope3, deepstack):
        """Lazily built shard_map step: weights + pools sharded, batch rows
        dp-sharded (replicated at dp=1), logits returned global. Engine slot
        ids are GLOBAL (group-major rows); the body rebases them to the
        group-local pool plane (trash = local shape-1, per-group)."""
        from jax.sharding import PartitionSpec as P
        from ..models.qwen3next import qwen3next_forward_paged

        key = (decode, embeds is not None, rope3 is not None,
               deepstack is not None)
        fn = self._tp_fns.get(key)
        if fn is not None:
            return fn
        lcfg, bsz, cdt, axis = (
            self._lcfg, self._block_size, self.compute_dtype, self._tp_axis
        )
        rep = P()
        dp, dpa = self._dp, self._dp_axis
        row = P(dpa) if dp > 1 else rep
        row2 = P(dpa, None) if dp > 1 else rep

        def body(w, ids, positions, cache, bt, slot_map, kv_lens, slot_ids,
                 resets, last_idx, *extras):
            extras = list(extras)
            emb = extras.pop(0) if key[1] else None
            r3 = extras.pop(0) if key[2] else None
            ds = extras.pop(0) if key[3] else None
            if dp > 1:
                spg = cache["conv"].shape[1] - 1  # local live slots
                g = jax.lax.axis_index(dpa)
                slot_ids = jnp.where(slot_ids < 0, -1, slot_ids - g * spg)
            return qwen3next_forward_paged(
                w, lcfg, ids, positions, cache, bt,
                slot_map.reshape(ids.shape), kv_lens, slot_ids, resets,
                block_size=bsz, decode=decode, compute_dtype=cdt,
                logits_last_only=True,
                last_indices=None if decode else last_idx,
                input_embeds=emb, rope_positions3=r3, deepstack=ds,
                tp_axis=axis,
            )

        in_specs = [self._wspecs, row2, row2, self._cspecs, row2, row2,
                    row, row, row, row]
        if key[1]:
            in_specs.append(P(dpa, None, None) if dp > 1 else rep)
        if key[2]:
            in_specs.append(P(None, dpa, None) if dp > 1 else rep)
        if key[3]:
            in_specs.append(P(None, dpa, None, None) if dp > 1 else rep)
        out_logits = P(dpa, None, None) if dp > 1 else rep
        mapped = jax.shard_map(
            body, mesh=self.mesh, in_specs=tuple(in_specs),
            out_specs=(out_logits, self._cspecs), check_vma=False,
        )
        fn = self._tp_fns[key] = jax.jit(mapped)
        return fn

    def prefill(self, cache, ids, positions, bt, slot_map, kv_lens,
                last_indices, slot_ids, resets, embeds=None,
                rope_pos3=None, deepstack=None, lora_scalings=None):
        if self.mesh is not None:
            if lora_scalings is not None:
                raise NotImplementedError(
                    "qwen3next per-request LoRA on a mesh"
                )
            fn = self._tp_step(False, embeds, rope_pos3, deepstack)
            extras = [e for e in (embeds, rope_pos3, deepstack)
                      if e is not None]
            return fn(self.weights, ids, positions, cache, bt, slot_map,
                      kv_lens, slot_ids, resets, last_indices, *extras)
        return _q3n_fwd(
            self.weights, self._fcfg, ids, positions, cache, bt,
            slot_map, kv_lens, slot_ids, resets, last_indices,
            self._block_size, self.compute_dtype, embeds, rope_pos3,
            deepstack, lora_scalings,
        )

    def decode(self, cache, tokens, positions, bt, slot_map, kv_lens,
               samp_state, key, rope_pos3=None, lora_scalings=None):
        if self.mesh is not None:
            if lora_scalings is not None:
                raise NotImplementedError(
                    "qwen3next per-request LoRA on a mesh"
                )
            b = tokens.shape[0]
            slot_ids = jnp.where(
                slot_map >= 0, jnp.arange(b, dtype=jnp.int32), -1
            )
            fn = self._tp_step(True, None, rope_pos3, None)
            extras = [rope_pos3] if rope_pos3 is not None else []
            logits, cache = fn(
                self.weights, tokens[:, None], positions[:, None], cache, bt,
                slot_map[:, None], kv_lens, slot_ids,
                jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.int32),
                *extras,
            )
            new_tokens, logprobs, tops, samp_state = sample(
                logits[:, -1], samp_state, key
            )
            return new_tokens, logprobs, tops, cache, samp_state
        return _q3n_decode(
            self.weights, self._fcfg, tokens, positions, cache, bt,
            slot_map, kv_lens, samp_state, key,
            self._block_size, self.compute_dtype, rope_pos3, lora_scalings,
        )

    def verify(self, cache, ids, positions, bt, slot_map, kv_lens,
               samp_state, slot_ids=None, lora_scalings=None):
        """Speculative target verification for the hybrid arch: attention
        layers verify via kv_len truncation like any paged cache, and the
        GDN layers run in CAPTURE mode — per-prefix conv/recurrent states
        come back as aux so `commit_verify` can roll the state to exactly
        the accepted length (the recurrent analog of the reference's
        speculative cache rollback, speculative/cache.rs). On a mesh the
        capture forward runs TP/DP-sharded; the sampler transform applies
        OUTSIDE the shard_map on the gathered logits (works at any dp)."""
        if self.mesh is not None:
            if lora_scalings is not None:
                raise NotImplementedError(
                    "qwen3next per-request LoRA on a mesh"
                )
            from .sampler import _transformed_probs

            logits, cache, aux = self._tp_verify_fn()(
                self.weights, ids, positions, cache, bt, slot_map,
                kv_lens, slot_ids
            )
            probs = jnp.stack(
                [
                    _transformed_probs(
                        logits[:, j].astype(jnp.float32), samp_state
                    )
                    for j in range(logits.shape[1])
                ],
                axis=1,
            )
            return probs, cache, aux
        return _q3n_verify(
            self.weights, self._fcfg, ids, positions, cache, bt,
            slot_map, kv_lens, slot_ids, samp_state,
            self._block_size, self.backend, self.compute_dtype,
            lora_scalings=lora_scalings,
        )

    def _tp_verify_fn(self):
        """Capture-mode verify forward over the mesh. Aux states come back
        dp-sharded on batch / tp-sharded on the GDN head axes, matching
        what `_tp_commit_fn` scatters into the sharded pools."""
        from jax.sharding import PartitionSpec as P
        from ..models.qwen3next import qwen3next_forward_paged

        fn = self._tp_fns.get("verify")
        if fn is not None:
            return fn
        lcfg, bsz, cdt, axis = (
            self._lcfg, self._block_size, self.compute_dtype, self._tp_axis
        )
        rep = P()
        dp, dpa = self._dp, self._dp_axis
        row = P(dpa) if dp > 1 else rep
        row2 = P(dpa, None) if dp > 1 else rep

        def body(w, ids, positions, cache, bt, slot_map, kv_lens, slot_ids):
            if dp > 1:
                spg = cache["conv"].shape[1] - 1
                g = jax.lax.axis_index(dpa)
                slot_ids = jnp.where(slot_ids < 0, -1, slot_ids - g * spg)
            return qwen3next_forward_paged(
                w, lcfg, ids, positions, cache, bt, slot_map, kv_lens,
                slot_ids, jnp.zeros_like(slot_ids),
                block_size=bsz, decode=False, compute_dtype=cdt,
                logits_last_only=False, capture_states=True, tp_axis=axis,
            )

        aux_specs = {
            "timeline": P(None, dpa if dp > 1 else None, None, axis),
            "rec": P(None, dpa if dp > 1 else None, None, axis, None, None),
        }
        out_logits = P(dpa, None, None) if dp > 1 else rep
        mapped = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(self._wspecs, row2, row2, self._cspecs, row2, row2,
                      row, row),
            out_specs=(out_logits, self._cspecs, aux_specs),
            check_vma=False,
        )
        fn = self._tp_fns["verify"] = jax.jit(mapped)
        return fn

    def commit_verify(self, cache, aux, slot_ids, n_commit):
        if self.mesh is not None:
            return self._tp_commit_fn()(cache, aux, slot_ids, n_commit)
        return _q3n_commit(
            self._fcfg, cache, aux, slot_ids, n_commit
        )

    def _tp_commit_fn(self):
        from jax.sharding import PartitionSpec as P
        from ..models.qwen3next import commit_verified_states

        fn = self._tp_fns.get("commit")
        if fn is not None:
            return fn
        lcfg, axis = self._lcfg, self._tp_axis
        rep = P()
        dp, dpa = self._dp, self._dp_axis
        row = P(dpa) if dp > 1 else rep

        def body(cache, aux, slot_ids, n_commit):
            if dp > 1:
                spg = cache["conv"].shape[1] - 1
                g = jax.lax.axis_index(dpa)
                slot_ids = jnp.where(slot_ids < 0, -1, slot_ids - g * spg)
            return commit_verified_states(lcfg, cache, aux, slot_ids, n_commit)

        aux_specs = {
            "timeline": P(None, dpa if dp > 1 else None, None, axis),
            "rec": P(None, dpa if dp > 1 else None, None, axis, None, None),
        }
        mapped = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(self._cspecs, aux_specs, row, row),
            out_specs=self._cspecs, check_vma=False,
        )
        fn = self._tp_fns["commit"] = jax.jit(mapped)
        return fn


class Gemma3nAdapter:
    """Serve Gemma 3n (AltUp/Laurel/per-layer-inputs, KV-shared layers)
    via the engine: paged KV planes exist only for KV-storing layers,
    shared layers read their source plane."""

    supports_prefix_cache = True
    supports_embeds = True

    def __init__(self, cfg, weights, compute_dtype=jnp.float32, backend=None):
        self.cfg = cfg
        # the engine reads bank names from ITS weights dict; the forwards
        # must only see arrays
        self.weights = {k: v for k, v in weights.items() if k != "lora_names"}
        self.compute_dtype = compute_dtype
        self.backend = backend
        self._fcfg = _hashable(cfg)

    def create_cache(self, num_blocks: int, block_size: int, n_slots: int):
        from ..models.gemma3n import make_paged_cache

        self._block_size = block_size
        return make_paged_cache(
            self.cfg, num_blocks, block_size, n_slots, dtype=self.compute_dtype
        )

    def prefill(self, cache, ids, positions, bt, slot_map, kv_lens,
                last_indices, slot_ids, resets, embeds=None):
        return _g3n_fwd(
            self.weights, self._fcfg, ids, positions, cache, bt,
            slot_map, kv_lens, last_indices,
            self._block_size, self.compute_dtype, embeds,
        )

    def decode(self, cache, tokens, positions, bt, slot_map, kv_lens,
               samp_state, key):
        return _g3n_decode(
            self.weights, self._fcfg, tokens, positions, cache, bt,
            slot_map, kv_lens, samp_state, key,
            self._block_size, self.compute_dtype,
        )


@functools.partial(
    jax.jit, static_argnames=("cfg", "block_size", "compute_dtype")
)
def _g3n_fwd(weights, cfg, ids, positions, cache, bt, slot_map, kv_lens,
             last_indices, block_size, compute_dtype, embeds=None):
    from ..models.gemma3n import gemma3n_forward_paged

    return gemma3n_forward_paged(
        weights, cfg, ids, positions, cache, bt,
        slot_map.reshape(ids.shape), kv_lens,
        block_size=block_size, compute_dtype=compute_dtype,
        logits_last_only=True, last_indices=last_indices,
        input_embeds=embeds,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "block_size", "compute_dtype")
)
def _g3n_decode(weights, cfg, tokens, positions, cache, bt, slot_map,
                kv_lens, samp_state, key, block_size, compute_dtype):
    from ..models.gemma3n import gemma3n_forward_paged

    logits, cache = gemma3n_forward_paged(
        weights, cfg, tokens[:, None], positions[:, None], cache, bt,
        slot_map[:, None], kv_lens,
        block_size=block_size, compute_dtype=compute_dtype,
        logits_last_only=True,
    )
    new_tokens, logprobs, tops, samp_state = sample(
        logits[:, -1], samp_state, key
    )
    return new_tokens, logprobs, tops, cache, samp_state


class Lfm2Adapter:
    """Serve LFM2 (short-conv / full-attention hybrid) via the engine.

    Paged KV for attention layers; conv windows in per-slot pools keyed by
    the engine's fixed decode slot. Prefix caching off: conv state cannot
    be revived from KV blocks."""

    supports_prefix_cache = False
    supports_embeds = True

    def __init__(self, cfg, weights, compute_dtype=jnp.float32, backend=None):
        self.cfg = cfg
        # the engine reads bank names from ITS weights dict; the forwards
        # must only see arrays
        self.weights = {k: v for k, v in weights.items() if k != "lora_names"}
        self.compute_dtype = compute_dtype
        self.backend = backend
        self._fcfg = _hashable(cfg)

    def create_cache(self, num_blocks: int, block_size: int, n_slots: int):
        from ..models.lfm2 import make_paged_cache

        self._block_size = block_size
        return make_paged_cache(
            self.cfg, num_blocks, block_size, n_slots, dtype=self.compute_dtype
        )

    def prefill(self, cache, ids, positions, bt, slot_map, kv_lens,
                last_indices, slot_ids, resets, embeds=None):
        return _lfm2_fwd(
            self.weights, self._fcfg, ids, positions, cache, bt,
            slot_map, kv_lens, slot_ids, resets, last_indices,
            self._block_size, self.compute_dtype, embeds,
        )

    def decode(self, cache, tokens, positions, bt, slot_map, kv_lens,
               samp_state, key):
        return _lfm2_decode(
            self.weights, self._fcfg, tokens, positions, cache, bt,
            slot_map, kv_lens, samp_state, key,
            self._block_size, self.compute_dtype,
        )


@functools.partial(
    jax.jit, static_argnames=("cfg", "block_size", "compute_dtype")
)
def _lfm2_fwd(weights, cfg, ids, positions, cache, bt, slot_map, kv_lens,
              slot_ids, resets, last_indices, block_size, compute_dtype,
              embeds=None):
    from ..models.lfm2 import lfm2_forward_paged

    return lfm2_forward_paged(
        weights, cfg, ids, positions, cache, bt,
        slot_map.reshape(ids.shape), kv_lens, slot_ids, resets,
        block_size=block_size, decode=False, compute_dtype=compute_dtype,
        logits_last_only=True, last_indices=last_indices,
        input_embeds=embeds,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "block_size", "compute_dtype")
)
def _lfm2_decode(weights, cfg, tokens, positions, cache, bt, slot_map,
                 kv_lens, samp_state, key, block_size, compute_dtype):
    from ..models.lfm2 import lfm2_forward_paged

    b = tokens.shape[0]
    slot_ids = jnp.where(slot_map >= 0, jnp.arange(b, dtype=jnp.int32), -1)
    logits, cache = lfm2_forward_paged(
        weights, cfg, tokens[:, None], positions[:, None], cache, bt,
        slot_map[:, None], kv_lens, slot_ids, jnp.zeros((b,), jnp.int32),
        block_size=block_size, decode=True, compute_dtype=compute_dtype,
        logits_last_only=True,
    )
    new_tokens, logprobs, tops, samp_state = sample(
        logits[:, -1], samp_state, key
    )
    return new_tokens, logprobs, tops, cache, samp_state


@functools.partial(
    jax.jit, static_argnames=("cfg", "block_size", "compute_dtype")
)
def _q3n_fwd(weights, cfg, ids, positions, cache, bt, slot_map, kv_lens,
             slot_ids, resets, last_indices, block_size, compute_dtype,
             embeds=None, rope_pos3=None, deepstack=None,
             lora_scalings=None):
    from ..models.qwen3next import qwen3next_forward_paged

    return qwen3next_forward_paged(
        weights, cfg, ids, positions, cache, bt,
        slot_map.reshape(ids.shape), kv_lens, slot_ids, resets,
        block_size=block_size, decode=False, compute_dtype=compute_dtype,
        logits_last_only=True, last_indices=last_indices,
        input_embeds=embeds, rope_positions3=rope_pos3, deepstack=deepstack,
        lora_scalings=lora_scalings,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "block_size", "compute_dtype")
)
def _q3n_decode(weights, cfg, tokens, positions, cache, bt, slot_map,
                kv_lens, samp_state, key, block_size, compute_dtype,
                rope_pos3=None, lora_scalings=None):
    from ..models.qwen3next import qwen3next_forward_paged

    b = tokens.shape[0]
    slot_ids = jnp.where(slot_map >= 0, jnp.arange(b, dtype=jnp.int32), -1)
    logits, cache = qwen3next_forward_paged(
        weights, cfg, tokens[:, None], positions[:, None], cache, bt,
        slot_map[:, None], kv_lens, slot_ids, jnp.zeros((b,), jnp.int32),
        block_size=block_size, decode=True, compute_dtype=compute_dtype,
        logits_last_only=True, rope_positions3=rope_pos3,
        lora_scalings=lora_scalings,
    )
    new_tokens, logprobs, tops, samp_state = sample(
        logits[:, -1], samp_state, key
    )
    return new_tokens, logprobs, tops, cache, samp_state


@functools.partial(
    jax.jit, static_argnames=("cfg", "block_size", "backend", "compute_dtype")
)
def _ds_fwd(weights, cfg, ids, positions, cache, bt, slot_map, kv_lens,
            last_indices, block_size, backend, compute_dtype,
            lora_scalings=None):
    from ..models.deepseek import deepseek_forward_paged

    return deepseek_forward_paged(
        weights, cfg, ids, positions, cache, bt, slot_map, kv_lens,
        block_size=block_size, backend=backend, compute_dtype=compute_dtype,
        logits_last_only=True, last_indices=last_indices,
        lora_scalings=lora_scalings,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "block_size", "backend", "compute_dtype")
)
def _ds_verify(weights, cfg, ids, positions, cache, bt, slot_map, kv_lens,
               samp_state, block_size, backend, compute_dtype,
               lora_scalings=None):
    from ..models.deepseek import deepseek_forward_paged
    from .sampler import _transformed_probs

    logits, cache = deepseek_forward_paged(
        weights, cfg, ids, positions, cache, bt, slot_map, kv_lens,
        block_size=block_size, backend=backend, compute_dtype=compute_dtype,
        logits_last_only=False, lora_scalings=lora_scalings,
    )
    probs = jnp.stack(
        [
            _transformed_probs(logits[:, j].astype(jnp.float32), samp_state)
            for j in range(logits.shape[1])
        ],
        axis=1,
    )
    return probs, cache


@functools.partial(
    jax.jit, static_argnames=("cfg", "block_size", "backend", "compute_dtype")
)
def _ds_decode(weights, cfg, tokens, positions, cache, bt, slot_map, kv_lens,
               samp_state, key, block_size, backend, compute_dtype,
               lora_scalings=None):
    from ..models.deepseek import deepseek_forward_paged

    logits, cache = deepseek_forward_paged(
        weights, cfg, tokens[:, None], positions[:, None], cache, bt,
        slot_map, kv_lens, block_size=block_size, backend=backend,
        compute_dtype=compute_dtype, logits_last_only=True,
        lora_scalings=lora_scalings,
    )
    new_tokens, logprobs, tops, samp_state = sample(
        logits[:, -1], samp_state, key
    )
    return new_tokens, logprobs, tops, cache, samp_state


class MllamaAdapter:
    """Serve Mllama (Llama 3.2 Vision) via the engine: paged KV for self
    layers + per-decode-slot cross K/V pools installed at admission
    (`Engine.add_request(adapter_state=...)` → `admit`). The analog of the
    reference's Mllama pipeline + cross-attention cache
    (`vision_models/mllama/mod.rs`)."""

    supports_prefix_cache = False  # cross-branch output depends on the image
    supports_embeds = False

    def __init__(self, cfg, weights, compute_dtype=jnp.float32, backend=None):
        self.cfg = cfg
        # the engine reads bank names from ITS weights dict; the forwards
        # must only see arrays
        self.weights = {k: v for k, v in weights.items() if k != "lora_names"}
        self.compute_dtype = compute_dtype
        self.backend = backend
        self._fcfg = _hashable(cfg)

    def create_cache(self, num_blocks: int, block_size: int, n_slots: int):
        from ..models.mllama import make_paged_cache

        self._block_size = block_size
        return make_paged_cache(
            self.cfg, num_blocks, block_size, n_slots,
            dtype=self.compute_dtype,
        )

    def admit(self, cache, slot: int, state: dict):
        """Install a request's vision cross K/V into its decode slot.
        ``state`` = {"cross_states": [S_v, H], "img_start": int} from
        `prepare_request` (or text-only: None, never called)."""
        from ..models.mllama import admit_cross_states

        return admit_cross_states(
            self.weights, self.cfg, cache, slot,
            state["cross_states"], int(state.get("img_start", 0)),
        )

    def release(self, cache, slot: int):
        from ..models.mllama import release_cross_states

        return release_cross_states(cache, slot)

    def prepare_request(
        self, prompt_ids, pixel_values, aspect_ratio_ids, aspect_ratio_mask,
        img_start: int = 0,
    ):
        """→ (prompt_ids, adapter_state) for Engine.add_request."""
        from ..models.mllama import encode_images

        states = encode_images(
            self.weights, self.cfg, jnp.asarray(pixel_values),
            jnp.asarray(aspect_ratio_ids), jnp.asarray(aspect_ratio_mask),
        )
        return prompt_ids, {
            "cross_states": states[0], "img_start": img_start,
        }

    def prefill(self, cache, ids, positions, bt, slot_map, kv_lens,
                last_indices, slot_ids, resets, embeds=None):
        return _mllama_fwd(
            self.weights, self._fcfg, ids, positions, cache, bt,
            slot_map.reshape(ids.shape), kv_lens, slot_ids,
            last_indices, self._block_size, self.compute_dtype,
        )

    def decode(self, cache, tokens, positions, bt, slot_map, kv_lens,
               samp_state, key):
        return _mllama_decode(
            self.weights, self._fcfg, tokens, positions, cache, bt,
            slot_map, kv_lens, samp_state, key, self._block_size,
            self.compute_dtype,
        )


@functools.partial(
    jax.jit, static_argnames=("cfg", "block_size", "compute_dtype")
)
def _mllama_fwd(weights, cfg, ids, positions, cache, bt, slot_map, kv_lens,
                slot_ids, last_indices, block_size, compute_dtype):
    from ..models.mllama import mllama_forward_paged

    return mllama_forward_paged(
        weights, cfg, ids, positions, cache, bt, slot_map, kv_lens, slot_ids,
        block_size=block_size, compute_dtype=compute_dtype,
        logits_last_only=True, last_indices=last_indices,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "block_size", "compute_dtype")
)
def _mllama_decode(weights, cfg, tokens, positions, cache, bt, slot_map,
                   kv_lens, samp_state, key, block_size, compute_dtype):
    from ..models.mllama import mllama_forward_paged

    slot_ids = jnp.arange(tokens.shape[0], dtype=jnp.int32)
    logits, cache = mllama_forward_paged(
        weights, cfg, tokens[:, None], positions[:, None], cache, bt,
        slot_map[:, None], kv_lens, slot_ids,
        block_size=block_size, compute_dtype=compute_dtype,
        logits_last_only=True,
    )
    new_tokens, logprobs, tops, samp_state = sample(
        logits[:, -1], samp_state, key
    )
    return new_tokens, logprobs, tops, cache, samp_state


class Llama4Adapter:
    """Serve Llama 4 via the engine: paged KV + per-layer chunked/full
    masks, input-scaled MoE; multimodal via the prompt-embeds path (image
    features merged before submission, like llava)."""

    supports_prefix_cache = False  # chunked masks depend on absolute position
    # (prefix reuse is fine in principle; kept off until hashed with chunk ids)
    supports_embeds = True

    def __init__(self, cfg, weights, compute_dtype=jnp.float32, backend=None):
        self.cfg = cfg
        # the engine reads bank names from ITS weights dict; the forwards
        # must only see arrays
        self.weights = {k: v for k, v in weights.items() if k != "lora_names"}
        self.compute_dtype = compute_dtype
        self.backend = backend
        self._fcfg = _hashable(cfg)

    def create_cache(self, num_blocks: int, block_size: int, n_slots: int):
        from ..models.llama4 import make_paged_cache

        self._block_size = block_size
        return make_paged_cache(
            self.cfg, num_blocks, block_size, dtype=self.compute_dtype
        )

    def prefill(self, cache, ids, positions, bt, slot_map, kv_lens,
                last_indices, slot_ids, resets, embeds=None):
        return _l4_fwd(
            self.weights, self._fcfg, ids, positions, cache, bt,
            slot_map.reshape(ids.shape), kv_lens, last_indices,
            self._block_size, self.compute_dtype, embeds,
        )

    def decode(self, cache, tokens, positions, bt, slot_map, kv_lens,
               samp_state, key):
        return _l4_decode(
            self.weights, self._fcfg, tokens, positions, cache, bt,
            slot_map, kv_lens, samp_state, key, self._block_size,
            self.compute_dtype,
        )


@functools.partial(
    jax.jit, static_argnames=("cfg", "block_size", "compute_dtype")
)
def _l4_fwd(weights, cfg, ids, positions, cache, bt, slot_map, kv_lens,
            last_indices, block_size, compute_dtype, embeds=None):
    from ..models.llama4 import llama4_forward_paged

    return llama4_forward_paged(
        weights, cfg, ids, positions, cache, bt, slot_map, kv_lens,
        block_size=block_size, compute_dtype=compute_dtype,
        logits_last_only=True, last_indices=last_indices,
        input_embeds=embeds,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "block_size", "compute_dtype")
)
def _l4_decode(weights, cfg, tokens, positions, cache, bt, slot_map,
               kv_lens, samp_state, key, block_size, compute_dtype):
    from ..models.llama4 import llama4_forward_paged

    logits, cache = llama4_forward_paged(
        weights, cfg, tokens[:, None], positions[:, None], cache, bt,
        slot_map[:, None], kv_lens, block_size=block_size,
        compute_dtype=compute_dtype, logits_last_only=True,
    )
    new_tokens, logprobs, tops, samp_state = sample(
        logits[:, -1], samp_state, key
    )
    return new_tokens, logprobs, tops, cache, samp_state


class Gemma4Adapter:
    """Serve Gemma 4 text (sliding/full dual-geometry attention, KV-shared
    planes, PLE, optional parallel-MoE) via the engine. Plain per-type KV
    pools → prefix caching works (shared layers read donor planes)."""

    supports_prefix_cache = True
    supports_embeds = True

    def __init__(self, cfg, weights, compute_dtype=jnp.float32, backend=None):
        self.cfg = cfg
        # the engine reads bank names from ITS weights dict; the forwards
        # must only see arrays
        self.weights = {k: v for k, v in weights.items() if k != "lora_names"}
        self.compute_dtype = compute_dtype
        self.backend = backend
        self._fcfg = _hashable(cfg)

    def create_cache(self, num_blocks: int, block_size: int, n_slots: int):
        from ..models.gemma4 import make_paged_cache

        self._block_size = block_size
        return make_paged_cache(
            self.cfg, num_blocks, block_size, dtype=self.compute_dtype
        )

    def prefill(self, cache, ids, positions, bt, slot_map, kv_lens,
                last_indices, slot_ids, resets, embeds=None):
        return _g4_fwd(
            self.weights, self._fcfg, ids, positions, cache, bt,
            slot_map, kv_lens, last_indices,
            self._block_size, self.compute_dtype, embeds,
        )

    def decode(self, cache, tokens, positions, bt, slot_map, kv_lens,
               samp_state, key):
        return _g4_decode(
            self.weights, self._fcfg, tokens, positions, cache, bt,
            slot_map, kv_lens, samp_state, key,
            self._block_size, self.compute_dtype,
        )


@functools.partial(
    jax.jit, static_argnames=("cfg", "block_size", "compute_dtype")
)
def _g4_fwd(weights, cfg, ids, positions, cache, bt, slot_map, kv_lens,
            last_indices, block_size, compute_dtype, embeds=None):
    from ..models.gemma4 import gemma4_forward_paged

    return gemma4_forward_paged(
        weights, cfg, ids, positions, cache, bt, slot_map, kv_lens,
        block_size=block_size, compute_dtype=compute_dtype,
        logits_last_only=True, last_indices=last_indices,
        input_embeds=embeds,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "block_size", "compute_dtype")
)
def _g4_decode(weights, cfg, tokens, positions, cache, bt, slot_map,
               kv_lens, samp_state, key, block_size, compute_dtype):
    from ..models.gemma4 import gemma4_forward_paged

    logits, cache = gemma4_forward_paged(
        weights, cfg, tokens[:, None], positions[:, None], cache, bt,
        slot_map[:, None], kv_lens,
        block_size=block_size, compute_dtype=compute_dtype,
        logits_last_only=True,
    )
    new_tokens, logprobs, tops, samp_state = sample(
        logits[:, -1], samp_state, key
    )
    return new_tokens, logprobs, tops, cache, samp_state


@functools.partial(
    jax.jit, static_argnames=("cfg", "block_size", "backend", "compute_dtype")
)
def _q3n_verify(weights, cfg, ids, positions, cache, bt, slot_map, kv_lens,
                slot_ids, samp_state, block_size, backend, compute_dtype,
                lora_scalings=None):
    from ..models.qwen3next import qwen3next_forward_paged
    from .sampler import _transformed_probs

    logits, cache, aux = qwen3next_forward_paged(
        weights, cfg, ids, positions, cache, bt, slot_map, kv_lens,
        slot_ids, jnp.zeros_like(slot_ids),
        block_size=block_size, decode=False, compute_dtype=compute_dtype,
        logits_last_only=False, capture_states=True,
        lora_scalings=lora_scalings,
    )
    probs = jnp.stack(
        [
            _transformed_probs(logits[:, j].astype(jnp.float32), samp_state)
            for j in range(logits.shape[1])
        ],
        axis=1,
    )
    return probs, cache, aux


@functools.partial(jax.jit, static_argnames=("cfg",))
def _q3n_commit(cfg, cache, aux, slot_ids, n_commit):
    from ..models.qwen3next import commit_verified_states

    return commit_verified_states(cfg, cache, aux, slot_ids, n_commit)
