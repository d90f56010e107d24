"""Round-5 ablation: WHY do the fused kernels inside shard_map decode at
0.42-0.48 of roofline vs 0.78 outside (VERDICT r4 weak #1)?

Decomposes the gap into three candidate causes on real hardware:

  A. plain scanned chain, donated cache      (the 742 tok/s headline path)
  B. shard_map body scanned in ONE jit, donated cache
     -> isolates "kernels inside shard_map" from dispatch methodology
  C. per-step jitted shard_map, donated cache
     -> adds per-step dispatch (relay RTT, host slot math between steps)
  D. per-step jitted shard_map, NO donation  (the r4 bench measurement)
     -> adds the full-pool copy XLA must insert when the output pool
        cannot alias the un-donated input pool
  E. per-step plain jit (no shard_map), donated
     -> per-step dispatch overhead without any mesh machinery

If B ~= A the kernels are fine under shard_map and the r4 number was a
measurement artifact (no donation + per-step dispatch); the fix is then
donation on the engine TP path + scanned measurement in bench.py.

Run: python exp/shardmap_ablation_r5.py | tee exp/shardmap_ablation_r5.log
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import llama8b_cfg, build_weights, V5E_HBM_GBPS
import signal
signal.alarm(0)  # bench.py arms a 180 s import-hang guard at module import
from mistralrs_tpu.models.llama import forward_paged, fuse_projections
from mistralrs_tpu.generate import _freeze
from mistralrs_tpu.kv.paged import PagedKVCache, auto_head_dim_pad
from mistralrs_tpu.parallel.tp import (
    build_mesh, paged_tp_forward_fn, TP_AXIS, DP_AXIS,
    weight_pspecs, paged_cache_pspecs, local_config, expert_parallel,
)
from jax.sharding import PartitionSpec as P

B, CTX, BS = 8, 1024, 64


def setup(cfg):
    weights, weight_bytes = build_weights(cfg)
    weights = fuse_projections(weights, cfg)
    return weights, weight_bytes


def make_cache(cfg, pallas=False):
    num_blocks = B * CTX // BS
    pad = auto_head_dim_pad(cfg.head_dim, "pallas") if pallas else 0
    return PagedKVCache.create(cfg, num_blocks, BS, head_dim_pad=pad)


def block_tables():
    width = CTX // BS
    return (jnp.arange(B)[:, None] * width
            + jnp.arange(width)[None, :]).astype(jnp.int32)


def roofline(cfg, weight_bytes):
    kv_bytes = cfg.num_layers * B * CTX * cfg.num_kv_heads * cfg.head_dim * 2 * 2
    return (weight_bytes + kv_bytes) / V5E_HBM_GBPS


def slope(run, n1=5, n2=25, iters=3):
    run(n1); run(n2)
    t1 = min(run(n1) for _ in range(iters))
    t2 = min(run(n2) for _ in range(iters))
    return (t2 - t1) / (n2 - n1)


def case_A(cfg, fcfg, weights):
    """Plain scanned chain, donated (bench headline)."""
    bt = block_tables()
    cache = make_cache(cfg)
    chains = {}

    def make_chain(n):
        @functools.partial(jax.jit, donate_argnums=(1,))
        def chain(weights, cache, tokens, lens):
            def body(carry, _):
                cache, tokens, lens = carry
                slots = (bt[jnp.arange(B), lens // BS] * BS + lens % BS).astype(jnp.int32)
                logits, cache = forward_paged(
                    weights, fcfg, tokens[:, None], lens[:, None], cache,
                    bt, slots[:, None], lens + 1, block_size=BS,
                    logits_last_only=True)
                tokens = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                return (cache, tokens, lens + 1), None
            (cache, tokens, lens), _ = jax.lax.scan(
                body, (cache, tokens, lens), None, length=n)
            return tokens, cache
        return chain

    t0 = jnp.zeros((B,), jnp.int32)
    l0 = jnp.full((B,), CTX - 64, jnp.int32)

    def run(n):
        nonlocal cache
        if n not in chains:
            chains[n] = make_chain(n)
        t = time.perf_counter()
        out, cache = chains[n](weights, cache, t0, l0)
        np.asarray(out)
        return time.perf_counter() - t

    return slope(run)


def _mapped_body(mesh, cfg, weights):
    """The shard_map-wrapped forward body (pre-jit), as paged_tp_forward_fn
    builds it."""
    tp = mesh.shape[TP_AXIS]
    ep = expert_parallel(cfg, tp)
    lcfg = local_config(cfg, tp, ep)
    wspecs = weight_pspecs(weights, ep=ep)
    cspecs = paged_cache_pspecs(False)

    def body(w, ids, positions, cache, bt, slot_map, kv_lens, last_idx):
        return forward_paged(
            w, lcfg, ids, positions, cache, bt, slot_map.reshape(-1), kv_lens,
            block_size=BS, backend="pallas", logits_last_only=True,
            compute_dtype=jnp.bfloat16,
            tp_axis=TP_AXIS if tp > 1 else None, last_indices=last_idx)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(wspecs, P(DP_AXIS, None), P(DP_AXIS, None), cspecs,
                  P(DP_AXIS, None), P(DP_AXIS, None), P(DP_AXIS), P(DP_AXIS)),
        out_specs=(P(DP_AXIS, None, None), cspecs),
        check_vma=False)


def case_B(cfg, weights):
    """shard_map body scanned inside ONE jit, donated."""
    mesh = build_mesh(tp=1, dp=1, devices=jax.devices()[:1])
    mapped = _mapped_body(mesh, cfg, weights)
    bt = block_tables()
    cache = make_cache(cfg, pallas=True)
    zi = jnp.zeros((B,), jnp.int32)
    chains = {}

    def make_chain(n):
        @functools.partial(jax.jit, donate_argnums=(1,))
        def chain(weights, cache, tokens, lens):
            def body(carry, _):
                cache, tokens, lens = carry
                slots = (bt[jnp.arange(B), lens // BS] * BS + lens % BS).astype(jnp.int32)
                logits, cache = mapped(
                    weights, tokens[:, None], lens[:, None], cache, bt,
                    slots[:, None], lens + 1, zi)
                tokens = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                return (cache, tokens, lens + 1), None
            (cache, tokens, lens), _ = jax.lax.scan(
                body, (cache, tokens, lens), None, length=n)
            return tokens, cache
        return chain

    t0 = jnp.zeros((B,), jnp.int32)
    l0 = jnp.full((B,), CTX - 64, jnp.int32)

    def run(n):
        nonlocal cache
        if n not in chains:
            chains[n] = make_chain(n)
        t = time.perf_counter()
        out, cache = chains[n](weights, cache, t0, l0)
        np.asarray(out)
        return time.perf_counter() - t

    return slope(run)


def _per_step(cfg, fwd, cache, *, precompute_slots=True):
    """Per-step dispatch timing shared by C/D/E. Slot math hoisted to a
    device-side precompute when precompute_slots (the engine computes slot
    mappings host-side from the block table, one small transfer per step)."""
    bt = block_tables()
    zi = jnp.zeros((B,), jnp.int32)
    lens0 = jnp.full((B,), CTX - 64, jnp.int32)
    tokens0 = jnp.zeros((B,), jnp.int32)

    def run(n):
        nonlocal cache
        t_l, tok = lens0, tokens0
        t = time.perf_counter()
        for _ in range(n):
            slots = (bt[jnp.arange(B), t_l // BS] * BS + t_l % BS)
            logits, cache = fwd(weights_g, tok[:, None], t_l[:, None], cache,
                                bt, slots[:, None].astype(jnp.int32),
                                t_l + 1, zi)
            tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
            t_l = t_l + 1
        np.asarray(tok)
        return time.perf_counter() - t

    # warm both chain lengths (compile once)
    return slope(run)


def case_C(cfg, weights):
    mesh = build_mesh(tp=1, dp=1, devices=jax.devices()[:1])
    mapped = _mapped_body(mesh, cfg, weights)
    fwd = jax.jit(mapped, donate_argnums=(3,))
    return _per_step(cfg, fwd, make_cache(cfg, pallas=True))


def case_D(cfg, weights):
    mesh = build_mesh(tp=1, dp=1, devices=jax.devices()[:1])
    fwd = paged_tp_forward_fn(mesh, cfg, weights, block_size=BS,
                              backend="pallas", compute_dtype=jnp.bfloat16)
    return _per_step(cfg, fwd, make_cache(cfg, pallas=True))


def case_E(cfg, fcfg, weights):
    @functools.partial(jax.jit, donate_argnums=(3,))
    def fwd(w, ids, positions, cache, bt, slots, kv_lens, last_idx):
        return forward_paged(
            w, fcfg, ids, positions, cache, bt, slots.reshape(-1), kv_lens,
            block_size=BS, logits_last_only=True)
    return _per_step(cfg, fwd, make_cache(cfg))


if __name__ == "__main__":
    assert jax.default_backend() == "tpu", "run on the TPU"
    cfg = llama8b_cfg()
    fcfg = _freeze(cfg)
    global weights_g
    weights_g, weight_bytes = setup(cfg)
    roof_step = roofline(cfg, weight_bytes)
    out = {}
    for name, fn in [
        ("A_plain_scan_donate", lambda: case_A(cfg, fcfg, weights_g)),
        ("B_shardmap_scan_donate", lambda: case_B(cfg, weights_g)),
        ("C_shardmap_perstep_donate", lambda: case_C(cfg, weights_g)),
        ("D_shardmap_perstep_nodonate", lambda: case_D(cfg, weights_g)),
        ("E_plain_perstep_donate", lambda: case_E(cfg, fcfg, weights_g)),
    ]:
        try:
            st = fn()
            out[name] = {"step_ms": round(st * 1e3, 3),
                         "tok_s": round(B / st, 1),
                         "vs_roofline": round((B / st) / (B / roof_step), 3)}
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"roofline_step_ms": round(roof_step * 1e3, 3),
                      "all": out}))
