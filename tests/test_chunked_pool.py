"""Layer-chunked paged KV pools (kv/paged.py POOL_MAX_ELEMS).

A monolithic [L, n_kv, S_total, hd] pool crosses the TPU compiler's
per-buffer element ceiling at long context × batch (VERDICT r4: decode@16384
bs=8 was impossible). Chunked pools split the layer axis into several
buffers; forward_paged scans chunk by chunk. These tests force tiny
ceilings so 2-3-layer models chunk, and assert the engine's outputs are
IDENTICAL to the monolithic pool — on the XLA gather path and on the Pallas
kernel path (interpret mode), quantized and not.

Reference analog: per-layer cache tensors in
`mistralrs-core/src/paged_attention/cache_engine.rs:56`.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import mistralrs_tpu.kv.paged as paged_mod
from mistralrs_tpu.kv.paged import PagedKVCache, _layer_chunks
from mistralrs_tpu.models.config import ModelConfig
from mistralrs_tpu.models.hf_loader import weights_from_state_dict


def test_layer_chunks_math():
    assert _layer_chunks(32, 1000, 100000) == (32,)
    assert _layer_chunks(32, 1000, 16000) == (16, 16)
    assert _layer_chunks(32, 1000, 11000) == (11, 11, 10)
    assert _layer_chunks(3, 10, 10) == (1, 1, 1)
    # a single layer that alone exceeds the cap still gets one chunk
    assert _layer_chunks(2, 1000, 10) == (1, 1)
    # llama-3-8B geometry at the real ceiling: bs=8 × 16448-token sequences
    # (S_total = 131648 slots incl. trash block) → 3 chunks, each < 2^31
    elems_per_layer = 8 * 131648 * 128
    chunks = _layer_chunks(32, elems_per_layer, paged_mod.POOL_MAX_ELEMS)
    assert sum(chunks) == 32 and len(chunks) > 1
    for lc in chunks:
        assert lc * elems_per_layer < paged_mod.POOL_MAX_ELEMS


def _cfg(num_layers=3):
    return ModelConfig(
        arch="llama", vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=num_layers, num_heads=4, num_kv_heads=2, head_dim=16,
        max_position_embeddings=256,
    )


def test_create_chunked_shapes():
    cfg = _cfg()
    # elems/layer = 2 × (8+1)·16 × 16 = 4608; cap 2·4608 → 2-layer chunks
    cache = PagedKVCache.create(cfg, 8, 16, max_buffer_elems=2 * 4608)
    assert cache.chunked
    assert cache.layer_chunks == (2, 1)
    assert cache.num_slots == 9 * 16
    assert cache.head_dim == 16
    assert cache.k[0].shape == (2, 2, 144, 16)
    assert cache.k[1].shape == (1, 2, 144, 16)
    q = PagedKVCache.create(cfg, 8, 16, kv_quant="int8",
                            max_buffer_elems=2 * 4608)
    assert q.chunked and q.quantized
    assert all(s.shape[0] == lc for s, lc in zip(q.kv_scale, (2, 1)))


def _weights(cfg, seed=0):
    rng = np.random.default_rng(seed)
    r = lambda *s: rng.standard_normal(s, dtype=np.float32) * 0.05
    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    KV = cfg.num_kv_heads * cfg.head_dim
    sd = {"model.embed_tokens.weight": r(V, H),
          "model.norm.weight": np.ones(H, np.float32),
          "lm_head.weight": r(V, H)}
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "self_attn.q_proj.weight"] = r(H, H)
        sd[p + "self_attn.k_proj.weight"] = r(KV, H)
        sd[p + "self_attn.v_proj.weight"] = r(KV, H)
        sd[p + "self_attn.o_proj.weight"] = r(H, H)
        sd[p + "mlp.gate_proj.weight"] = r(I, H)
        sd[p + "mlp.up_proj.weight"] = r(I, H)
        sd[p + "mlp.down_proj.weight"] = r(H, I)
    return weights_from_state_dict(sd, cfg, dtype=jnp.float32)


def _run_engine(cfg, w, **kw):
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams

    eng = Engine(cfg, dict(w), num_blocks=32, block_size=16, max_batch=2,
                 compute_dtype=jnp.float32, **kw)
    seqs = [
        eng.add_request([1, 5, 9, 20, 7],
                        SamplingParams(temperature=0.0, max_tokens=10)),
        eng.add_request([2, 4, 6] * 7,
                        SamplingParams(temperature=0.0, max_tokens=8)),
    ]
    eng.run_to_completion()
    return [s.output_ids for s in seqs], eng


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_engine_chunked_outputs_identical(monkeypatch, backend):
    """Chunked pools through the ENGINE == monolithic, on both the XLA
    gather path and the Pallas kernels (interpret mode on CPU)."""
    cfg = _cfg(num_layers=3)
    w = _weights(cfg)
    kw = {"backend": backend}
    if backend == "pallas":
        monkeypatch.setenv("MRSTPU_PA_PAD_HD", "128")
    ref, eng0 = _run_engine(cfg, w, **kw)
    assert not eng0.cache.chunked
    # force chunking: cap = 2 layers' worth of one pool buffer
    per_layer = (
        eng0.cache.num_slots * cfg.num_kv_heads * eng0.cache.head_dim
    )
    monkeypatch.setattr(paged_mod, "POOL_MAX_ELEMS", 2 * per_layer)
    got, eng1 = _run_engine(cfg, w, **kw)
    assert eng1.cache.chunked and eng1.cache.layer_chunks == (2, 1)
    assert got == ref


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_engine_chunked_quantized_kv(monkeypatch, backend):
    """Chunked int8-KV pools (scale planes chunk too) == monolithic."""
    cfg = _cfg(num_layers=3)
    w = _weights(cfg, seed=1)
    kw = {"backend": backend, "kv_quant": "int8"}
    if backend == "pallas":
        monkeypatch.setenv("MRSTPU_PA_PAD_HD", "128")
    ref, eng0 = _run_engine(cfg, w, **kw)
    per_layer = (
        eng0.cache.num_slots * cfg.num_kv_heads * eng0.cache.head_dim
    )
    monkeypatch.setattr(paged_mod, "POOL_MAX_ELEMS", 2 * per_layer)
    got, eng1 = _run_engine(cfg, w, **kw)
    assert eng1.cache.chunked
    assert got == ref


def test_chunked_pool_on_mesh(monkeypatch):
    """Chunked pools compose with the TP/DP mesh engine: pspecs mirror the
    tuple structure and outputs match the single-device engine."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    from mistralrs_tpu.parallel.tp import build_mesh

    cfg = _cfg(num_layers=3)
    w = _weights(cfg, seed=2)
    ref, eng0 = _run_engine(cfg, w, backend="xla")
    per_layer = (
        eng0.cache.num_slots * cfg.num_kv_heads * eng0.cache.head_dim
    )
    monkeypatch.setattr(paged_mod, "POOL_MAX_ELEMS", per_layer)
    mesh = build_mesh(tp=2, dp=1, devices=jax.devices()[:2])
    got, eng1 = _run_engine(cfg, w, backend="xla", mesh=mesh)
    assert eng1.cache.chunked and len(eng1.cache.k) == 3
    assert got == ref
