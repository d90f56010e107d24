"""Pallas paged-decode attention vs the gather+sdpa reference (interpret
mode on CPU; the analog of the reference's paged-attn kernel tests)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mistralrs_tpu.kv.paged import gather_kv
from mistralrs_tpu.ops.attention import sdpa
from mistralrs_tpu.ops.paged_attention import paged_decode_attention


@pytest.mark.parametrize("window", [0, 9])
def test_matches_gather_sdpa(window):
    rng = np.random.default_rng(0)
    B, n_kv, group, hd, bs, W = 3, 2, 4, 64, 16, 8
    n_q = n_kv * group
    S_total = 16 * bs
    kp = jnp.asarray(rng.standard_normal((n_kv, S_total, hd)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((n_kv, S_total, hd)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, n_q, hd)), jnp.bfloat16)
    bt = jnp.asarray(rng.integers(0, 15, (B, W)), jnp.int32)
    kv_lens = jnp.asarray([37, 5, W * bs], jnp.int32)
    out = paged_decode_attention(
        q, kp, vp, bt, kv_lens, window, block_size=bs, interpret=True
    )
    kk, vv = gather_kv(kp, vp, bt, bs, dtype=jnp.float32)
    qr = q[:, None].astype(jnp.float32)
    ref = sdpa(
        qr, kk, vv, q_positions=(kv_lens - 1)[:, None], kv_len=kv_lens,
        sliding_window=window or None,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref[:, 0], np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_mha_group1():
    """group == 1 (MHA) exercises the group-padding path."""
    rng = np.random.default_rng(1)
    B, n_kv, hd, bs, W = 2, 4, 32, 8, 4
    S_total = 8 * bs
    kp = jnp.asarray(rng.standard_normal((n_kv, S_total, hd)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((n_kv, S_total, hd)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, n_kv, hd)), jnp.bfloat16)
    bt = jnp.asarray(rng.integers(0, 7, (B, W)), jnp.int32)
    kv_lens = jnp.asarray([11, 29], jnp.int32)
    out = paged_decode_attention(q, kp, vp, bt, kv_lens, 0, block_size=bs, interpret=True)
    kk, vv = gather_kv(kp, vp, bt, bs, dtype=jnp.float32)
    ref = sdpa(
        q[:, None].astype(jnp.float32), kk, vv,
        q_positions=(kv_lens - 1)[:, None], kv_len=kv_lens,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref[:, 0], np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_fused_write_matches_separate():
    """Fused reshape_and_cache+attend == write_kv then read-only attention."""
    import jax

    from mistralrs_tpu.kv.paged import write_kv
    from mistralrs_tpu.ops.paged_attention import paged_decode_attention_fused

    rng = np.random.default_rng(3)
    B, n_kv, group, hd, bs, W = 2, 2, 4, 64, 16, 4
    n_q = n_kv * group
    S_total = 9 * bs  # 8 blocks + trash
    kp = jnp.asarray(rng.standard_normal((n_kv, S_total, hd)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((n_kv, S_total, hd)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, n_q, hd)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((B, n_kv, hd)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((B, n_kv, hd)), jnp.bfloat16)
    bt = jnp.asarray([[0, 1, 2, 3], [4, 5, 6, 7]], jnp.int32)
    # seq 0 writes at logical pos 20 (block 1, offset 4 → slot 1*16+4);
    # seq 1 dropped write (slot −1, e.g. bootstrap step)
    slots = jnp.asarray([1 * bs + 4, -1], jnp.int32)
    kv_lens = jnp.asarray([21, 33], jnp.int32)

    out_f, kp_f, vp_f = paged_decode_attention_fused(
        q, kp, vp, k_new, v_new, slots, bt, kv_lens, 0,
        block_size=bs, interpret=True,
    )
    kp2, vp2, _ = write_kv(kp, vp, k_new, v_new, slots)
    from mistralrs_tpu.ops.paged_attention import paged_decode_attention

    out_r = paged_decode_attention(
        q, kp2, vp2, bt, kv_lens, 0, block_size=bs, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out_f, np.float32), np.asarray(out_r, np.float32),
        rtol=2e-2, atol=2e-2,
    )
    # pool contents match outside the trash row
    np.testing.assert_array_equal(
        np.asarray(kp_f[:, :-1], np.float32), np.asarray(kp2[:, :-1], np.float32)
    )


def test_calculate_cache_config():
    """HBM-utilization KV sizing (calculate_cache_config analog): budget
    fills free memory, clamps to [2*max_batch, full-length capacity]."""
    from mistralrs_tpu.kv.paged import calculate_cache_config
    from mistralrs_tpu.models.config import ModelConfig

    cfg = ModelConfig(
        arch="llama", vocab_size=1000, hidden_size=512, intermediate_size=1024,
        num_layers=4, num_heads=8, num_kv_heads=4, head_dim=64,
    )
    # bytes/slot = 2*4*4*64*2 = 4096; block 16 → 64 KiB/block
    n = calculate_cache_config(
        cfg, block_size=16, max_model_len=4096, max_batch=4,
        hbm_bytes=64 << 20, weight_bytes=0, utilization=1.0,
    )
    assert n == (64 << 20) // (64 << 10) - 1  # -1: trash block
    # clamped up to 2*max_batch when memory is tiny
    n = calculate_cache_config(
        cfg, block_size=16, max_model_len=4096, max_batch=4,
        hbm_bytes=1 << 16, weight_bytes=0,
    )
    assert n == 8
    # clamped down to full-length capacity when memory is huge
    n = calculate_cache_config(
        cfg, block_size=16, max_model_len=256, max_batch=2,
        hbm_bytes=1 << 40, weight_bytes=0,
    )
    assert n == (256 // 16) * 2
    # quantized KV fits more blocks than bf16 (codes halve; the packed
    # bf16 scale plane adds L*128*2 bytes/slot — cheap at real head_dims)
    n_q = calculate_cache_config(
        cfg, block_size=16, max_model_len=1 << 20, max_batch=64,
        hbm_bytes=64 << 20, weight_bytes=0, kv_quant=True, utilization=1.0,
    )
    n_f = calculate_cache_config(
        cfg, block_size=16, max_model_len=1 << 20, max_batch=64,
        hbm_bytes=64 << 20, weight_bytes=0, utilization=1.0,
    )
    # bytes/slot: bf16 = 2*L*n_kv*hd*2 = 4096; int8 = 2048 + L*128*2 = 3072
    assert n_f == (64 << 20) // (4096 * 16) - 1
    assert n_q == (64 << 20) // (3072 * 16) - 1
    # tp>1 widens the packed scale plane (SW = tp_shards × 128-lane rows);
    # sizing must use PagedKVCache.create's formula or mesh engines with
    # kv_quant over-allocate and OOM at startup
    from mistralrs_tpu.kv.paged import PagedKVCache

    n_q8 = calculate_cache_config(
        cfg, block_size=16, max_model_len=1 << 20, max_batch=64,
        hbm_bytes=64 << 20, weight_bytes=0, kv_quant=True, utilization=1.0,
        tp_shards=8,
    )
    # int8 @ tp=8: codes 2048 + L*8*128*2 = 2048 + 8192 = 10240 bytes/slot
    assert n_q8 == (64 << 20) // (10240 * 16) - 1
    pool = PagedKVCache.create(cfg, num_blocks=4, block_size=16,
                               kv_quant="int8", tp_shards=8)
    scale_bytes_per_slot = (
        cfg.num_layers * pool.kv_scale.shape[-1] * pool.kv_scale.dtype.itemsize
    )
    assert scale_bytes_per_slot == 8192


@pytest.mark.parametrize("kv_quant", ["int8", "fp8"])
def test_quantized_kv_kernel_matches_gather(kv_quant):
    """int8/fp8 pools + slot-major scales through the fused kernel vs the
    XLA gather reference (the analog of fp8 KV inside pagedattention_v2)."""
    from mistralrs_tpu.kv.paged import write_kv

    rng = np.random.default_rng(7)
    B, n_kv, group, hd, bs, W = 3, 2, 4, 64, 16, 8
    n_q = n_kv * group
    S_total = 17 * bs  # 16 blocks + trash
    store = jnp.int8 if kv_quant == "int8" else jnp.float8_e4m3fn
    kp = jnp.zeros((n_kv, S_total, hd), store)
    vp = jnp.zeros((n_kv, S_total, hd), store)
    kvs = jnp.zeros((S_total, 128), jnp.bfloat16)  # packed k|v scale lanes
    # populate every live slot through write_kv (XLA quantization path)
    T = 16 * bs
    k_rows = jnp.asarray(rng.standard_normal((T, n_kv, hd)), jnp.bfloat16)
    v_rows = jnp.asarray(rng.standard_normal((T, n_kv, hd)), jnp.bfloat16)
    slots = jnp.arange(T, dtype=jnp.int32)
    kp, vp, kvs = write_kv(kp, vp, k_rows, v_rows, slots, kvs)

    q = jnp.asarray(rng.standard_normal((B, n_q, hd)), jnp.bfloat16)
    bt = jnp.asarray(rng.integers(0, 15, (B, W)), jnp.int32)
    kv_lens = jnp.asarray([37, 5, W * bs], jnp.int32)
    out = paged_decode_attention(
        q, kp, vp, bt, kv_lens, 0, kvs, block_size=bs, interpret=True
    )
    kk, vv = gather_kv(kp, vp, bt, bs, kvs, dtype=jnp.float32)
    ref = sdpa(
        q[:, None].astype(jnp.float32), kk, vv,
        q_positions=(kv_lens - 1)[:, None], kv_len=kv_lens,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref[:, 0], np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_quantized_fused_write_matches_write_kv():
    """In-kernel quantize-on-write == the XLA write_kv quantization: codes,
    scales, and attention output all agree."""
    from mistralrs_tpu.kv.paged import write_kv
    from mistralrs_tpu.ops.paged_attention import paged_decode_attention_fused

    rng = np.random.default_rng(11)
    B, n_kv, group, hd, bs, W = 2, 2, 4, 64, 16, 4
    n_q = n_kv * group
    S_total = 9 * bs
    kp = jnp.zeros((n_kv, S_total, hd), jnp.int8)
    vp = jnp.zeros((n_kv, S_total, hd), jnp.int8)
    kvs = jnp.zeros((S_total, 128), jnp.bfloat16)  # packed k|v scale lanes
    T = 8 * bs
    k_rows = jnp.asarray(rng.standard_normal((T, n_kv, hd)), jnp.bfloat16)
    v_rows = jnp.asarray(rng.standard_normal((T, n_kv, hd)), jnp.bfloat16)
    kp, vp, kvs = write_kv(kp, vp, k_rows, v_rows,
                           jnp.arange(T, dtype=jnp.int32), kvs)

    q = jnp.asarray(rng.standard_normal((B, n_q, hd)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((B, n_kv, hd)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((B, n_kv, hd)), jnp.bfloat16)
    bt = jnp.asarray([[0, 1, 2, 3], [4, 5, 6, 7]], jnp.int32)
    slots = jnp.asarray([1 * bs + 4, -1], jnp.int32)
    kv_lens = jnp.asarray([21, 33], jnp.int32)

    out_f, kp_f, vp_f, kvs_f = paged_decode_attention_fused(
        q, kp, vp, k_new, v_new, slots, bt, kv_lens, 0, 0, kvs,
        block_size=bs, interpret=True,
    )
    kp2, vp2, kvs2 = write_kv(kp, vp, k_new, v_new, slots, kvs)
    out_r = paged_decode_attention(
        q, kp2, vp2, bt, kv_lens, 0, kvs2, block_size=bs, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out_f, np.float32), np.asarray(out_r, np.float32),
        rtol=2e-2, atol=2e-2,
    )
    np.testing.assert_array_equal(
        np.asarray(kp_f[:, :-1]), np.asarray(kp2[:, :-1])
    )
    np.testing.assert_allclose(
        np.asarray(kvs_f[:-1], np.float32), np.asarray(kvs2[:-1], np.float32),
        rtol=1e-6, atol=1e-8,
    )


def test_softcap_kernel_matches_sdpa():
    """Attn-logit softcap (gemma2) inside the kernel vs the sdpa reference."""
    rng = np.random.default_rng(5)
    B, n_kv, group, hd, bs, W = 2, 2, 2, 64, 16, 6
    n_q = n_kv * group
    S_total = 12 * bs
    kp = jnp.asarray(rng.standard_normal((n_kv, S_total, hd)) * 3, jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((n_kv, S_total, hd)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, n_q, hd)) * 3, jnp.bfloat16)
    bt = jnp.asarray(rng.integers(0, 11, (B, W)), jnp.int32)
    kv_lens = jnp.asarray([41, W * bs], jnp.int32)
    out = paged_decode_attention(
        q, kp, vp, bt, kv_lens, 0, block_size=bs, interpret=True, softcap=30.0
    )
    kk, vv = gather_kv(kp, vp, bt, bs, dtype=jnp.float32)
    ref = sdpa(
        q[:, None].astype(jnp.float32), kk, vv,
        q_positions=(kv_lens - 1)[:, None], kv_len=kv_lens, logit_softcap=30.0,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref[:, 0], np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_sinks_kernel_matches_sdpa():
    """gpt_oss attention sinks: flash-form seeding (m0=sink, l0=1) vs the
    sdpa concat-then-drop reference."""
    rng = np.random.default_rng(6)
    B, n_kv, group, hd, bs, W = 2, 2, 4, 64, 16, 6
    n_q = n_kv * group
    S_total = 12 * bs
    kp = jnp.asarray(rng.standard_normal((n_kv, S_total, hd)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((n_kv, S_total, hd)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, n_q, hd)), jnp.bfloat16)
    sinks = jnp.asarray(rng.standard_normal(n_q) * 2, jnp.float32)
    bt = jnp.asarray(rng.integers(0, 11, (B, W)), jnp.int32)
    kv_lens = jnp.asarray([7, 53], jnp.int32)
    from mistralrs_tpu.ops.paged_attention import paged_decode_attention_fused

    outs = paged_decode_attention_fused(
        q, kp, vp,
        jnp.zeros((B, n_kv, hd), jnp.bfloat16),
        jnp.zeros((B, n_kv, hd), jnp.bfloat16),
        jnp.full((B,), -1, jnp.int32), bt, kv_lens, 0, 0, None, sinks,
        block_size=bs, interpret=True,
    )
    kk, vv = gather_kv(kp, vp, bt, bs, dtype=jnp.float32)
    ref = sdpa(
        q[:, None].astype(jnp.float32), kk, vv,
        q_positions=(kv_lens - 1)[:, None], kv_len=kv_lens, sinks=sinks,
    )
    np.testing.assert_allclose(
        np.asarray(outs[0], np.float32), np.asarray(ref[:, 0], np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_padded_head_dim_pool_matches_unpadded():
    """hd=64 pools padded to 128 lanes (auto_head_dim_pad): kernel over the
    padded pool == sdpa over the unpadded KV (zeros add nothing)."""
    rng = np.random.default_rng(8)
    B, n_kv, group, hd, hd_p, bs, W = 2, 2, 4, 64, 128, 16, 6
    n_q = n_kv * group
    S_total = 12 * bs
    kp = jnp.asarray(rng.standard_normal((n_kv, S_total, hd)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((n_kv, S_total, hd)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, n_q, hd)), jnp.bfloat16)
    pad = ((0, 0), (0, 0), (0, hd_p - hd))
    kp_p, vp_p = jnp.pad(kp, pad), jnp.pad(vp, pad)
    q_p = jnp.pad(q, ((0, 0), (0, 0), (0, hd_p - hd)))
    bt = jnp.asarray(rng.integers(0, 11, (B, W)), jnp.int32)
    kv_lens = jnp.asarray([41, 86], jnp.int32)
    out = paged_decode_attention(
        q_p, kp_p, vp_p, bt, kv_lens, 0, block_size=bs, interpret=True,
        scale=hd**-0.5,
    )[..., :hd]
    kk, vv = gather_kv(kp, vp, bt, bs, dtype=jnp.float32)
    ref = sdpa(
        q[:, None].astype(jnp.float32), kk, vv,
        q_positions=(kv_lens - 1)[:, None], kv_len=kv_lens,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref[:, 0], np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_engine_padded_pool_outputs_identical(monkeypatch, tmp_path):
    """MRSTPU_PA_PAD_HD forces the padded-pool path through the ENGINE
    (gather route on CPU): outputs must match the unpadded engine."""
    import jax
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.config import ModelConfig
    from mistralrs_tpu.models.hf_loader import weights_from_state_dict

    cfg = ModelConfig(
        arch="llama", vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        max_position_embeddings=256,
    )
    rng = np.random.default_rng(0)
    r = lambda *s: rng.standard_normal(s, dtype=np.float32) * 0.05
    sd = {"model.embed_tokens.weight": r(256, 64),
          "model.norm.weight": np.ones(64, np.float32),
          "lm_head.weight": r(256, 64)}
    for i in range(2):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(64, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(64, np.float32)
        sd[p + "self_attn.q_proj.weight"] = r(64, 64)
        sd[p + "self_attn.k_proj.weight"] = r(32, 64)
        sd[p + "self_attn.v_proj.weight"] = r(32, 64)
        sd[p + "self_attn.o_proj.weight"] = r(64, 64)
        sd[p + "mlp.gate_proj.weight"] = r(128, 64)
        sd[p + "mlp.up_proj.weight"] = r(128, 64)
        sd[p + "mlp.down_proj.weight"] = r(64, 128)
    w = weights_from_state_dict(sd, cfg, dtype=jnp.float32)

    def run():
        eng = Engine(cfg, dict(w), num_blocks=32, block_size=16, max_batch=2,
                     backend="xla", compute_dtype=jnp.float32)
        seqs = [eng.add_request([1, 5, 9, 20, 7],
                                SamplingParams(temperature=0.0, max_tokens=10))]
        eng.run_to_completion()
        return seqs[0].output_ids, eng

    ref, eng0 = run()
    assert eng0.cache.head_dim == cfg.head_dim
    monkeypatch.setenv("MRSTPU_PA_PAD_HD", "32")
    got, eng1 = run()
    assert eng1.cache.head_dim == 32
    assert got == ref


def test_dead_batch_rows_kv_len_zero():
    """Empty decode slots (kv_len=0, slot=-1, zero block tables — exactly
    what Engine._run_decode feeds for unoccupied batch rows) must not fetch
    chunk 0: with n_chunks == 0 the flash loop never waits, and the leaked
    DMA semaphores abort on real hardware (caught live on v5e; the engine
    crashed on any partially-filled decode batch). Live rows must still
    match the separate write+attend reference."""
    from mistralrs_tpu.kv.paged import write_kv
    from mistralrs_tpu.ops.paged_attention import (
        paged_decode_attention, paged_decode_attention_fused,
    )

    rng = np.random.default_rng(5)
    B, n_kv, group, hd, bs, W = 4, 2, 4, 64, 16, 4
    n_q = n_kv * group
    S_total = 9 * bs  # 8 blocks + trash
    kp = jnp.asarray(rng.standard_normal((n_kv, S_total, hd)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((n_kv, S_total, hd)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, n_q, hd)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((B, n_kv, hd)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((B, n_kv, hd)), jnp.bfloat16)
    bt = np.zeros((B, W), np.int32)
    bt[0] = [0, 1, 2, 3]
    bt = jnp.asarray(bt)
    # row 0 live; rows 1-3 dead (engine fill values)
    slots = jnp.asarray([1 * bs + 4, -1, -1, -1], jnp.int32)
    kv_lens = jnp.asarray([21, 0, 0, 0], jnp.int32)

    out_f, kp_f, vp_f = paged_decode_attention_fused(
        q, kp, vp, k_new, v_new, slots, bt, kv_lens, 0,
        block_size=bs, interpret=True,
    )
    kp2, vp2, _ = write_kv(kp, vp, k_new[:1], v_new[:1], slots[:1])
    out_r = paged_decode_attention(
        q[:1], kp2, vp2, bt[:1], kv_lens[:1], 0, block_size=bs,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_f[:1], np.float32), np.asarray(out_r, np.float32),
        rtol=2e-2, atol=2e-2,
    )
    assert np.all(np.isfinite(np.asarray(out_f, np.float32)))


# ---------------------------------------------------------------------------
# paged flash prefill/verify kernel (t > 1) vs the gather+sdpa reference
# ---------------------------------------------------------------------------


def _prefill_case(
    B=2, T=12, n_kv=2, group=2, hd=128, bs=16, n_blocks=24,
    ctx=(37, 5), nv=None, quant=None, window=0, softcap=0.0,
    sinks=False, q_tile=None, chunk=None, drop_row=None, seed=0,
):
    """Build a pool with ctx tokens written, run the prefill kernel over a
    T-token chunk, and compare output + resulting pool state against the
    write_kv + gather_kv + sdpa reference."""
    from mistralrs_tpu.kv.paged import write_kv
    from mistralrs_tpu.ops.paged_attention import (
        paged_prefill_attention_fused,
    )

    rng = np.random.default_rng(seed)
    n_q = n_kv * group
    S = (n_blocks + 1) * bs
    if quant:
        store = jnp.int8 if quant == "int8" else jnp.float8_e4m3fn
        kp = jnp.zeros((n_kv, S, hd), store)
        vp = jnp.zeros((n_kv, S, hd), store)
        ks = jnp.zeros((S, 128), jnp.bfloat16)
    else:
        kp = jnp.zeros((n_kv, S, hd), jnp.bfloat16)
        vp = jnp.zeros((n_kv, S, hd), jnp.bfloat16)
        ks = None
    nv = nv or [T] * B
    width = max((c + t + bs - 1) // bs for c, t in zip(ctx, nv)) + 1
    bt = np.zeros((B, width), np.int32)
    nxt = 0
    for b in range(B):
        need = (ctx[b] + nv[b] + bs - 1) // bs
        bt[b, :need] = np.arange(nxt, nxt + need)
        nxt += need
    assert nxt <= n_blocks
    for b in range(B):  # past context through the reference write path
        c = ctx[b]
        if c == 0:
            continue
        kc = jnp.asarray(rng.standard_normal((c, n_kv, hd)), jnp.bfloat16)
        vc = jnp.asarray(rng.standard_normal((c, n_kv, hd)), jnp.bfloat16)
        pos = np.arange(c)
        slots = bt[b][pos // bs] * bs + pos % bs
        kp, vp, ks = write_kv(kp, vp, kc, vc, jnp.asarray(slots), ks)
    q = jnp.asarray(rng.standard_normal((B, T, n_q, hd)), jnp.bfloat16)
    k_new = jnp.asarray(rng.standard_normal((B, T, n_kv, hd)), jnp.bfloat16)
    v_new = jnp.asarray(rng.standard_normal((B, T, n_kv, hd)), jnp.bfloat16)
    slot_map = np.full((B, T), -1, np.int64)
    kv_lens = np.zeros((B,), np.int32)
    for b in range(B):
        pos = np.arange(ctx[b], ctx[b] + nv[b])
        if drop_row is None or b != drop_row:
            slot_map[b, :nv[b]] = bt[b][pos // bs] * bs + pos % bs
        kv_lens[b] = ctx[b] + nv[b]
    sk = (
        jnp.asarray(rng.standard_normal((n_q,)), jnp.float32)
        if sinks else None
    )

    kp_r, vp_r, ks_r = kp, vp, ks  # reference: write then gather + sdpa
    for b in range(B):
        if drop_row is not None and b == drop_row:
            continue  # dropped rows write nothing
        m = slot_map[b, :nv[b]]
        kp_r, vp_r, ks_r = write_kv(
            kp_r, vp_r, k_new[b, :nv[b]], v_new[b, :nv[b]],
            jnp.asarray(m), ks_r)
    kk, vv = gather_kv(kp_r, vp_r, jnp.asarray(bt), bs, ks_r)
    positions = np.stack(
        [np.arange(ctx[b], ctx[b] + T) for b in range(B)])
    ref = sdpa(
        q, kk, vv, q_positions=jnp.asarray(positions),
        kv_len=jnp.asarray(kv_lens), logit_softcap=softcap or None,
        sliding_window=window if window else None, sinks=sk)

    outs = paged_prefill_attention_fused(
        q, kp, vp, k_new, v_new, jnp.asarray(slot_map, jnp.int32),
        jnp.asarray(bt), jnp.asarray(kv_lens), jnp.asarray(nv, jnp.int32),
        window, 0, ks, sk, block_size=bs, q_tile=q_tile, chunk=chunk,
        interpret=True, softcap=softcap)
    out, kp_o, vp_o = outs[:3]
    ks_o = outs[3] if quant else None

    for b in range(B):  # valid rows only; dropped rows' outputs are unused
        if drop_row is not None and b == drop_row:
            continue
        np.testing.assert_allclose(
            np.asarray(out[b, :nv[b]], np.float32),
            np.asarray(ref[b, :nv[b]], np.float32),
            rtol=3e-2, atol=3e-2)
    # pool state: codes may differ by 1 at exact round-half boundaries
    # (1-ulp division difference between paths); dequantized values match
    live = S - bs  # exclude the trash block (reference scatters -1 there)
    for a_o, a_r in ((kp_o, kp_r), (vp_o, vp_r)):
        d = np.abs(np.asarray(a_o[:, :live], np.float32)
                   - np.asarray(a_r[:, :live], np.float32))
        if quant == "int8":
            assert d.max() <= 1.0 + 1e-6
        elif quant == "fp8":
            # one e4m3 mantissa step (1/8 relative) of headroom
            assert (d / np.maximum(
                np.abs(np.asarray(a_r[:, :live], np.float32)), 1.0)
            ).max() <= 0.13
        else:
            assert d.max() < 1e-6
    if quant:
        np.testing.assert_allclose(
            np.asarray(ks_o[:live], np.float32),
            np.asarray(ks_r[:live], np.float32), rtol=1e-2, atol=1e-3)


def test_prefill_kernel_basic():
    _prefill_case()


def test_prefill_kernel_verify_shape():
    """Speculative-verify shape: tiny T with one seq mid-stream, one fresh."""
    _prefill_case(T=5, ctx=(64, 0))


def test_prefill_kernel_multi_tile_ragged():
    """Several q tiles per sequence, ragged n_valid, forced small tiles."""
    _prefill_case(T=48, ctx=(16, 33), nv=[48, 31], q_tile=16, chunk=1)


@pytest.mark.parametrize("quant", ["int8", "fp8"])
def test_prefill_kernel_quantized(quant):
    _prefill_case(quant=quant)
    _prefill_case(quant=quant, T=40, ctx=(53, 9), nv=[40, 17], q_tile=16)


def test_prefill_kernel_window():
    _prefill_case(window=24, ctx=(70, 70), T=16)
    _prefill_case(window=8, ctx=(100, 3), T=24, q_tile=8)  # walk-skip path


def test_prefill_kernel_softcap_sinks():
    _prefill_case(softcap=30.0)
    _prefill_case(sinks=True)


def test_prefill_kernel_dropped_row():
    """A row with slot −1 (inactive verify slot) writes nothing."""
    _prefill_case(drop_row=1)


def test_prefill_kernel_first_chunk():
    """ctx == 0: pure first-chunk prefill, self-attention only."""
    _prefill_case(T=33, ctx=(0, 0), nv=[33, 20])


def test_prefill_kernel_long_chunk():
    """T=512 through multiple auto-picked tiles (the bench shape)."""
    _prefill_case(B=1, T=512, ctx=(96,), n_blocks=48, q_tile=128, chunk=2)


def test_prefill_kernel_unaligned_start():
    """Chunk starts mid-block (r_a > 0) and ends mid-block."""
    _prefill_case(T=21, ctx=(11, 27), nv=[21, 13])
