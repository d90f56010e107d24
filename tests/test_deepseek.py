"""DeepSeek V3 MLA + MoE logit parity vs HF torch (tiny random model)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mistralrs_tpu.models.deepseek import (
    DeepseekConfig,
    deepseek_forward,
    deepseek_weights_from_state_dict,
    make_cache,
)


def test_deepseek_v3_parity():
    hf_cfg = transformers.DeepseekV3Config(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=32, kv_lora_rank=16, qk_rope_head_dim=8,
        qk_nope_head_dim=16, v_head_dim=16,
        n_routed_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        first_k_dense_replace=1, n_shared_experts=1, n_group=1, topk_group=1,
        routed_scaling_factor=1.5, norm_topk_prob=True,
        max_position_embeddings=64,
    )
    torch.manual_seed(0)
    model = transformers.DeepseekV3ForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy().astype(np.float32) for k, v in model.state_dict().items()}
    cfg = DeepseekConfig.from_hf(hf_cfg.to_dict())
    weights = deepseek_weights_from_state_dict(sd, cfg)

    ids = np.array([[1, 7, 23, 50, 9, 3]], np.int64)
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()

    b, t = ids.shape
    cache = make_cache(cfg, b, t + 2)
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t)).astype(jnp.int32)
    got, _ = deepseek_forward(
        weights, cfg, jnp.asarray(ids, jnp.int32), positions, cache,
        jnp.zeros((b,), jnp.int32), backend="xla",
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)


def test_deepseek_incremental_decode():
    hf_cfg = transformers.DeepseekV3Config(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=None, kv_lora_rank=16, qk_rope_head_dim=8,
        qk_nope_head_dim=16, v_head_dim=16,
        n_routed_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        first_k_dense_replace=1, n_shared_experts=1, n_group=1, topk_group=1,
        max_position_embeddings=64,
    )
    torch.manual_seed(1)
    model = transformers.DeepseekV3ForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy().astype(np.float32) for k, v in model.state_dict().items()}
    cfg = DeepseekConfig.from_hf(hf_cfg.to_dict())
    weights = deepseek_weights_from_state_dict(sd, cfg)
    ids = np.array([[1, 7, 23, 50]], np.int64)
    b, t = ids.shape
    # full prefill
    cache = make_cache(cfg, b, t + 2)
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t)).astype(jnp.int32)
    full, _ = deepseek_forward(
        weights, cfg, jnp.asarray(ids, jnp.int32), pos, cache,
        jnp.zeros((b,), jnp.int32), backend="xla",
    )
    # prefill 3 + decode 1
    cache = make_cache(cfg, b, t + 2)
    lg, cache = deepseek_forward(
        weights, cfg, jnp.asarray(ids[:, :3], jnp.int32),
        jnp.arange(3)[None].astype(jnp.int32), cache,
        jnp.zeros((b,), jnp.int32), backend="xla",
    )
    lg2, _ = deepseek_forward(
        weights, cfg, jnp.asarray(ids[:, 3:4], jnp.int32),
        jnp.asarray([[3]], jnp.int32), cache, jnp.asarray([3], jnp.int32),
        backend="xla",
    )
    np.testing.assert_allclose(
        np.asarray(lg2)[:, -1], np.asarray(full)[:, -1], rtol=1e-4, atol=1e-4
    )


def test_deepseek_absorbed_cache_matches_full():
    """Absorbed (compressed-latent) MLA cache reproduces full-KV logits and
    incremental decode, with a rank+rope-sized cache."""
    hf_cfg = transformers.DeepseekV3Config(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=32, kv_lora_rank=16, qk_rope_head_dim=8,
        qk_nope_head_dim=16, v_head_dim=16,
        n_routed_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        first_k_dense_replace=1, n_shared_experts=1, n_group=1, topk_group=1,
        routed_scaling_factor=1.5, norm_topk_prob=True,
        max_position_embeddings=64,
    )
    torch.manual_seed(3)
    model = transformers.DeepseekV3ForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    cfg = DeepseekConfig.from_hf(hf_cfg.to_dict())
    w_full = deepseek_weights_from_state_dict(sd, cfg)
    w_abs = deepseek_weights_from_state_dict(sd, cfg, absorbed=True)

    ids = np.array([[1, 7, 23, 50, 9, 3]], np.int32)
    b, t = ids.shape
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t)).astype(jnp.int32)

    full, _ = deepseek_forward(
        w_full, cfg, jnp.asarray(ids), positions, make_cache(cfg, b, t + 4),
        jnp.zeros((b,), jnp.int32), backend="xla",
    )
    cache_a = make_cache(cfg, b, t + 4, absorbed=True)
    # cache is rank+rope per token, not heads*dims
    assert cache_a["moe"][0].shape[-1] == cfg.kv_lora_rank
    assert cache_a["moe"][1].shape[-1] == cfg.qk_rope_head_dim
    absd, cache_a = deepseek_forward(
        w_abs, cfg, jnp.asarray(ids), positions, cache_a,
        jnp.zeros((b,), jnp.int32), backend="xla", absorbed=True,
    )
    np.testing.assert_allclose(np.asarray(absd), np.asarray(full),
                               rtol=2e-4, atol=2e-4)

    # incremental decode over the compressed cache
    nxt = int(np.asarray(absd)[0, -1].argmax())
    pos2 = jnp.asarray([[t]], jnp.int32)
    step_abs, _ = deepseek_forward(
        w_abs, cfg, jnp.asarray([[nxt]], jnp.int32), pos2, cache_a,
        jnp.asarray([t], jnp.int32), backend="xla", absorbed=True,
    )
    ids2 = np.concatenate([ids, [[nxt]]], axis=1)
    pos_f = jnp.broadcast_to(jnp.arange(t + 1)[None], (b, t + 1)).astype(jnp.int32)
    full2, _ = deepseek_forward(
        w_full, cfg, jnp.asarray(ids2), pos_f, make_cache(cfg, b, t + 4),
        jnp.zeros((b,), jnp.int32), backend="xla",
    )
    np.testing.assert_allclose(
        np.asarray(step_abs)[0, -1], np.asarray(full2)[0, -1],
        rtol=2e-4, atol=2e-4,
    )


def test_mla_decode_kernel_parity():
    """The fused Pallas MLA decode kernel (interpret mode) matches the XLA
    gather path: same attention output AND same pool contents after the
    fused write — including a dropped (slot < 0) write and a multi-chunk
    walk where the write block lands in the last chunk."""
    from mistralrs_tpu.ops.mla_attention import mla_decode_fused

    rng = np.random.default_rng(7)
    B, NH, RANK, ROPE, BS, L = 3, 4, 128, 16, 16, 2
    D = RANK + ROPE
    D_PAD = 256
    NBLK = 12
    S = (NBLK + 1) * BS
    W = 4  # blocks per sequence

    pool = np.zeros((L, S, D_PAD), np.float32)
    bt = np.zeros((B, W), np.int32)
    kv_lens = np.array([37, 64, 1], np.int32)  # incl. this step's token
    used = 1
    for b in range(B):
        for w in range(W):
            bt[b, w] = used
            used += 1
    for b in range(B):
        n = kv_lens[b] - 1  # existing context
        rows = rng.standard_normal((n, D)).astype(np.float32) * 0.3
        for i in range(n):
            slot = bt[b, i // BS] * BS + i % BS
            pool[:, slot, :D] = rows[i]
    slots = np.array([
        bt[0, (kv_lens[0] - 1) // BS] * BS + (kv_lens[0] - 1) % BS,
        -1,  # dropped -> trash row
        bt[2, 0] * BS + 0,
    ], np.int32)
    q = rng.standard_normal((B, NH, D)).astype(np.float32) * 0.5
    qp = np.zeros((B, NH, D_PAD), np.float32)
    qp[..., :D] = q
    new_rows = rng.standard_normal((B, D)).astype(np.float32) * 0.3
    rp = np.zeros((B, D_PAD), np.float32)
    rp[..., :D] = new_rows
    scale = 0.17

    for layer in range(L):
        out_k, pool_k = mla_decode_fused(
            jnp.asarray(qp), jnp.asarray(pool), jnp.asarray(rp),
            jnp.asarray(slots), jnp.asarray(bt), jnp.asarray(kv_lens),
            layer, rank=RANK, block_size=BS, scale=scale, chunk=2,
            interpret=True,
        )
        # reference: explicit write + masked softmax attention
        ref_pool = pool.copy()
        for b in range(B):
            s = slots[b] if slots[b] >= 0 else S - 1
            ref_pool[layer, s] = rp[b]
        outs = []
        for b in range(B):
            gather = (bt[b][:, None] * BS + np.arange(BS)[None]).reshape(-1)
            keys = ref_pool[layer][gather]  # [W*BS, D_PAD]
            sc = (qp[b] @ keys.T) * scale
            sc[:, kv_lens[b]:] = -np.inf
            p = np.exp(sc - sc.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            outs.append(p @ keys[:, :RANK])
        np.testing.assert_allclose(
            np.asarray(out_k), np.stack(outs), rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(pool_k)[layer], ref_pool[layer], atol=1e-6
        )
        # untouched layers stay intact
        other = [i for i in range(L) if i != layer]
        np.testing.assert_allclose(
            np.asarray(pool_k)[other], pool[other], atol=1e-6
        )
