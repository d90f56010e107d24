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
