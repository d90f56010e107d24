"""Multi-architecture logit parity vs HF torch reference models (tiny random
configs, CPU): qwen2 (attn biases), qwen3 (qk-norm), gemma2 (pre/post norms,
softcaps, sliding window, attn scale), phi3 (fused qkv/gate_up), mixtral
(MoE). The arch-coverage analog of the reference's 33-arch model zoo tests."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mistralrs_tpu.models.config import config_from_hf
from mistralrs_tpu.models.hf_loader import weights_from_state_dict
from mistralrs_tpu.models.llama import KVCache, forward

RTOL = ATOL = 3e-4


def _np_state_dict(model):
    return {k: v.detach().numpy().astype(np.float32) for k, v in model.state_dict().items()}


def _compare(hf_cfg, model, arch_name, ids=None):
    cfg = config_from_hf(hf_cfg.to_dict() | {"architectures": [arch_name]})
    weights = weights_from_state_dict(_np_state_dict(model), cfg, dtype=jnp.float32)
    if ids is None:
        ids = np.array([[1, 7, 23, 50, 9, 3, 17, 2]], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    b, t = ids.shape
    cache = KVCache.create(cfg, b, t + 4, dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t)).astype(jnp.int32)
    got, _ = forward(
        weights, cfg, jnp.asarray(ids), positions, cache,
        jnp.zeros((b,), jnp.int32), backend="xla", compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=RTOL, atol=ATOL)


def test_qwen2():
    hf_cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    _compare(hf_cfg, model, "Qwen2ForCausalLM")


def test_qwen3():
    hf_cfg = transformers.Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    model = transformers.Qwen3ForCausalLM(hf_cfg).eval()
    _compare(hf_cfg, model, "Qwen3ForCausalLM")


def test_gemma2():
    hf_cfg = transformers.Gemma2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, sliding_window=4,
        query_pre_attn_scalar=16, final_logit_softcapping=30.0,
        attn_logit_softcapping=50.0, hidden_activation="gelu_pytorch_tanh",
    )
    torch.manual_seed(2)
    model = transformers.Gemma2ForCausalLM(hf_cfg).eval()
    _compare(hf_cfg, model, "Gemma2ForCausalLM")


def test_phi3():
    hf_cfg = transformers.Phi3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(3)
    model = transformers.Phi3ForCausalLM(hf_cfg).eval()
    _compare(hf_cfg, model, "Phi3ForCausalLM")


def test_mixtral():
    hf_cfg = transformers.MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    torch.manual_seed(4)
    model = transformers.MixtralForCausalLM(hf_cfg).eval()
    _compare(hf_cfg, model, "MixtralForCausalLM")


def test_starcoder2():
    hf_cfg = transformers.Starcoder2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, use_bias=True,
    )
    torch.manual_seed(5)
    model = transformers.Starcoder2ForCausalLM(hf_cfg).eval()
    _compare(hf_cfg, model, "Starcoder2ForCausalLM")


def test_gemma3():
    hf_cfg = transformers.Gemma3TextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, sliding_window=4,
        query_pre_attn_scalar=16, rope_theta=1000000.0,
        rope_local_base_freq=10000.0, sliding_window_pattern=2,
    )
    torch.manual_seed(6)
    model = transformers.Gemma3ForCausalLM(hf_cfg).eval()
    _compare(hf_cfg, model, "Gemma3ForCausalLM")


def test_smollm3_nope_layers():
    hf_cfg = transformers.SmolLM3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
        no_rope_layer_interval=4, pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(7)
    model = transformers.SmolLM3ForCausalLM(hf_cfg).eval()
    _compare(hf_cfg, model, "SmolLM3ForCausalLM")


def test_qwen3moe():
    hf_cfg = transformers.Qwen3MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=32, norm_topk_prob=True,
        max_position_embeddings=128, tie_word_embeddings=False,
        decoder_sparse_step=1, mlp_only_layers=[],
    )
    torch.manual_seed(8)
    model = transformers.Qwen3MoeForCausalLM(hf_cfg).eval()
    _compare(hf_cfg, model, "Qwen3MoeForCausalLM")


def test_gemma1():
    hf_cfg = transformers.GemmaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128,
    )
    torch.manual_seed(9)
    model = transformers.GemmaForCausalLM(hf_cfg).eval()
    _compare(hf_cfg, model, "GemmaForCausalLM")


def test_phi2():
    """phi2: parallel attn+MLP residual, partial rotary, LayerNorm biases,
    lm_head bias (reference: `mistralrs-core/src/models/phi2.rs`)."""
    hf_cfg = transformers.PhiConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        partial_rotary_factor=0.5, max_position_embeddings=128,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(10)
    model = transformers.PhiForCausalLM(hf_cfg).eval()
    _compare(hf_cfg, model, "PhiForCausalLM")


def test_glm4():
    """glm4: interleaved partial rotary, sandwich norms, fused gate_up
    (reference: `mistralrs-core/src/models/glm4.rs`)."""
    hf_cfg = transformers.Glm4Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, pad_token_id=0,
        attention_bias=True,
    )
    torch.manual_seed(11)
    model = transformers.Glm4ForCausalLM(hf_cfg).eval()
    _compare(hf_cfg, model, "Glm4ForCausalLM")


def test_glm():
    hf_cfg = transformers.GlmConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, pad_token_id=0,
    )
    torch.manual_seed(12)
    model = transformers.GlmForCausalLM(hf_cfg).eval()
    _compare(hf_cfg, model, "GlmForCausalLM")


def test_granite():
    """granite: embedding/residual/attention multipliers + logits scaling."""
    hf_cfg = transformers.GraniteConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
        embedding_multiplier=2.0, residual_multiplier=0.5,
        logits_scaling=3.0, attention_multiplier=0.1,
    )
    torch.manual_seed(13)
    model = transformers.GraniteForCausalLM(hf_cfg).eval()
    _compare(hf_cfg, model, "GraniteForCausalLM")


def test_qwen2moe():
    """qwen2moe: softmax-then-topk routing + sigmoid-gated shared expert."""
    hf_cfg = transformers.Qwen2MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        shared_expert_intermediate_size=64, decoder_sparse_step=1,
        mlp_only_layers=[], norm_topk_prob=False,
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    torch.manual_seed(14)
    model = transformers.Qwen2MoeForCausalLM(hf_cfg).eval()
    _compare(hf_cfg, model, "Qwen2MoeForCausalLM")


def test_gpt_oss():
    """gpt_oss: attention sinks, alternating sliding window, YaRN mscale,
    clamped-swiglu MoE with fused interleaved gate_up + biases."""
    hf_cfg = transformers.GptOssConfig(
        vocab_size=128, hidden_size=64, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_local_experts=4, num_experts_per_tok=2,
        sliding_window=4, max_position_embeddings=128,
        pad_token_id=0, tie_word_embeddings=False,
        layer_types=["sliding_attention", "full_attention"],
        rope_scaling={"rope_type": "yarn", "factor": 8.0, "beta_fast": 32.0,
                      "beta_slow": 1.0, "truncate": False,
                      "original_max_position_embeddings": 64},
    )
    torch.manual_seed(15)
    model = transformers.GptOssForCausalLM(hf_cfg).eval()
    _compare(hf_cfg, model, "GptOssForCausalLM")


def test_hunyuan_dense():
    """hunyuan: per-head q/k RMSNorm applied AFTER rotary."""
    hf_cfg = transformers.HunYuanDenseV1Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(16)
    model = transformers.HunYuanDenseV1ForCausalLM(hf_cfg).eval()
    _compare(hf_cfg, model, "HunYuanDenseV1ForCausalLM")


def test_glm4moe():
    """glm4moe: glm attention + deepseek-v3 noaux-tc routing, dense-prefix
    layer segment, shared experts, group-limited top-k."""
    hf_cfg = transformers.Glm4MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, pad_token_id=0,
        n_routed_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
        n_shared_experts=1, first_k_dense_replace=1, n_group=2, topk_group=1,
        routed_scaling_factor=1.5, norm_topk_prob=True, use_qk_norm=True,
        tie_word_embeddings=False,
    )
    torch.manual_seed(17)
    model = transformers.Glm4MoeForCausalLM(hf_cfg).eval()
    _compare(hf_cfg, model, "Glm4MoeForCausalLM")


def test_hunyuan_moe():
    """hunyuan_moe: post-rope q/k norm + mixtral-style routing +
    unconditional shared MLP."""
    hf_cfg = transformers.HunYuanMoEV1Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, tie_word_embeddings=False,
        num_experts=4, moe_topk=2, pad_token_id=0, bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(18)
    model = transformers.HunYuanMoEV1ForCausalLM(hf_cfg).eval()
    _compare(hf_cfg, model, "HunYuanMoEV1ForCausalLM")


def test_stablelm():
    """stablelm: partial rotary + biased LayerNorms."""
    hf_cfg = transformers.StableLmConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.5, max_position_embeddings=128,
        tie_word_embeddings=False, pad_token_id=0,
    )
    torch.manual_seed(19)
    model = transformers.StableLmForCausalLM(hf_cfg).eval()
    _compare(hf_cfg, model, "StableLmForCausalLM")


def test_cohere():
    """cohere: parallel attn+MLP residual, interleaved rope, bias-free
    LayerNorm, logit_scale multiplier, tied embeddings."""
    hf_cfg = transformers.CohereConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, logit_scale=0.25, pad_token_id=0,
    )
    torch.manual_seed(20)
    model = transformers.CohereForCausalLM(hf_cfg).eval()
    _compare(hf_cfg, model, "CohereForCausalLM")


def test_phimoe():
    """phi-3.5-MoE: LayerNorm (with bias) norms, lm_head bias, sparsemixer
    top-2 routing (threshold-masked argmax rounds, softmax multipliers)."""
    from transformers.models.phimoe.configuration_phimoe import PhimoeConfig
    from transformers.models.phimoe.modeling_phimoe import PhimoeForCausalLM

    hf_cfg = PhimoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, tie_word_embeddings=False,
        attention_bias=True, lm_head_bias=True, rope_theta=10000.0,
        sliding_window=None, router_jitter_noise=0.01,
    )
    torch.manual_seed(240)
    model = PhimoeForCausalLM(hf_cfg).eval()
    _compare(hf_cfg, model, "PhimoeForCausalLM")
