"""Qwen3.5 (reference-spec, no HF class): hybrid GDN text with dense MLPs
+ Qwen3-VL DeepStack tower, served via the Qwen3NextAdapter's
embeds/M-RoPE/DeepStack path."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from mistralrs_tpu.models.qwen3_5 import (
    Qwen35Config,
    num_image_tokens,
    prepare_multimodal_prompt,
    qwen3_5_weights_from_state_dict,
)


def _tiny():
    rng = np.random.default_rng(60)
    hf_cfg = {
        "text_config": {
            "vocab_size": 160, "hidden_size": 48, "intermediate_size": 96,
            "num_hidden_layers": 4, "num_attention_heads": 4,
            "num_key_value_heads": 2, "head_dim": 16,
            "max_position_embeddings": 128, "rms_norm_eps": 1e-6,
            "full_attention_interval": 2,
            "linear_conv_kernel_dim": 3, "linear_key_head_dim": 8,
            "linear_value_head_dim": 8, "linear_num_key_heads": 2,
            "linear_num_value_heads": 4,
            "rope_parameters": {"rope_theta": 10000.0,
                                "mrope_section": [1, 1, 0],
                                "partial_rotary_factor": 0.25},
        },
        "vision_config": {
            "depth": 2, "hidden_size": 32, "intermediate_size": 64,
            "num_heads": 4, "patch_size": 8, "temporal_patch_size": 2,
            "spatial_merge_size": 2, "out_hidden_size": 48,
            "num_position_embeddings": 16, "deepstack_visual_indexes": [0],
        },
        "image_token_id": 150,
    }
    cfg = Qwen35Config.from_hf(hf_cfg)
    assert cfg.text.layer_types == (
        "linear_attention", "full_attention",
        "linear_attention", "full_attention",
    )
    assert cfg.text.num_experts == 0
    assert cfg.text.mrope_section == (1, 1, 0)

    def r(*shape):
        return (rng.standard_normal(shape) * 0.08).astype(np.float32)

    t = cfg.text
    sd = {"model.language_model.embed_tokens.weight": r(160, 48),
          "model.language_model.norm.weight": np.ones(48, np.float32),
          "lm_head.weight": r(160, 48)}
    for i, lt in enumerate(t.layer_types):
        p = f"model.language_model.layers.{i}."
        sd |= {
            p + "input_layernorm.weight": np.zeros(48, np.float32),
            p + "post_attention_layernorm.weight": np.zeros(48, np.float32),
            p + "mlp.gate_proj.weight": r(96, 48),
            p + "mlp.up_proj.weight": r(96, 48),
            p + "mlp.down_proj.weight": r(48, 96),
        }
        if lt == "full_attention":
            sd |= {
                p + "self_attn.q_proj.weight": r(4 * 16 * 2, 48),
                p + "self_attn.k_proj.weight": r(2 * 16, 48),
                p + "self_attn.v_proj.weight": r(2 * 16, 48),
                p + "self_attn.o_proj.weight": r(48, 64),
                p + "self_attn.q_norm.weight": np.zeros(16, np.float32),
                p + "self_attn.k_norm.weight": np.zeros(16, np.float32),
            }
        else:
            conv_dim = t.conv_dim
            sd |= {
                p + "linear_attn.in_proj_qkvz.weight": r(
                    2 * t.key_dim + 2 * t.value_dim, 48
                ),
                p + "linear_attn.in_proj_ba.weight": r(2 * t.n_v_heads, 48),
                p + "linear_attn.conv1d.weight": r(conv_dim, 1, 3),
                p + "linear_attn.A_log": r(t.n_v_heads),
                p + "linear_attn.dt_bias": r(t.n_v_heads),
                p + "linear_attn.norm.weight": np.zeros(t.d_v, np.float32),
                p + "linear_attn.out_proj.weight": r(48, t.value_dim),
            }
    # qwen3-vl tower keys
    v = "model.visual."
    sd |= {
        v + "patch_embed.proj.weight": r(32, 3, 2, 8, 8),
        v + "patch_embed.proj.bias": r(32),
        v + "pos_embed.weight": r(16, 32),
    }
    for mp in ("merger.", "deepstack_merger_list.0."):
        sd |= {
            v + mp + "norm.weight": np.ones(
                32 * (4 if "deepstack" in mp else 1), np.float32
            ),
            v + mp + "norm.bias": np.zeros(
                32 * (4 if "deepstack" in mp else 1), np.float32
            ),
            v + mp + "linear_fc1.weight": r(128, 128),
            v + mp + "linear_fc1.bias": r(128),
            v + mp + "linear_fc2.weight": r(48, 128),
            v + mp + "linear_fc2.bias": r(48),
        }
    for i in range(2):
        p = f"{v}blocks.{i}."
        sd |= {
            p + "norm1.weight": np.ones(32, np.float32),
            p + "norm1.bias": np.zeros(32, np.float32),
            p + "norm2.weight": np.ones(32, np.float32),
            p + "norm2.bias": np.zeros(32, np.float32),
            p + "attn.qkv.weight": r(96, 32), p + "attn.qkv.bias": r(96),
            p + "attn.proj.weight": r(32, 32), p + "attn.proj.bias": r(32),
            p + "mlp.linear_fc1.weight": r(64, 32),
            p + "mlp.linear_fc1.bias": r(64),
            p + "mlp.linear_fc2.weight": r(32, 64),
            p + "mlp.linear_fc2.bias": r(32),
        }
    return hf_cfg, cfg, qwen3_5_weights_from_state_dict(sd, cfg)


def _engine(cfg, weights):
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.pipeline import make_adapter

    adapter = make_adapter(cfg.text, weights["text"], compute_dtype=jnp.float32)
    assert adapter is not None and adapter.supports_embeds
    return Engine(
        cfg.text, weights["text"], adapter=adapter, num_blocks=32,
        block_size=16, max_batch=2, backend="xla", compute_dtype=jnp.float32,
    )


def test_qwen3_5_text_serving():
    """Dense-MLP hybrid decodes deterministically through the adapter."""
    from mistralrs_tpu.engine.sampler import SamplingParams

    hf_cfg, cfg, weights = _tiny()
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 140, size=9).tolist()

    def run():
        eng = _engine(cfg, weights)
        seq = eng.add_request(ids, SamplingParams(temperature=0.0, max_tokens=6))
        eng.run_to_completion()
        return seq.output_ids

    first = run()
    assert run() == first and len(first) == 6


def test_qwen3_5_image_through_engine():
    """Image request: tower encode, DeepStack rows at image positions,
    M-RoPE streams; serving is deterministic and image-sensitive."""
    from mistralrs_tpu.engine.sampler import SamplingParams

    hf_cfg, cfg, weights = _tiny()
    grid = (1, 4, 4)
    rng = np.random.default_rng(1)
    patches = rng.standard_normal((16, 3 * 2 * 8 * 8)).astype(np.float32)
    n_tok = num_image_tokens(cfg, grid)
    ids = [3, 17] + [150] * n_tok + [9, 22]
    pids, embeds, extra, pos3, ds_rows = prepare_multimodal_prompt(
        weights, cfg, ids, patches, grid, compute_dtype=jnp.float32
    )
    assert extra and pos3.shape == (3, len(ids))
    assert ds_rows.shape == (len(ids), 1, 48)
    assert np.abs(ds_rows[:2]).max() == 0 and np.abs(ds_rows[2]).max() > 0

    def run(e, d):
        eng = _engine(cfg, weights)
        seq = eng.add_request(
            pids, SamplingParams(temperature=0.0, max_tokens=5),
            prompt_embeds=e, mrope_positions=pos3, deepstack_embeds=d,
        )
        eng.run_to_completion()
        return seq.output_ids

    first = run(embeds, ds_rows)
    assert run(embeds, ds_rows) == first and len(first) == 5
    # zeroing the deepstack adds must change the decode (they reach layer 0)
    out_nods = run(embeds, np.zeros_like(ds_rows))
    assert out_nods != first


def _tiny_moe():
    """Qwen3.5-MoE: the qwen3_5_moe checkpoint namespace + rope_parameters
    config shape, with weights fabricated from an HF Qwen3Next model whose
    text stack is numerically identical (MoE blocks + a dense
    `mlp_only_layers` row — the reference REJECTS that field,
    vision_models/qwen3_5_moe/text.rs:520; we serve it)."""
    import transformers

    layer_types = ["linear_attention", "full_attention"] * 2
    hf_next = transformers.Qwen3NextConfig(
        vocab_size=160, hidden_size=48, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, layer_types=layer_types,
        linear_num_value_heads=4, linear_num_key_heads=2,
        linear_key_head_dim=8, linear_value_head_dim=8,
        linear_conv_kernel_dim=3,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        shared_expert_intermediate_size=32, decoder_sparse_step=1,
        mlp_only_layers=[1], norm_topk_prob=True,
        max_position_embeddings=128, tie_word_embeddings=False,
        pad_token_id=0, rope_theta=10000.0, partial_rotary_factor=0.25,
    )
    torch.manual_seed(77)
    model = transformers.Qwen3NextForCausalLM(hf_next).eval()

    hf_cfg = {
        "model_type": "qwen3_5_moe",
        "text_config": {
            "vocab_size": 160, "hidden_size": 48, "intermediate_size": 96,
            "num_hidden_layers": 4, "num_attention_heads": 4,
            "num_key_value_heads": 2, "head_dim": 16,
            "max_position_embeddings": 128, "rms_norm_eps": 1e-6,
            "full_attention_interval": 2,
            "linear_conv_kernel_dim": 3, "linear_key_head_dim": 8,
            "linear_value_head_dim": 8, "linear_num_key_heads": 2,
            "linear_num_value_heads": 4,
            "num_experts": 4, "num_experts_per_tok": 2,
            "moe_intermediate_size": 32,
            "shared_expert_intermediate_size": 32,
            "mlp_only_layers": [1], "norm_topk_prob": True,
            "rope_parameters": {"rope_theta": 10000.0,
                                "mrope_section": [1, 1, 0],
                                "partial_rotary_factor": 0.25},
        },
        "vision_config": {
            "depth": 2, "hidden_size": 32, "intermediate_size": 64,
            "num_heads": 4, "patch_size": 8, "temporal_patch_size": 2,
            "spatial_merge_size": 2, "out_hidden_size": 48,
            "num_position_embeddings": 16, "deepstack_visual_indexes": [0],
        },
        "image_token_id": 150,
    }
    cfg = Qwen35Config.from_hf(hf_cfg)
    assert cfg.text.num_experts == 4
    assert cfg.text.mlp_only_layers == (1,)
    assert cfg.text.layer_types == tuple(layer_types)

    # qwen3_5_moe checkpoint namespace: text under model.language_model.*
    sd = {}
    rng = np.random.default_rng(61)
    for k, v in model.state_dict().items():
        arr = v.detach().numpy().astype(np.float32)
        if k == "lm_head.weight":
            sd[k] = arr
        elif k.startswith("model."):
            sd["model.language_model." + k[len("model."):]] = arr
    # tiny qwen3-vl tower (same shape as _tiny's)
    from test_qwen3_5 import _tiny as _dense_tiny  # reuse tower fabric

    _, _, dense_weights = _dense_tiny()
    return model, cfg, sd, dense_weights["vision"]


def test_qwen3_5_moe_text_parity_vs_hf():
    """The MoE text stack loaded through the qwen3_5_moe namespace matches
    HF Qwen3Next logits exactly — including the dense `mlp_only_layers`
    row (reference parity target: vision_models/qwen3_5_moe/text.rs)."""
    from mistralrs_tpu.models.qwen3next import (
        Qwen3NextCache,
        qwen3next_forward,
    )

    model, cfg, sd, _ = _tiny_moe()
    weights = qwen3_5_weights_from_state_dict(sd, cfg)
    # mixed stack: layer 1 dense, layer 3 MoE
    assert "router" not in weights["text"]["layers"][1]
    assert "gate" in weights["text"]["layers"][1]
    assert "router" in weights["text"]["layers"][3]

    ids = np.array([[3, 17, 40, 9, 22, 61, 5, 2]], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(np.asarray(ids, np.int64))).logits.numpy()
    b, t = ids.shape
    cache = Qwen3NextCache.create(cfg.text, b, t + 4)
    positions = np.broadcast_to(np.arange(t)[None], (b, t)).astype(np.int32)
    got, _ = qwen3next_forward(
        weights["text"], cfg.text, jnp.asarray(ids), jnp.asarray(positions),
        cache, jnp.zeros((b,), jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=6e-4, atol=6e-4)


def test_qwen3_5_moe_through_engine():
    """Engine-served qwen3.5-MoE (hybrid GDN + mixed MoE/dense MLPs)
    matches the standalone greedy decode; image requests ride the same
    DeepStack/M-RoPE path as dense qwen3.5."""
    from mistralrs_tpu.engine.adapters import Qwen3NextAdapter
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.qwen3next import qwen3next_greedy_generate

    model, cfg, sd, vision = _tiny_moe()
    weights = qwen3_5_weights_from_state_dict(sd, cfg)
    adapter = Qwen3NextAdapter(cfg.text, weights["text"])
    eng = Engine(
        cfg.text, weights["text"], num_blocks=64, block_size=4, max_batch=2,
        prefill_chunk=8, compute_dtype=jnp.float32, adapter=adapter,
    )
    rng = np.random.default_rng(5)
    prompts = [
        [int(x) for x in rng.integers(1, 150, n)] for n in (5, 9)
    ]
    seqs = [
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=6))
        for p in prompts
    ]
    eng.run_to_completion()
    for p, s in zip(prompts, seqs):
        ref = qwen3next_greedy_generate(weights["text"], cfg.text, p, 6)
        assert s.generated_ids[: len(ref)] == ref
