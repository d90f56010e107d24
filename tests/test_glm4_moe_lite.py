"""GLM-4 MoE Lite — the DeepSeek-family arch with MLA + sigmoid noaux-tc
group-limited routing (reference `models/glm4_moe_lite.rs:47`). The arch
maps onto `models/deepseek.py`; HF ships no Glm4MoeLite class in this image,
so routing semantics are oracle-tested through `DeepseekV3ForCausalLM` with
the group-limited knobs active (identical MoeGate math: sigmoid scores,
e_score_correction_bias choice, per-group top-2 sums, topk_group masking,
weights from raw scores, normalize, routed_scaling_factor)."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from mistralrs_tpu.engine.engine import Engine
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.models.deepseek import (
    DeepseekConfig,
    deepseek_forward,
    deepseek_weights_from_state_dict,
    make_cache,
)


def _glm4_lite_hf_cfg():
    """A config.json as a GLM-4 MoE Lite checkpoint ships it (q_lora always
    present, group-limited routing, dense first layer)."""
    return {
        "architectures": ["Glm4MoeLiteForCausalLM"],
        "model_type": "glm4_moe_lite",
        "vocab_size": 64, "hidden_size": 64, "intermediate_size": 128,
        "moe_intermediate_size": 32, "num_hidden_layers": 3,
        "num_attention_heads": 4, "num_key_value_heads": 4,
        "q_lora_rank": 32, "kv_lora_rank": 16, "qk_rope_head_dim": 8,
        "qk_nope_head_dim": 16, "v_head_dim": 16,
        "n_routed_experts": 8, "n_shared_experts": 1,
        "num_experts_per_tok": 2, "first_k_dense_replace": 1,
        "routed_scaling_factor": 1.8, "n_group": 4, "topk_group": 2,
        "moe_layer_freq": 1, "rms_norm_eps": 1e-6, "rope_theta": 10000.0,
        "max_position_embeddings": 128,
    }


def test_config_detection():
    cfg = DeepseekConfig.from_hf(_glm4_lite_hf_cfg())
    assert cfg.q_lora_rank == 32
    assert cfg.n_group == 4 and cfg.topk_group == 2
    assert cfg.scoring_func == "sigmoid"  # glm4_moe_lite is always sigmoid
    assert cfg.routed_scaling_factor == 1.8
    assert cfg.moe_layer_freq == 1

    bad = dict(_glm4_lite_hf_cfg(), moe_layer_freq=2)
    with pytest.raises(NotImplementedError):
        DeepseekConfig.from_hf(bad)


def test_group_limited_routing_parity_vs_hf():
    """Full-model logit parity against HF DeepseekV3 with n_group/topk_group
    active — the exact MoeGate math of the reference's glm4_moe_lite.rs
    (sigmoid + NoAuxTc + group top-2 sums + routed scaling)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    d = _glm4_lite_hf_cfg()
    hf_cfg = transformers.DeepseekV3Config(
        vocab_size=d["vocab_size"], hidden_size=d["hidden_size"],
        intermediate_size=d["intermediate_size"],
        num_hidden_layers=d["num_hidden_layers"],
        num_attention_heads=d["num_attention_heads"],
        num_key_value_heads=d["num_key_value_heads"],
        q_lora_rank=d["q_lora_rank"], kv_lora_rank=d["kv_lora_rank"],
        qk_rope_head_dim=d["qk_rope_head_dim"],
        qk_nope_head_dim=d["qk_nope_head_dim"], v_head_dim=d["v_head_dim"],
        n_routed_experts=d["n_routed_experts"],
        num_experts_per_tok=d["num_experts_per_tok"],
        moe_intermediate_size=d["moe_intermediate_size"],
        first_k_dense_replace=d["first_k_dense_replace"],
        n_shared_experts=d["n_shared_experts"],
        n_group=d["n_group"], topk_group=d["topk_group"],
        routed_scaling_factor=d["routed_scaling_factor"],
        norm_topk_prob=True,
        max_position_embeddings=d["max_position_embeddings"],
    )
    torch.manual_seed(0)
    model = transformers.DeepseekV3ForCausalLM(hf_cfg).eval()
    sd = {
        k: v.detach().numpy().astype(np.float32)
        for k, v in model.state_dict().items()
    }
    cfg = DeepseekConfig.from_hf(d)
    weights = deepseek_weights_from_state_dict(sd, cfg)

    ids = np.array([[1, 7, 23, 50, 9, 3, 31, 44]], np.int64)
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


def _synth_checkpoint(tmp_path):
    """Write a synthetic glm4_moe_lite safetensors dir (q_a/q_b low-rank
    query path, group routing) the pipeline should auto-detect."""
    from safetensors.numpy import save_file

    d = _glm4_lite_hf_cfg()
    cfg = DeepseekConfig.from_hf(d)
    rng = np.random.default_rng(0)

    def r(*s):
        return (rng.standard_normal(s) * 0.2).astype(np.float32)

    H, V, nh = cfg.hidden_size, cfg.vocab_size, cfg.num_heads
    sd = {
        "model.embed_tokens.weight": r(V, H),
        "model.norm.weight": np.ones(H, np.float32),
        "lm_head.weight": r(V, H),
    }
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "self_attn.q_a_proj.weight"] = r(cfg.q_lora_rank, H)
        sd[p + "self_attn.q_a_layernorm.weight"] = np.ones(
            cfg.q_lora_rank, np.float32)
        sd[p + "self_attn.q_b_proj.weight"] = r(
            nh * cfg.qk_head_dim, cfg.q_lora_rank)
        sd[p + "self_attn.kv_a_proj_with_mqa.weight"] = r(
            cfg.kv_lora_rank + cfg.qk_rope_head_dim, H)
        sd[p + "self_attn.kv_a_layernorm.weight"] = np.ones(
            cfg.kv_lora_rank, np.float32)
        sd[p + "self_attn.kv_b_proj.weight"] = r(
            nh * (cfg.qk_nope_head_dim + cfg.v_head_dim), cfg.kv_lora_rank)
        sd[p + "self_attn.o_proj.weight"] = r(H, nh * cfg.v_head_dim)
        if i >= cfg.first_k_dense_replace:
            sd[p + "mlp.gate.weight"] = r(cfg.n_routed_experts, H)
            sd[p + "mlp.gate.e_score_correction_bias"] = r(
                cfg.n_routed_experts)
            for e in range(cfg.n_routed_experts):
                q = p + f"mlp.experts.{e}."
                sd[q + "gate_proj.weight"] = r(cfg.moe_intermediate_size, H)
                sd[q + "up_proj.weight"] = r(cfg.moe_intermediate_size, H)
                sd[q + "down_proj.weight"] = r(H, cfg.moe_intermediate_size)
            se = cfg.moe_intermediate_size * cfg.n_shared_experts
            sd[p + "mlp.shared_experts.gate_proj.weight"] = r(se, H)
            sd[p + "mlp.shared_experts.up_proj.weight"] = r(se, H)
            sd[p + "mlp.shared_experts.down_proj.weight"] = r(H, se)
        else:
            sd[p + "mlp.gate_proj.weight"] = r(cfg.intermediate_size, H)
            sd[p + "mlp.up_proj.weight"] = r(cfg.intermediate_size, H)
            sd[p + "mlp.down_proj.weight"] = r(H, cfg.intermediate_size)
    mdir = tmp_path / "glm4_moe_lite"
    mdir.mkdir()
    save_file(sd, str(mdir / "model.safetensors"))
    (mdir / "config.json").write_text(json.dumps(d))
    return mdir, cfg


def test_pipeline_autodetect_and_engine_serve(tmp_path):
    """config.json model_type glm4_moe_lite → DeepSeek pipeline + adapter;
    engine-served greedy matches the raw forward."""
    from mistralrs_tpu.engine.adapters import DeepseekAdapter
    from mistralrs_tpu.pipeline import load_pipeline

    mdir, _ = _synth_checkpoint(tmp_path)
    pipe = load_pipeline(str(mdir), dtype=jnp.float32)
    cfg, weights = pipe.cfg, pipe.weights
    assert isinstance(cfg, DeepseekConfig) and cfg.n_group == 4

    adapter = DeepseekAdapter(cfg, weights, backend="xla")
    eng = Engine(
        cfg, weights, num_blocks=64, block_size=8, max_batch=2,
        prefill_chunk=8, compute_dtype=jnp.float32, adapter=adapter,
    )
    rng = np.random.default_rng(3)
    prompt = [int(x) for x in rng.integers(1, cfg.vocab_size, 11)]
    seq = eng.add_request(prompt, SamplingParams(temperature=0.0, max_tokens=5))
    eng.run_to_completion()

    # greedy oracle from the full (non-absorbed) forward
    full_w = pipe.weights
    ids = list(prompt)
    cache = make_cache(cfg, 1, len(prompt) + 6, absorbed=True)
    outs = []
    for _ in range(5):
        arr = jnp.asarray([ids], jnp.int32)
        pos = jnp.arange(len(ids))[None].astype(jnp.int32)
        cache_i = make_cache(cfg, 1, len(ids) + 1, absorbed=True)
        logits, _ = deepseek_forward(
            full_w, cfg, arr, pos, cache_i, jnp.zeros((1,), jnp.int32),
            backend="xla", absorbed=True,
        )
        nxt = int(jnp.argmax(logits[0, -1]))
        outs.append(nxt)
        ids.append(nxt)
    assert seq.output_ids == outs, (seq.output_ids, outs)
