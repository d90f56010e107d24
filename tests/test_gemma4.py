"""Gemma 4 text core — structural-invariant tests on a synthetic
checkpoint (no public checkpoints/transformers class exist for this arch;
reference: `mistralrs-core/src/vision_models/gemma4/text.rs`).

Invariants covered:
* KV plane plan: shared layers map to the last same-type donor, never write;
* proportional partial RoPE: channels beyond 2*rope_angles pass through;
* attention_k_eq_v: v_proj is absent/ignored on full layers;
* double-wide MLP on KV-shared layers;
* engine serving (chunked prefill + incremental paged decode) reproduces
  the full-context forward greedy rollout exactly.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mistralrs_tpu.models.gemma4 import (
    Gemma4Config,
    gemma4_forward_paged,
    gemma4_weights_from_state_dict,
    make_paged_cache,
)

HF_CFG = {
    "model_type": "gemma4_text",
    "vocab_size": 96,
    "hidden_size": 32,
    "intermediate_size": 64,
    "num_hidden_layers": 6,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 8,
    "global_head_dim": 16,
    "num_global_key_value_heads": 2,
    "layer_types": ["sliding_attention", "sliding_attention", "full_attention",
                    "sliding_attention", "sliding_attention", "full_attention"],
    "sliding_window": 8,
    "num_kv_shared_layers": 2,
    "attention_k_eq_v": True,
    "use_double_wide_mlp": True,
    "hidden_size_per_layer_input": 4,
    "vocab_size_per_layer_input": 96,
    "rope_parameters": {
        "full_attention": {"rope_theta": 1e6, "partial_rotary_factor": 0.25},
        "sliding_attention": {"rope_theta": 1e4},
    },
    "final_logit_softcapping": 30.0,
    "tie_word_embeddings": True,
}


def _cfg():
    return Gemma4Config.from_hf(HF_CFG)


def _sd(cfg: Gemma4Config, seed=0):
    rng = np.random.default_rng(seed)
    H = cfg.hidden_size

    def r(*s):
        return (rng.standard_normal(s) * 0.05).astype(np.float32)

    planes, writes = cfg.kv_plan()
    sd = {
        "model.embed_tokens.weight": r(cfg.vocab_size, H),
        "model.norm.weight": np.ones(H, np.float32),
        "model.embed_tokens_per_layer.weight": r(
            cfg.vocab_size_per_layer_input,
            cfg.num_layers * cfg.hidden_size_per_layer_input,
        ),
        "model.per_layer_model_projection.weight": r(
            cfg.num_layers * cfg.hidden_size_per_layer_input, H
        ),
        "model.per_layer_projection_norm.weight": np.ones(
            cfg.hidden_size_per_layer_input, np.float32
        ),
    }
    for i, lt in enumerate(cfg.layer_types):
        p = f"model.layers.{i}."
        sliding = lt == "sliding_attention"
        hd = cfg.head_dim if sliding else cfg.global_head_dim
        n_kv = cfg.num_kv_heads if sliding else cfg.num_global_kv_heads
        inner = cfg.intermediate_size
        if cfg.use_double_wide_mlp and i >= cfg.first_shared_layer:
            inner *= 2
        sd.update({
            p + "self_attn.q_proj.weight": r(cfg.num_heads * hd, H),
            p + "self_attn.o_proj.weight": r(H, cfg.num_heads * hd),
            p + "self_attn.q_norm.weight": np.ones(hd, np.float32),
            p + "input_layernorm.weight": np.ones(H, np.float32),
            p + "post_attention_layernorm.weight": np.ones(H, np.float32),
            p + "pre_feedforward_layernorm.weight": np.ones(H, np.float32),
            p + "post_feedforward_layernorm.weight": np.ones(H, np.float32),
            p + "mlp.gate_proj.weight": r(inner, H),
            p + "mlp.up_proj.weight": r(inner, H),
            p + "mlp.down_proj.weight": r(H, inner),
            p + "per_layer_input_gate.weight": r(
                cfg.hidden_size_per_layer_input, H
            ),
            p + "per_layer_projection.weight": r(
                H, cfg.hidden_size_per_layer_input
            ),
            p + "post_per_layer_input_norm.weight": np.ones(H, np.float32),
            p + "layer_scalar": np.asarray(1.0 + 0.01 * i, np.float32),
        })
        if writes[i]:
            sd[p + "self_attn.k_proj.weight"] = r(n_kv * hd, H)
            sd[p + "self_attn.k_norm.weight"] = np.ones(hd, np.float32)
            sd[p + "self_attn.v_norm.weight"] = np.ones(hd, np.float32)
            if not (cfg.attention_k_eq_v and lt == "full_attention"):
                sd[p + "self_attn.v_proj.weight"] = r(n_kv * hd, H)
    return sd


def test_kv_plan_shared_layers():
    cfg = _cfg()
    planes, writes = cfg.kv_plan()
    # first 4 layers write their own planes; layers 4/5 are shared
    assert writes == [True, True, True, True, False, False]
    # layer 4 (sliding) reuses the LAST non-shared sliding layer (3);
    # layer 5 (full) reuses the last non-shared full layer (2)
    assert planes[4] == planes[3]
    assert planes[5] == planes[2]
    assert cfg.num_kv_planes("sliding_attention") == 3
    assert cfg.num_kv_planes("full_attention") == 1


def test_proportional_rope_passthrough():
    from mistralrs_tpu.models.gemma4 import _proportional_rope, _rope_half

    pos = jnp.asarray([[3, 7]], jnp.int32)
    hd, angles = 16, 2
    cos, sin = _proportional_rope(pos, hd, angles, 1e6)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2, 1, hd)),
                    jnp.float32)
    y = _rope_half(x, cos, sin)
    # channels outside the rotated set {0..angles-1, hd/2..hd/2+angles-1}
    # pass through untouched
    rotated = list(range(angles)) + list(range(hd // 2, hd // 2 + angles))
    passthrough = [c for c in range(hd) if c not in rotated]
    np.testing.assert_array_equal(
        np.asarray(y[..., passthrough]), np.asarray(x[..., passthrough])
    )
    assert not np.allclose(np.asarray(y[..., rotated]),
                           np.asarray(x[..., rotated]))


def _full_forward_greedy(weights, cfg, prompt, n_steps):
    """Reference rollout: re-run the FULL context through a fresh cache at
    every step (no incremental state — pure forward correctness)."""
    ids = list(prompt)
    bs = 16
    for _ in range(n_steps):
        t = len(ids)
        nb = -(-t // bs)
        cache = make_paged_cache(cfg, nb, bs)
        bt = jnp.arange(nb, dtype=jnp.int32)[None]
        slots = jnp.arange(t, dtype=jnp.int32)[None]
        logits, _ = gemma4_forward_paged(
            weights, cfg, jnp.asarray([ids], jnp.int32),
            jnp.arange(t, dtype=jnp.int32)[None], cache, bt, slots,
            jnp.asarray([t], jnp.int32), block_size=bs,
        )
        ids.append(int(jnp.argmax(logits[0, -1])))
    return ids[len(prompt):]


def test_engine_serving_matches_full_forward(tmp_path):
    """load_pipeline registration + engine chunked-prefill/decode vs the
    full-context rollout (KV sharing, PLE, k_eq_v, softcap all live)."""
    from safetensors.numpy import save_file

    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.pipeline import load_pipeline, make_adapter

    cfg = _cfg()
    sd = _sd(cfg)
    mdir = tmp_path / "g4"
    mdir.mkdir()
    save_file(sd, str(mdir / "model.safetensors"))
    (mdir / "config.json").write_text(json.dumps(HF_CFG))
    pipe = load_pipeline(str(mdir))
    assert type(pipe.cfg).__name__ == "Gemma4Config"
    adapter = make_adapter(pipe.cfg, pipe.weights)
    assert type(adapter).__name__ == "Gemma4Adapter"

    eng = Engine(
        pipe.cfg, pipe.weights, num_blocks=32, block_size=16, max_batch=2,
        prefill_chunk=8, compute_dtype=jnp.float32, adapter=adapter,
    )
    rng = np.random.default_rng(4)
    prompts = [
        [int(x) for x in rng.integers(1, cfg.vocab_size, n)]
        for n in (5, 11)  # 11 > prefill_chunk → chunked prefill
    ]
    seqs = [
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=6))
        for p in prompts
    ]
    eng.run_to_completion()
    for p, s in zip(prompts, seqs):
        ref = _full_forward_greedy(pipe.weights, pipe.cfg, p, 6)
        assert s.output_ids == ref, (p, s.output_ids, ref)


def test_k_eq_v_ignores_v_proj():
    """attention_k_eq_v: a v_proj in the checkpoint is ignored on full
    layers — outputs identical with/without it."""
    cfg = _cfg()
    sd = _sd(cfg)
    w1 = gemma4_weights_from_state_dict(sd, cfg)
    sd2 = dict(sd)
    sd2["model.layers.2.self_attn.v_proj.weight"] = (
        np.random.default_rng(9).standard_normal(
            (cfg.num_global_kv_heads * cfg.global_head_dim, cfg.hidden_size)
        ).astype(np.float32)
    )
    w2 = gemma4_weights_from_state_dict(sd2, cfg)
    assert "wv" not in w2["layers"][2]
    ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    bs = 16
    cache = make_paged_cache(cfg, 1, bs)
    bt = jnp.zeros((1, 1), jnp.int32)
    slots = jnp.arange(4, dtype=jnp.int32)[None]
    kvl = jnp.asarray([4], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    l1, _ = gemma4_forward_paged(w1, cfg, ids, pos, cache, bt, slots, kvl,
                                 block_size=bs)
    l2, _ = gemma4_forward_paged(w2, cfg, ids, pos, cache, bt, slots, kvl,
                                 block_size=bs)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_double_wide_mlp_on_shared_layers():
    cfg = _cfg()
    w = gemma4_weights_from_state_dict(_sd(cfg), cfg)
    assert w["layers"][0]["gate"].shape[0] == cfg.intermediate_size
    assert w["layers"][5]["gate"].shape[0] == 2 * cfg.intermediate_size


def test_moe_parallel_block_runs():
    """enable_moe_block: parallel MoE + dense MLP both contribute."""
    hf = dict(HF_CFG)
    hf.update(enable_moe_block=True, num_experts=4, top_k_experts=2,
              expert_intermediate_size=16, num_kv_shared_layers=0,
              hidden_size_per_layer_input=0,
              layer_types=["sliding_attention", "full_attention"],
              num_hidden_layers=2, attention_k_eq_v=False)
    cfg = Gemma4Config.from_hf(hf)
    rng = np.random.default_rng(1)
    sd = _sd(cfg, seed=1)
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        sd[p + "router.scale"] = np.ones((), np.float32)
        sd[p + "router.proj.weight"] = (
            rng.standard_normal((cfg.num_experts, cfg.hidden_size))
            .astype(np.float32) * 0.1)
        sd[p + "moe.per_expert_scale"] = np.ones(cfg.num_experts, np.float32)
        sd[p + "moe.gate_up_proj"] = (
            rng.standard_normal(
                (cfg.num_experts, cfg.hidden_size,
                 2 * cfg.expert_intermediate_size)).astype(np.float32) * 0.05)
        sd[p + "moe.down_proj"] = (
            rng.standard_normal(
                (cfg.num_experts, cfg.expert_intermediate_size,
                 cfg.hidden_size)).astype(np.float32) * 0.05)
        sd[p + "pre_feedforward_layernorm_2.weight"] = np.ones(
            cfg.hidden_size, np.float32)
        sd[p + "post_feedforward_layernorm_1.weight"] = np.ones(
            cfg.hidden_size, np.float32)
        sd[p + "post_feedforward_layernorm_2.weight"] = np.ones(
            cfg.hidden_size, np.float32)
    w = gemma4_weights_from_state_dict(sd, cfg)
    ids = jnp.asarray([[1, 2, 3]], jnp.int32)
    bs = 16
    cache = make_paged_cache(cfg, 1, bs)
    logits, _ = gemma4_forward_paged(
        w, cfg, ids, jnp.arange(3, dtype=jnp.int32)[None], cache,
        jnp.zeros((1, 1), jnp.int32), jnp.arange(3, dtype=jnp.int32)[None],
        jnp.asarray([3], jnp.int32), block_size=bs,
    )
    assert logits.shape == (1, 1, cfg.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))
    # zeroing the MoE path changes the output (it genuinely contributes)
    w2 = gemma4_weights_from_state_dict(sd, cfg)
    for lw in w2["layers"]:
        lw["moe_gate_up"] = jnp.zeros_like(lw["moe_gate_up"])
    l2, _ = gemma4_forward_paged(
        w2, cfg, ids, jnp.arange(3, dtype=jnp.int32)[None], cache,
        jnp.zeros((1, 1), jnp.int32), jnp.arange(3, dtype=jnp.int32)[None],
        jnp.asarray([3], jnp.int32), block_size=bs,
    )
    assert not np.allclose(np.asarray(logits), np.asarray(l2))
