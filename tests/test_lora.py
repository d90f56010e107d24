"""LoRA: static merge == dynamic application, PEFT name parsing, detach."""

import numpy as np

import jax.numpy as jnp

from mistralrs_tpu.lora import (
    attach_dynamic_lora,
    detach_dynamic_lora,
    merge_lora_into_state_dict,
)
from mistralrs_tpu.models import ModelConfig
from mistralrs_tpu.models.hf_loader import weights_from_state_dict
from mistralrs_tpu.models.llama import KVCache, forward

CFG = ModelConfig(
    arch="llama", vocab_size=128, hidden_size=64, intermediate_size=128,
    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
)


def _base_sd(rng):
    H, I, V = CFG.hidden_size, CFG.intermediate_size, CFG.vocab_size
    sd = {
        "model.embed_tokens.weight": rng.standard_normal((V, H)).astype(np.float32) * 0.05,
        "model.norm.weight": np.ones(H, np.float32),
        "lm_head.weight": rng.standard_normal((V, H)).astype(np.float32) * 0.05,
    }
    for i in range(CFG.num_layers):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        for nm, shp in [
            ("self_attn.q_proj", (64, H)), ("self_attn.k_proj", (32, H)),
            ("self_attn.v_proj", (32, H)), ("self_attn.o_proj", (H, 64)),
            ("mlp.gate_proj", (I, H)), ("mlp.up_proj", (I, H)),
            ("mlp.down_proj", (H, I)),
        ]:
            sd[p + nm + ".weight"] = rng.standard_normal(shp).astype(np.float32) * 0.05
    return sd


def _adapter(rng, r=4):
    cfg = {"r": r, "lora_alpha": 8, "target_modules": ["q_proj", "down_proj"]}
    t = {}
    for i in range(CFG.num_layers):
        b = f"base_model.model.model.layers.{i}."
        t[b + "self_attn.q_proj.lora_A.weight"] = rng.standard_normal((r, 64)).astype(np.float32) * 0.1
        t[b + "self_attn.q_proj.lora_B.weight"] = rng.standard_normal((64, r)).astype(np.float32) * 0.1
        t[b + "mlp.down_proj.lora_A.weight"] = rng.standard_normal((r, 128)).astype(np.float32) * 0.1
        t[b + "mlp.down_proj.lora_B.weight"] = rng.standard_normal((64, r)).astype(np.float32) * 0.1
    return cfg, t


def _logits(weights, ids):
    b, t = ids.shape
    cache = KVCache.create(CFG, b, t + 2, dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t)).astype(jnp.int32)
    lg, _ = forward(
        weights, CFG, jnp.asarray(ids), pos, cache, jnp.zeros((b,), jnp.int32),
        backend="xla", compute_dtype=jnp.float32,
    )
    return np.asarray(lg)


def test_static_merge_equals_dynamic():
    rng = np.random.default_rng(0)
    sd = _base_sd(rng)
    acfg, at = _adapter(rng)
    ids = np.array([[1, 5, 9, 33]], np.int32)

    merged = weights_from_state_dict(
        merge_lora_into_state_dict(sd, acfg, at), CFG, dtype=jnp.float32
    )
    base = weights_from_state_dict(sd, CFG, dtype=jnp.float32)
    dynamic = attach_dynamic_lora(base, acfg, at, CFG.num_layers, dtype=jnp.float32)

    np.testing.assert_allclose(
        _logits(dynamic, ids), _logits(merged, ids), rtol=1e-4, atol=1e-4
    )


def test_lora_changes_output_and_detach_restores():
    rng = np.random.default_rng(1)
    sd = _base_sd(rng)
    acfg, at = _adapter(rng)
    base = weights_from_state_dict(sd, CFG, dtype=jnp.float32)
    dynamic = attach_dynamic_lora(base, acfg, at, CFG.num_layers, dtype=jnp.float32)
    ids = np.array([[2, 4, 8]], np.int32)
    lg_base = _logits(base, ids)
    lg_lora = _logits(dynamic, ids)
    assert np.abs(lg_base - lg_lora).max() > 1e-3
    detached = detach_dynamic_lora(dynamic)
    np.testing.assert_array_equal(_logits(detached, ids), lg_base)


def test_dynamic_lora_on_quantized_base():
    """Adapters compose with a quantized base (the QLoRA serving pattern)."""
    from mistralrs_tpu.gguf.constants import GGMLType

    rng = np.random.default_rng(2)
    sd = _base_sd(rng)
    acfg, at = _adapter(rng)
    qbase = weights_from_state_dict(sd, CFG, dtype=jnp.float32, isq=GGMLType.Q8_0)
    dynamic = attach_dynamic_lora(qbase, acfg, at, CFG.num_layers, dtype=jnp.float32)
    ids = np.array([[7, 3, 11]], np.int32)
    lg_q = _logits(qbase, ids)
    lg_ql = _logits(dynamic, ids)
    assert np.isfinite(lg_ql).all()
    assert np.abs(lg_q - lg_ql).max() > 1e-3


def test_per_request_adapter_selection_through_engine():
    """Two adapters attached as a bank; batched requests each select their
    own (or none) and match the single-adapter engines exactly — the
    reference's per-request adapter selection (adapter/selection.rs)."""
    import jax.numpy as jnp

    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.lora import attach_adapter_bank

    rng = np.random.default_rng(7)
    base_sd = _base_sd(rng)
    cfg_a, t_a = _adapter(rng)
    cfg_b, t_b = _adapter(rng, r=2)

    def run_engine(weights, loras):
        w = dict(weights)
        eng = Engine(CFG, w, num_blocks=32, block_size=16, max_batch=4,
                     backend="xla", compute_dtype=jnp.float32)
        seqs = [
            eng.add_request([1, 5, 9, 20], SamplingParams(temperature=0.0,
                                                          max_tokens=6),
                            lora=name)
            for name in loras
        ]
        eng.run_to_completion()
        return [s.output_ids for s in seqs]

    base = weights_from_state_dict(base_sd, CFG, dtype=jnp.float32)
    bank = attach_adapter_bank(
        base, [("a", cfg_a, t_a), ("b", cfg_b, t_b)], CFG.num_layers,
        dtype=jnp.float32,
    )
    got = run_engine(bank, ["a", "b", None])

    only_a = attach_adapter_bank(base, [("a", cfg_a, t_a)], CFG.num_layers,
                                 dtype=jnp.float32)
    only_b = attach_adapter_bank(base, [("b", cfg_b, t_b)], CFG.num_layers,
                                 dtype=jnp.float32)
    ref_a = run_engine(only_a, ["a"])[0]
    ref_b = run_engine(only_b, ["b"])[0]
    ref_none = run_engine(base, [None])[0]
    assert got[0] == ref_a
    assert got[1] == ref_b
    assert got[2] == ref_none
    # adapters actually change outputs
    assert got[0] != ref_none or got[1] != ref_none

    # unknown names rejected
    eng = Engine(CFG, dict(bank), num_blocks=16, block_size=16, max_batch=2,
                 backend="xla", compute_dtype=jnp.float32)
    try:
        eng.add_request([1], SamplingParams(max_tokens=1), lora="nope")
        assert False
    except ValueError:
        pass


def test_adapter_bank_on_fused_projections():
    """CLI-served engines fuse wq/wk/wv → wqkv (and gate/up → wgateup) at
    load; an adapter bank attached AFTER fusing must fold into the fused
    layout (block-diagonal B at each projection's output offset) and give
    exactly the unfused engine's outputs. Regression: the delta silently
    no-op'd on fused weights (caught by the round-5 verify drive)."""
    import jax.numpy as jnp

    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.lora import attach_adapter_bank
    from mistralrs_tpu.models.llama import fuse_projections

    rng = np.random.default_rng(21)
    sd = _base_sd(rng)
    cfg_a, t_a = _adapter(rng)
    # add a k_proj + up_proj target so the fold covers multi-part banks
    for i in range(CFG.num_layers):
        b = f"base_model.model.model.layers.{i}."
        t_a[b + "self_attn.k_proj.lora_A.weight"] = (
            rng.standard_normal((4, 64)).astype(np.float32) * 0.1)
        t_a[b + "self_attn.k_proj.lora_B.weight"] = (
            rng.standard_normal((32, 4)).astype(np.float32) * 0.1)
        t_a[b + "mlp.up_proj.lora_A.weight"] = (
            rng.standard_normal((4, 64)).astype(np.float32) * 0.1)
        t_a[b + "mlp.up_proj.lora_B.weight"] = (
            rng.standard_normal((128, 4)).astype(np.float32) * 0.1)
    base = weights_from_state_dict(sd, CFG, dtype=jnp.float32)

    def run(weights, lora):
        eng = Engine(CFG, dict(weights), num_blocks=32, block_size=16,
                     max_batch=2, backend="xla", compute_dtype=jnp.float32)
        s = eng.add_request([1, 5, 9, 20],
                            SamplingParams(temperature=0.0, max_tokens=8),
                            lora=lora)
        eng.run_to_completion()
        return s.output_ids

    unfused_bank = attach_adapter_bank(base, [("a", cfg_a, t_a)],
                                       CFG.num_layers, dtype=jnp.float32)
    ref = run(unfused_bank, "a")

    fused = fuse_projections(base, CFG)
    assert "wqkv" in fused["layers"] and "wgateup" in fused["layers"]
    fused_bank = attach_adapter_bank(fused, [("a", cfg_a, t_a)],
                                     CFG.num_layers, dtype=jnp.float32,
                                     cfg=CFG)
    assert "wqkv_lora" in fused_bank["layers"]
    assert "wgateup_lora" in fused_bank["layers"]
    got = run(fused_bank, "a")
    assert got == ref
    # the adapter matters on the fused path (not a silent no-op)
    assert got != run(fused, None)
