"""Topology (per-layer-range ISQ) parsing + mixed-type loading."""

import numpy as np
import pytest

import jax.numpy as jnp

from mistralrs_tpu.gguf.constants import GGMLType
from mistralrs_tpu.models import ModelConfig
from mistralrs_tpu.models.hf_loader import weights_from_state_dict
from mistralrs_tpu.models.llama import KVCache, forward
from mistralrs_tpu.topology import Topology


def test_parse_ranges():
    t = Topology.from_yaml("""
0-2:
  isq: Q8_0
2-:
  isq: Q4K
""", 4)
    assert t.type_for_layer(0) == GGMLType.Q8_0
    assert t.type_for_layer(1) == GGMLType.Q8_0
    assert t.type_for_layer(2) == GGMLType.Q4_K
    assert t.type_for_layer(3) == GGMLType.Q4_K


def test_bad_range_rejected():
    with pytest.raises(ValueError):
        Topology.from_dict({"5-3": {"isq": "Q4K"}}, 8)
    with pytest.raises(ValueError):
        Topology.from_dict({"0-2": {"isq": "NOPE"}}, 8)


def test_mixed_type_loading_runs():
    cfg = ModelConfig(
        arch="llama", vocab_size=128, hidden_size=64, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
    )
    rng = np.random.default_rng(0)
    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    sd = {
        "model.embed_tokens.weight": rng.standard_normal((V, H)).astype(np.float32),
        "model.norm.weight": np.ones(H, np.float32),
        "lm_head.weight": rng.standard_normal((V, H)).astype(np.float32),
    }
    for i in range(cfg.num_layers):
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
    topo = Topology.from_dict({"0-1": {"isq": "Q8_0"}, "1-2": {"isq": "Q4_0"}}, 2)
    w = weights_from_state_dict(
        sd, cfg, dtype=jnp.float32, isq=GGMLType.Q8_0, topology=topo
    )
    # mlp.gate (K=64... only I-dim ones K=64<256 skip) — hidden=64 means most
    # tensors skip k-quants; Q8_0/Q4_0 need K%32==0 which holds. Forward runs:
    ids = np.array([[1, 5, 9]], np.int32)
    cache = KVCache.create(cfg, 1, 8, dtype=jnp.float32)
    pos = jnp.arange(3)[None].astype(jnp.int32)
    lg, _ = forward(w, cfg, jnp.asarray(ids), pos, cache,
                    jnp.zeros((1,), jnp.int32), backend="xla",
                    compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(lg)).all()
