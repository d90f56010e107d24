"""X-LoRA: classifier-driven adapter mixing; one-hot scalings must reproduce
single-adapter dynamic LoRA (analog of the reference's xlora_models)."""

import numpy as np

import jax
import jax.numpy as jnp

from mistralrs_tpu.lora import attach_dynamic_lora
from mistralrs_tpu.models import ModelConfig
from mistralrs_tpu.models.hf_loader import weights_from_state_dict
from mistralrs_tpu.models.llama import KVCache, forward
from mistralrs_tpu.xlora import (
    XLoraConfig,
    attach_xlora,
    classifier_forward,
    make_classifier,
    xlora_forward,
)

CFG = ModelConfig(
    arch="llama", vocab_size=128, hidden_size=64, intermediate_size=128,
    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
)


def _base(rng):
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
    cfg = {"r": r, "lora_alpha": 8}
    t = {}
    for i in range(CFG.num_layers):
        b = f"base_model.model.model.layers.{i}."
        t[b + "self_attn.q_proj.lora_A.weight"] = rng.standard_normal((r, 64)).astype(np.float32) * 0.1
        t[b + "self_attn.q_proj.lora_B.weight"] = rng.standard_normal((64, r)).astype(np.float32) * 0.1
    return cfg, t


def test_one_hot_scaling_matches_single_adapter():
    rng = np.random.default_rng(0)
    sd = _base(rng)
    a0 = _adapter(rng)
    a1 = _adapter(rng)
    base = weights_from_state_dict(sd, CFG, dtype=jnp.float32)
    x = attach_xlora(base, [a0, a1], CFG.num_layers)
    single = attach_dynamic_lora(base, a1[0], a1[1], CFG.num_layers, dtype=jnp.float32)

    ids = np.array([[1, 5, 9, 20]], np.int32)
    b, t = ids.shape
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t)).astype(jnp.int32)

    # classifier rigged to always pick adapter 1 (huge bias on logit 1)
    clf = make_classifier(CFG.hidden_size, 2, depth=1)
    clf["layers"][0]["w"] = clf["layers"][0]["w"] * 0.0
    clf["layers"][0]["b"] = jnp.asarray([-100.0, 100.0])

    cache = KVCache.create(CFG, b, t + 2, dtype=jnp.float32)
    got, _, scalings = xlora_forward(
        x, CFG, XLoraConfig(n_adapters=2), clf, jnp.asarray(ids), positions,
        cache, jnp.zeros((b,), jnp.int32), backend="xla",
    )
    np.testing.assert_allclose(np.asarray(scalings)[..., 1], 1.0, atol=1e-6)

    cache2 = KVCache.create(CFG, b, t + 2, dtype=jnp.float32)
    ref, _ = forward(
        single, CFG, jnp.asarray(ids), positions, cache2,
        jnp.zeros((b,), jnp.int32), backend="xla", compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_classifier_shapes():
    clf = make_classifier(64, 3)
    h = jnp.zeros((2, 5, 64))
    out = classifier_forward(clf, h)
    assert out.shape == (2, 5, 3)
