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


def test_load_trained_classifier_matches_torch():
    """Load a saved X-LoRA classifier checkpoint (inner.{i}.*/last.* keys +
    xlora_config.json fields) and match a torch re-implementation of the
    reference semantics (classifier.rs: linears + optional relu, layerwise
    reshape, temperature softmax, top-k zeroing without renorm)."""
    import torch

    from mistralrs_tpu.xlora import (
        XLoraConfig, classifier_scalings, load_classifier,
    )

    H, inner, A, L = 16, 12, 3, 4
    torch.manual_seed(5)
    lin0 = torch.nn.Linear(H, inner)
    lin_last = torch.nn.Linear(inner, L * A)  # layerwise scalings

    cfg_json = {
        "hidden_size": H, "base_model_id": "x",
        "adapters": ["a0", "a1", "a2"],
        "xlora_depth": 2, "xlora_size": inner,
        "layerwise_scalings": True, "enable_softmax": True,
        "softmax_temperature": 0.7, "enable_relu_and_dropout": True,
        "use_bias": True, "top_k_lora": 2, "global_scaling_weight": 1.5,
    }
    xcfg = XLoraConfig.from_json(cfg_json)
    assert xcfg.n_adapters == A and xcfg.top_k_lora == 2

    sd = {
        "internal_xlora_classifier.inner.0.weight": lin0.weight.detach().numpy(),
        "internal_xlora_classifier.inner.0.bias": lin0.bias.detach().numpy(),
        "internal_xlora_classifier.last.weight": lin_last.weight.detach().numpy(),
        "internal_xlora_classifier.last.bias": lin_last.bias.detach().numpy(),
    }
    clf = load_classifier(sd, xcfg)

    hidden = torch.randn(2, 5, H)
    with torch.no_grad():
        t = lin_last(torch.relu(lin0(hidden)))  # [B, T, L*A]
        t = t.reshape(2, 5, L, A)
        t = torch.softmax(t / 0.7, dim=-1)
        vals, idx = torch.topk(t, 2, dim=-1)
        ref = torch.zeros_like(t).scatter_(-1, idx, vals)

    got = classifier_scalings(
        clf, jnp.asarray(hidden.numpy()), xcfg, num_layers=L
    )
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5, atol=1e-6)


def test_load_classifier_from_safetensors(tmp_path):
    from safetensors.numpy import save_file

    from mistralrs_tpu.xlora import XLoraConfig, load_classifier

    rng = np.random.default_rng(0)
    sd = {
        "inner.0.weight": rng.standard_normal((8, 16)).astype(np.float32),
        "inner.0.bias": np.zeros(8, np.float32),
        "last.weight": rng.standard_normal((2, 8)).astype(np.float32),
        "last.bias": np.zeros(2, np.float32),
    }
    p = tmp_path / "xlora_classifier.safetensors"
    save_file(sd, str(p))
    clf = load_classifier(p, XLoraConfig(n_adapters=2, xlora_depth=2))
    assert len(clf["layers"]) == 2
    import pytest as _pt

    with _pt.raises(ValueError):
        load_classifier(p, XLoraConfig(n_adapters=2, xlora_depth=3))


def test_load_xlora_dir_end_to_end(tmp_path):
    """Full artifact-directory round trip: config + classifier + adapters →
    xlora_forward produces per-layer mixed logits."""
    import json

    from safetensors.numpy import save_file

    from mistralrs_tpu.models.hf_loader import weights_from_state_dict
    from mistralrs_tpu.xlora import attach_xlora, load_xlora_dir, xlora_forward

    rng = np.random.default_rng(3)
    root = tmp_path / "xl"
    (root / "adapters" / "a0").mkdir(parents=True)
    (root / "adapters" / "a1").mkdir(parents=True)
    (root / "xlora_config.json").write_text(json.dumps({
        "hidden_size": CFG.hidden_size, "base_model_id": "tiny",
        "adapters": ["a0", "a1"], "xlora_depth": 1,
        "layerwise_scalings": False, "enable_softmax": True,
        "use_bias": True,
    }))
    save_file({
        "last.weight": rng.standard_normal(
            (2, CFG.hidden_size)).astype(np.float32),
        "last.bias": np.zeros(2, np.float32),
    }, str(root / "xlora_classifier.safetensors"))
    for name in ("a0", "a1"):
        (root / "adapters" / name / "adapter_config.json").write_text(
            json.dumps({"r": 2, "lora_alpha": 4})
        )
        at = {}
        for i in range(CFG.num_layers):
            pre = f"base_model.model.model.layers.{i}.self_attn.q_proj"
            at[pre + ".lora_A.weight"] = (
                rng.standard_normal((2, CFG.hidden_size)).astype(np.float32) * 0.1)
            at[pre + ".lora_B.weight"] = (
                rng.standard_normal((CFG.q_dim, 2)).astype(np.float32) * 0.1)
        save_file(at, str(root / "adapters" / name / "adapter_model.safetensors"))

    xcfg, clf, adapters = load_xlora_dir(root)
    assert xcfg.n_adapters == 2 and len(adapters) == 2
    sd = _base(rng)
    w = weights_from_state_dict(sd, CFG, dtype=jnp.float32)
    w = attach_xlora(w, adapters, CFG.num_layers)
    from mistralrs_tpu.models.llama import KVCache

    ids = jnp.asarray([[1, 2, 3]], jnp.int32)
    pos = jnp.asarray([[0, 1, 2]], jnp.int32)
    cache = KVCache.create(CFG, 1, 8, dtype=jnp.float32)
    logits, _, scal = xlora_forward(
        w, CFG, xcfg, clf, ids, pos, cache, jnp.zeros((1,), jnp.int32),
    )
    assert logits.shape == (1, 3, CFG.vocab_size)
    np.testing.assert_allclose(np.asarray(scal).sum(-1), 1.0, rtol=1e-5)
