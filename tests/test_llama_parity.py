"""Numerical parity of the JAX llama-family model against the HF torch
reference (the analog of the reference's chat-template/testgen goldens +
kernel-vs-CPU-reference strategy, SURVEY.md §4) — here we compare full-model
logits on tiny random models, CPU-only.
"""

import tempfile

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mistralrs_tpu.convert import convert_hf_to_gguf
from mistralrs_tpu.gguf.constants import GGMLType
from mistralrs_tpu.models.config import config_from_hf
from mistralrs_tpu.models.gguf_loader import load_gguf_model
from mistralrs_tpu.models.hf_loader import weights_from_state_dict
from mistralrs_tpu.models.llama import KVCache, forward


def _tiny_llama_torch(seed=0, n_kv=2):
    cfg = transformers.LlamaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=n_kv,
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attention_bias=False,
    )
    torch.manual_seed(seed)
    model = transformers.LlamaForCausalLM(cfg).eval()
    return cfg, model


def _state_dict_np(model):
    return {k: v.detach().numpy().astype(np.float32) for k, v in model.state_dict().items()}


def _torch_logits(model, ids):
    with torch.no_grad():
        return model(torch.tensor(ids)).logits.numpy()


def _jax_logits(cfg, weights, ids):
    ids = np.asarray(ids, np.int32)
    b, t = ids.shape
    cache = KVCache.create(cfg, b, t + 8, dtype=jnp.float32)
    positions = np.broadcast_to(np.arange(t)[None], (b, t)).astype(np.int32)
    logits, cache = forward(
        weights, cfg, jnp.asarray(ids), jnp.asarray(positions), cache,
        jnp.zeros((b,), jnp.int32), backend="xla", compute_dtype=jnp.float32,
    )
    return np.asarray(logits), cache


def test_prefill_logits_match_torch():
    hf_cfg, model = _tiny_llama_torch()
    sd = _state_dict_np(model)
    cfg = config_from_hf(hf_cfg.to_dict() | {"architectures": ["LlamaForCausalLM"]})
    weights = weights_from_state_dict(sd, cfg, dtype=jnp.float32)
    ids = np.array([[1, 5, 9, 200, 7, 3]], np.int32)
    ref = _torch_logits(model, ids)
    got, _ = _jax_logits(cfg, weights, ids)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_decode_matches_prefill():
    """Incremental decode with the KV cache == one-shot prefill."""
    hf_cfg, model = _tiny_llama_torch(seed=1)
    sd = _state_dict_np(model)
    cfg = config_from_hf(hf_cfg.to_dict() | {"architectures": ["LlamaForCausalLM"]})
    weights = weights_from_state_dict(sd, cfg, dtype=jnp.float32)
    ids = np.array([[1, 5, 9, 200, 7, 3]], np.int32)
    full, _ = _jax_logits(cfg, weights, ids)
    # prefill 4, then decode tokens 5..6 one at a time
    pre = ids[:, :4]
    _, cache = _jax_logits(cfg, weights, pre)
    # recreate cache with same capacity as full test? use fresh path:
    cache = KVCache.create(cfg, 1, ids.shape[1] + 8, dtype=jnp.float32)
    logits, cache = forward(
        weights, cfg, jnp.asarray(pre),
        jnp.arange(4)[None].astype(jnp.int32), cache,
        jnp.zeros((1,), jnp.int32), backend="xla", compute_dtype=jnp.float32,
    )
    for t in range(4, 6):
        step_ids = jnp.asarray(ids[:, t : t + 1])
        logits, cache = forward(
            weights, cfg, step_ids,
            jnp.asarray([[t]], jnp.int32), cache,
            jnp.asarray([t], jnp.int32), backend="xla", compute_dtype=jnp.float32,
        )
        np.testing.assert_allclose(
            np.asarray(logits)[:, -1], full[:, t], rtol=2e-4, atol=2e-4
        )


def test_gguf_roundtrip_matches_torch():
    """HF → GGUF (F32, llama.cpp permute) → loader → logits parity."""
    hf_cfg, model = _tiny_llama_torch(seed=2)
    sd = _state_dict_np(model)
    cfg = config_from_hf(hf_cfg.to_dict() | {"architectures": ["LlamaForCausalLM"]})
    path = tempfile.mktemp(suffix=".gguf")
    convert_hf_to_gguf(sd, cfg, path)
    gcfg, weights, md = load_gguf_model(path, dtype=jnp.float32)
    assert gcfg.num_layers == cfg.num_layers
    assert gcfg.num_kv_heads == cfg.num_kv_heads
    ids = np.array([[3, 1, 77, 120, 9]], np.int32)
    ref = _torch_logits(model, ids)
    got, _ = _jax_logits(gcfg, weights, ids)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_gguf_quantized_close_to_torch():
    """Q8_0-quantized GGUF stays close to the f32 reference."""
    hf_cfg, model = _tiny_llama_torch(seed=3)
    sd = _state_dict_np(model)
    cfg = config_from_hf(hf_cfg.to_dict() | {"architectures": ["LlamaForCausalLM"]})
    path = tempfile.mktemp(suffix=".gguf")
    convert_hf_to_gguf(sd, cfg, path, quant=GGMLType.Q8_0)
    gcfg, weights, _ = load_gguf_model(path, dtype=jnp.float32)
    ids = np.array([[3, 1, 77, 120, 9]], np.int32)
    ref = _torch_logits(model, ids)
    got, _ = _jax_logits(gcfg, weights, ids)
    # quantization error bound, not exactness
    denom = np.abs(ref).max()
    assert np.abs(got - ref).max() / denom < 0.05
