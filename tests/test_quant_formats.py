"""GPTQ/AWQ/FP8/HQQ decoding + UQFF serialization roundtrips (the analog of
the reference's quant-format in-module tests, SURVEY.md §4)."""

import tempfile

import numpy as np
import pytest

import jax.numpy as jnp

from mistralrs_tpu.quant.fp8 import E4M3_MAX, Fp8Tensor, fp8_matmul
from mistralrs_tpu.quant.gptq_awq import (
    awq_to_qtensor,
    dequant_awq_reference,
    dequant_gptq_reference,
    gptq_to_qtensor,
)
from mistralrs_tpu.quant.hqq import hqq_quantize
from mistralrs_tpu.quant.qtensor import QTensor


def _pack_gptq_qweight(q: np.ndarray, bits: int) -> np.ndarray:
    """[K, N] codes → int32 [K/(32/bits), N] (GPTQ row packing)."""
    per = 32 // bits
    k, n = q.shape
    out = np.zeros((k // per, n), np.uint32)
    for i in range(per):
        out |= q[i::per].astype(np.uint32) << (i * bits)
    return out.view(np.int32)


_AWQ_ORDER = np.array([0, 2, 4, 6, 1, 3, 5, 7])


def _pack_cols(codes: np.ndarray, bits: int, awq: bool) -> np.ndarray:
    """[G, N] codes → int32 [G, N/(32/bits)] (column packing)."""
    per = 32 // bits
    g, n = codes.shape
    out = np.zeros((g, n // per), np.uint32)
    for i in range(per):
        logical = _AWQ_ORDER[i] if (awq and bits == 4) else i
        out |= codes[:, logical::per].astype(np.uint32) << (i * bits)
    return out.view(np.int32)


@pytest.mark.parametrize("bits", [4, 8])
def test_gptq_roundtrip(bits):
    rng = np.random.default_rng(0)
    k, n, group = 256, 128, 64
    q = rng.integers(0, 1 << bits, (k, n)).astype(np.uint8)
    z = rng.integers(0, (1 << bits) - 1, (k // group, n)).astype(np.uint8)
    s = (rng.random((k // group, n), np.float32) * 0.01 + 0.001).astype(np.float16)
    qweight = _pack_gptq_qweight(q, bits)
    qzeros = _pack_cols(z, bits, awq=False)
    ref = dequant_gptq_reference(qweight, qzeros, s, bits=bits)  # [K, N]
    qt = gptq_to_qtensor(qweight, qzeros, s, bits=bits)
    got = np.asarray(qt.dequantize())  # [N, K]
    np.testing.assert_allclose(got, ref.T, rtol=1e-6, atol=1e-6)


def test_awq_roundtrip():
    rng = np.random.default_rng(1)
    k, n, group = 128, 64, 32
    q = rng.integers(0, 16, (k, n)).astype(np.uint8)
    z = rng.integers(0, 15, (k // group, n)).astype(np.uint8)
    s = (rng.random((k // group, n), np.float32) * 0.01 + 0.001).astype(np.float16)
    qweight = _pack_cols(q, 4, awq=True)
    qzeros = _pack_cols(z, 4, awq=True)
    ref = dequant_awq_reference(qweight, qzeros, s)
    qt = awq_to_qtensor(qweight, qzeros, s)
    np.testing.assert_allclose(np.asarray(qt.dequantize()), ref.T, rtol=1e-6, atol=1e-6)


def test_gptq_4bit_packs_for_pallas():
    rng = np.random.default_rng(2)
    k, n, group = 512, 256, 128
    q = rng.integers(0, 16, (k, n)).astype(np.uint8)
    z = rng.integers(0, 15, (k // group, n)).astype(np.uint8)
    s = (rng.random((k // group, n), np.float32) * 0.01 + 0.001).astype(np.float16)
    qt = gptq_to_qtensor(_pack_gptq_qweight(q, 4), _pack_cols(z, 4, False), s)
    assert qt.packed  # eligible for the fused w4 kernel
    from mistralrs_tpu.ops import quant_matmul

    x = jnp.asarray(rng.standard_normal((4, k), np.float32), jnp.bfloat16)
    out_p = quant_matmul(x, qt, backend="pallas", interpret=True, out_dtype=jnp.float32)
    out_x = quant_matmul(x, qt, backend="xla", out_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), rtol=3e-2, atol=3e-2
    )


def test_fp8_per_tensor():
    rng = np.random.default_rng(3)
    w = rng.standard_normal((64, 128)).astype(np.float32)
    t = Fp8Tensor.quantize(w)
    deq = np.asarray(t.dequantize())
    rel = np.abs(deq - w).mean() / np.abs(w).mean()
    assert rel < 0.05
    x = jnp.asarray(rng.standard_normal((3, 128)), jnp.bfloat16)
    y = fp8_matmul(x, t, out_dtype=jnp.float32)
    ref = np.asarray(x, np.float32) @ deq.T
    np.testing.assert_allclose(np.asarray(y), ref, rtol=3e-2, atol=0.1)


def test_fp8_blockwise():
    rng = np.random.default_rng(4)
    w = rng.standard_normal((100, 200)).astype(np.float32)
    w[:10] *= 100  # big dynamic range across blocks
    t = Fp8Tensor.quantize(w, block_shape=(64, 64))
    deq = np.asarray(t.dequantize())
    rel = np.abs(deq - w).mean() / np.abs(w).mean()
    # fp8 is floating-point: relative error is scale-invariant, so blockwise
    # mainly guards clipping; both paths must stay within e4m3 precision
    assert rel < 0.05
    assert t.scale.shape == (2, 4)  # ceil(100/64), ceil(200/64)


def test_hqq_beats_plain_rounding():
    rng = np.random.default_rng(5)
    w = rng.standard_normal((32, 256)).astype(np.float32) ** 3  # heavy tails
    qt = hqq_quantize(w, bits=4, group_size=64, iters=20)
    hqq_err = np.abs(np.asarray(qt.dequantize()) - w).mean()
    qt0 = hqq_quantize(w, bits=4, group_size=64, iters=0)
    plain_err = np.abs(np.asarray(qt0.dequantize()) - w).mean()
    assert hqq_err <= plain_err * 1.02  # refinement never much worse
    assert hqq_err / np.abs(w).mean() < 0.25


def test_uqff_roundtrip():
    from mistralrs_tpu.gguf.constants import GGMLType
    from mistralrs_tpu.models import ModelConfig
    from mistralrs_tpu.models.hf_loader import weights_from_state_dict
    from mistralrs_tpu.models.llama import KVCache, forward
    from mistralrs_tpu.uqff import load_uqff, save_uqff

    rng = np.random.default_rng(6)
    cfg = ModelConfig(
        arch="llama", vocab_size=256, hidden_size=64, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
    )
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
    weights = weights_from_state_dict(sd, cfg, isq=GGMLType.Q4_0)
    path = tempfile.mktemp(suffix=".uqff")
    save_uqff(path, cfg, weights)
    cfg2, weights2 = load_uqff(path)
    assert cfg2.hidden_size == cfg.hidden_size

    ids = np.array([[1, 5, 9, 77]], np.int32)
    def run(w):
        cache = KVCache.create(cfg, 1, 8, dtype=jnp.float32)
        pos = jnp.arange(4)[None].astype(jnp.int32)
        lg, _ = forward(w, cfg, jnp.asarray(ids), pos, cache,
                        jnp.zeros((1,), jnp.int32), backend="xla",
                        compute_dtype=jnp.float32)
        return np.asarray(lg)
    np.testing.assert_array_equal(run(weights), run(weights2))


def test_gptq_checkpoint_dir_loads():
    """Synthetic GPTQ HF directory → load_hf_model → coherent forward."""
    import json
    import tempfile as tf
    from pathlib import Path

    from safetensors.numpy import save_file

    from mistralrs_tpu.models.hf_loader import load_hf_model
    from mistralrs_tpu.models.llama import KVCache, forward
    from mistralrs_tpu.quant.gptq_awq import dequant_gptq_reference

    rng = np.random.default_rng(7)
    H, I, V, L, group = 64, 128, 128, 2, 32
    d = Path(tf.mkdtemp())
    cfg_json = {
        "architectures": ["LlamaForCausalLM"], "vocab_size": V, "hidden_size": H,
        "intermediate_size": I, "num_hidden_layers": L, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 16, "rms_norm_eps": 1e-5,
        "max_position_embeddings": 128, "tie_word_embeddings": False,
        "quantization_config": {"quant_method": "gptq", "bits": 4, "group_size": group},
    }
    (d / "config.json").write_text(json.dumps(cfg_json))
    sd = {
        "model.embed_tokens.weight": rng.standard_normal((V, H)).astype(np.float32) * 0.05,
        "model.norm.weight": np.ones(H, np.float32),
        "lm_head.weight": rng.standard_normal((V, H)).astype(np.float32) * 0.05,
    }
    dense_ref = {}
    for i in range(L):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        for nm, (n_out, k_in) in [
            ("self_attn.q_proj", (64, H)), ("self_attn.k_proj", (32, H)),
            ("self_attn.v_proj", (32, H)), ("self_attn.o_proj", (H, 64)),
            ("mlp.gate_proj", (I, H)), ("mlp.up_proj", (I, H)),
            ("mlp.down_proj", (H, I)),
        ]:
            q = rng.integers(0, 16, (k_in, n_out)).astype(np.uint8)
            z = rng.integers(0, 15, (k_in // group, n_out)).astype(np.uint8)
            s = (rng.random((k_in // group, n_out), np.float32) * 0.01 + 0.001).astype(np.float16)
            sd[p + nm + ".qweight"] = _pack_gptq_qweight(q, 4)
            sd[p + nm + ".qzeros"] = _pack_cols(z, 4, awq=False)
            sd[p + nm + ".scales"] = s
            dense_ref[p + nm] = dequant_gptq_reference(
                sd[p + nm + ".qweight"], sd[p + nm + ".qzeros"], s
            ).T
    save_file(sd, str(d / "model.safetensors"))
    cfg, weights, _ = load_hf_model(d, dtype=jnp.float32)
    # spot-check one decoded layer weight against the reference dequant
    import jax

    wq = weights["layers"]["wq"]
    wq0 = jax.tree_util.tree_map(lambda x: x[0], wq)
    np.testing.assert_allclose(
        np.asarray(wq0.dequantize()),
        dense_ref["model.layers.0.self_attn.q_proj"],
        rtol=1e-5, atol=1e-5,
    )
    # full forward runs
    ids = np.array([[1, 5, 9]], np.int32)
    cache = KVCache.create(cfg, 1, 8, dtype=jnp.float32)
    pos = jnp.arange(3)[None].astype(jnp.int32)
    lg, _ = forward(weights, cfg, jnp.asarray(ids), pos, cache,
                    jnp.zeros((1,), jnp.int32), backend="xla",
                    compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(lg)).all()
