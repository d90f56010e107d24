"""bitsandbytes NF4/FP4: codec round-trips, double-quant decoding, and
loading a bnb-serialized llama checkpoint through the HF loader."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from mistralrs_tpu.quant.bnb import (
    BLOCKSIZE,
    FP4_CODE,
    NF4_CODE,
    decode_bnb_param,
    dequantize_4bit,
    quantize_4bit,
)


def test_nf4_roundtrip_exact_on_representable():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, size=(4, BLOCKSIZE))
    absmax = rng.uniform(0.5, 2.0, size=(4,)).astype(np.float32)
    w = NF4_CODE[codes] * absmax[:, None]
    packed, am = quantize_4bit(w, NF4_CODE)
    got = dequantize_4bit(packed, am, NF4_CODE, w.shape)
    np.testing.assert_allclose(got, w, rtol=1e-6, atol=1e-7)


def test_nf4_error_bound():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((8, 256)).astype(np.float32)
    packed, am = quantize_4bit(w, NF4_CODE)
    deq = dequantize_4bit(packed, am, NF4_CODE, w.shape)
    rel = np.abs(deq - w).mean() / np.abs(w).mean()
    assert rel < 0.12, rel
    # FP4 is coarser but still bounded
    packed, am = quantize_4bit(w, FP4_CODE)
    deq = dequantize_4bit(packed, am, FP4_CODE, w.shape)
    rel = np.abs(deq - w).mean() / np.abs(w).mean()
    assert rel < 0.35, rel


def test_double_quantized_absmax():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((4, 128)).astype(np.float32)
    packed, am = quantize_4bit(w, NF4_CODE)
    # double-quantize the absmax: 8-bit indices into a 256-entry map
    offset = float(am.mean())
    centered = am - offset
    nested_absmax = np.array([np.abs(centered).max() + 1e-9], np.float32)
    nested_map = np.linspace(-1, 1, 256).astype(np.float32)
    idx = np.abs(centered[:, None] / nested_absmax[0] - nested_map[None]).argmin(-1)
    deq = dequantize_4bit(
        packed, idx.astype(np.uint8), NF4_CODE, w.shape,
        nested_absmax=nested_absmax, nested_quant_map=nested_map,
        absmax_offset=offset,
    )
    ref = dequantize_4bit(packed, am, NF4_CODE, w.shape)
    rel = np.abs(deq - ref).mean() / np.abs(ref).mean()
    assert rel < 0.02, rel


def test_bnb_checkpoint_loads():
    """A bnb-4bit-serialized llama loads and stays close to the dense one."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from mistralrs_tpu.models.config import config_from_hf
    from mistralrs_tpu.models.hf_loader import weights_from_state_dict
    from mistralrs_tpu.models.llama import KVCache, forward

    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    torch.manual_seed(120)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}

    # bnb-serialize every linear projection weight
    sd_q = dict(sd)
    for name in list(sd_q):
        if not name.endswith("_proj.weight"):
            continue
        w = sd_q[name]
        packed, am = quantize_4bit(w, NF4_CODE)
        state = json.dumps({"shape": list(w.shape), "blocksize": BLOCKSIZE})
        sd_q[name] = packed
        sd_q[name + ".absmax"] = am
        sd_q[name + ".quant_map"] = NF4_CODE
        sd_q[name + ".quant_state.bitsandbytes__nf4"] = np.frombuffer(
            state.encode(), np.uint8
        )

    cfg = config_from_hf(hf_cfg.to_dict() | {"architectures": ["LlamaForCausalLM"]})
    w_dense = weights_from_state_dict(sd, cfg, dtype=jnp.float32)
    w_bnb = weights_from_state_dict(
        sd_q, cfg, dtype=jnp.float32, quant_config={"quant_method": "bitsandbytes"}
    )
    ids = np.array([[1, 7, 23, 50]], np.int32)
    positions = jnp.broadcast_to(jnp.arange(4)[None], (1, 4)).astype(jnp.int32)

    def run(w):
        cache = KVCache.create(cfg, 1, 8, dtype=jnp.float32)
        out, _ = forward(w, cfg, jnp.asarray(ids), positions, cache,
                         jnp.zeros((1,), jnp.int32), compute_dtype=jnp.float32)
        return np.asarray(out)

    dense, bnb = run(w_dense), run(w_bnb)
    np.testing.assert_allclose(bnb, dense, rtol=0.35, atol=0.35)
    assert not np.allclose(bnb, dense)  # actually quantized
