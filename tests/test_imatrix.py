"""imatrix: calibration collection via the layer scan, weighted k-quant fit,
and ISQ-with-imatrix improving activation-weighted fidelity (the analog of
the reference's imatrix-guided ISQ flow)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mistralrs_tpu.gguf import GGMLType, dequantize
from mistralrs_tpu.gguf.quants import quantize, quantize_imatrix
from mistralrs_tpu.imatrix import (
    ImatrixCollector,
    imatrix_rows_for_key,
    load_imatrix,
    save_imatrix,
)
from mistralrs_tpu.models import ModelConfig, init_random_weights


def test_weighted_quant_reduces_weighted_error():
    rng = np.random.default_rng(0)
    n, k = 8, 512
    w = rng.standard_normal((n, k)).astype(np.float32)
    # heavy-tailed per-column importance (varies WITHIN 32-wide quant groups;
    # group-uniform importance is scale-invariant and changes nothing)
    imp = rng.exponential(1.0, size=(k,)).astype(np.float32) ** 3
    raw_u = quantize(w, GGMLType.Q4_K)
    raw_w = quantize_imatrix(w, GGMLType.Q4_K, imp)
    deq_u = dequantize(raw_u, GGMLType.Q4_K, (n, k))
    deq_w = dequantize(raw_w, GGMLType.Q4_K, (n, k))
    err_u = (imp * (deq_u - w) ** 2).sum()
    err_w = (imp * (deq_w - w) ** 2).sum()
    assert err_w < err_u, (err_w, err_u)


def test_collector_shapes_and_roundtrip(tmp_path):
    cfg = ModelConfig(
        arch="llama", vocab_size=64, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
        max_position_embeddings=64,
    )
    weights = init_random_weights(cfg, seed=5, dtype=jnp.float32)
    coll = ImatrixCollector(cfg)
    rng = np.random.default_rng(1)
    for _ in range(2):
        coll.update(weights, rng.integers(0, 64, size=(2, 16)))
    im = coll.finalize()
    assert im["attn_in"].shape == (2, 32)
    assert im["o_in"].shape == (2, cfg.num_heads * cfg.head_dim)
    assert im["mlp_in"].shape == (2, 32)
    assert im["down_in"].shape == (2, 64)
    assert all(np.all(v >= 0) for v in im.values())
    assert any(np.any(v > 0) for v in im.values())
    p = tmp_path / "imatrix.npz"
    save_imatrix(p, im)
    loaded = load_imatrix(p)
    for k in im:
        np.testing.assert_array_equal(loaded[k], im[k])
    # key mapping
    assert imatrix_rows_for_key(im, "wq").shape == (2, 32)
    assert imatrix_rows_for_key(im, "down").shape == (2, 64)
    assert imatrix_rows_for_key(im, "attn_norm") is None


def test_isq_with_imatrix_end_to_end():
    """ISQ with a collected imatrix loads and runs; weighted quantization
    tracks the calibration distribution at least as well as unweighted."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from mistralrs_tpu.models.config import config_from_hf
    from mistralrs_tpu.models.hf_loader import weights_from_state_dict
    from mistralrs_tpu.models.llama import KVCache, forward

    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    torch.manual_seed(40)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    cfg = config_from_hf(hf_cfg.to_dict() | {"architectures": ["LlamaForCausalLM"]})
    dense = weights_from_state_dict(sd, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(7)
    calib = rng.integers(0, 128, size=(4, 32))
    coll = ImatrixCollector(cfg)
    coll.update(dense, calib)
    im = coll.finalize()

    q_plain = weights_from_state_dict(sd, cfg, dtype=jnp.float32,
                                      isq=GGMLType.Q4_K)
    q_im = weights_from_state_dict(sd, cfg, dtype=jnp.float32,
                                   isq=GGMLType.Q4_K, imatrix=im)

    ids = np.asarray(calib[:1, :16], np.int32)
    positions = jnp.broadcast_to(jnp.arange(16)[None], (1, 16)).astype(jnp.int32)

    def logits(w):
        cache = KVCache.create(cfg, 1, 16, dtype=jnp.float32)
        out, _ = forward(w, cfg, jnp.asarray(ids), positions, cache,
                         jnp.zeros((1,), jnp.int32), backend="xla",
                         compute_dtype=jnp.float32)
        return np.asarray(out)

    ref = logits(dense)
    err_plain = np.abs(logits(q_plain) - ref).mean()
    err_im = np.abs(logits(q_im) - ref).mean()
    # both close; imatrix-guided no worse than ~parity on calibration data
    assert err_im < err_plain * 1.25, (err_im, err_plain)
