"""MXFP4 codec: round-trip exactness on representable values, quantization
error bounds, and gpt-oss MXFP4 checkpoint loading (the analog of the
reference's mxfp4 tests in `mistralrs-quant`)."""

import numpy as np
import pytest

from mistralrs_tpu.quant.mxfp4 import (
    FP4_VALUES,
    dequantize_mxfp4,
    quantize_mxfp4,
)


def test_roundtrip_exact_on_representable():
    # values that are exactly scale * fp4 code survive the round trip
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, size=(4, 64))
    scales_exp = rng.integers(-3, 4, size=(4, 2))
    w = FP4_VALUES[codes] * np.exp2(np.repeat(scales_exp, 32, axis=-1))
    blocks, scales = quantize_mxfp4(w)
    got = dequantize_mxfp4(blocks, scales)
    np.testing.assert_allclose(got, w, rtol=0, atol=0)


def test_quantization_error_bound():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((8, 256)).astype(np.float32)
    blocks, scales = quantize_mxfp4(w)
    deq = dequantize_mxfp4(blocks, scales)
    assert blocks.shape == (8, 8, 16) and scales.shape == (8, 8)
    # fp4 with per-32 e8m0 scales: mean relative error well under 20%
    rel = np.abs(deq - w).mean() / np.abs(w).mean()
    assert rel < 0.2, rel


def test_zero_block():
    w = np.zeros((1, 32), np.float32)
    blocks, scales = quantize_mxfp4(w)
    np.testing.assert_array_equal(dequantize_mxfp4(blocks, scales), w)


def test_gpt_oss_mxfp4_checkpoint_loads():
    """A gpt-oss checkpoint with MXFP4 expert banks decodes to (near) the
    same forward output as the dense checkpoint it was quantized from."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import jax.numpy as jnp

    from mistralrs_tpu.models.config import config_from_hf
    from mistralrs_tpu.models.hf_loader import weights_from_state_dict
    from mistralrs_tpu.models.llama import KVCache, forward

    hf_cfg = transformers.GptOssConfig(
        vocab_size=128, hidden_size=64, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_local_experts=4, num_experts_per_tok=2,
        sliding_window=4, max_position_embeddings=128,
        pad_token_id=0, tie_word_embeddings=False,
        layer_types=["sliding_attention", "full_attention"],
    )
    torch.manual_seed(30)
    model = transformers.GptOssForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}

    # build the MXFP4 variant: replace expert banks with _blocks/_scales in
    # the transposed layout real gpt-oss checkpoints use
    sd_q = dict(sd)
    for i in range(2):
        for name in (f"model.layers.{i}.mlp.experts.gate_up_proj",
                     f"model.layers.{i}.mlp.experts.down_proj"):
            w = sd_q.pop(name)  # [E, in, out]
            wt = np.swapaxes(w, -1, -2)  # stored transposed: [E, out, in]
            blocks, scales = quantize_mxfp4(wt)
            sd_q[name + "_blocks"] = blocks
            sd_q[name + "_scales"] = scales

    cfg = config_from_hf(hf_cfg.to_dict() | {"architectures": ["GptOssForCausalLM"]})
    w_dense = weights_from_state_dict(sd, cfg, dtype=jnp.float32)
    w_mx = weights_from_state_dict(
        sd_q, cfg, dtype=jnp.float32, quant_config={"quant_method": "mxfp4"}
    )

    ids = np.array([[1, 7, 23, 50]], np.int32)
    positions = jnp.broadcast_to(jnp.arange(4)[None], (1, 4)).astype(jnp.int32)

    def run(w):
        cache = KVCache.create(cfg, 1, 8, dtype=jnp.float32)
        out, _ = forward(
            w, cfg, jnp.asarray(ids), positions, cache,
            jnp.zeros((1,), jnp.int32), backend="xla",
            compute_dtype=jnp.float32,
        )
        return np.asarray(out)

    dense, mx = run(w_dense), run(w_mx)
    # fp4 experts perturb logits but stay close on a tiny model
    np.testing.assert_allclose(mx, dense, rtol=0.35, atol=0.35)
    assert not np.allclose(mx, dense)  # actually quantized
