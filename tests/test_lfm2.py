"""LFM2 hybrid conv/attention model: logit parity vs HF + cached-decode
consistency (the conv-state analog of the reference's hybrid-cache tests)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mistralrs_tpu.models.lfm2 import (
    Lfm2Cache,
    Lfm2Config,
    lfm2_forward,
    lfm2_greedy_generate,
    lfm2_weights_from_state_dict,
)


def _tiny():
    hf_cfg = transformers.Lfm2Config(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        layer_types=["conv", "full_attention", "conv", "full_attention"],
        conv_L_cache=3, max_position_embeddings=64,
        block_auto_adjust_ff_dim=False, pad_token_id=0,
    )
    torch.manual_seed(20)
    model = transformers.Lfm2ForCausalLM(hf_cfg).eval()
    cfg = Lfm2Config.from_hf(hf_cfg.to_dict())
    sd = {k: v.detach().numpy().astype(np.float32) for k, v in model.state_dict().items()}
    weights = lfm2_weights_from_state_dict(sd, cfg)
    return hf_cfg, model, cfg, weights


def test_lfm2_parity():
    _, model, cfg, weights = _tiny()
    ids = np.array([[3, 17, 40, 9, 22, 61, 5, 2]], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    b, t = ids.shape
    cache = Lfm2Cache.create(cfg, b, t + 4)
    positions = np.broadcast_to(np.arange(t)[None], (b, t)).astype(np.int32)
    got, _ = lfm2_forward(
        weights, cfg, jnp.asarray(ids), jnp.asarray(positions), cache,
        jnp.zeros((b,), jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=3e-4, atol=3e-4)


def test_lfm2_cached_decode_matches_hf_generate():
    """Conv-state + KV cached decode reproduces HF greedy generation."""
    _, model, cfg, weights = _tiny()
    prompt = [3, 17, 40, 9]
    with torch.no_grad():
        ref = model.generate(
            torch.tensor([prompt]), max_new_tokens=8, do_sample=False
        )[0, len(prompt):].tolist()
    got = lfm2_greedy_generate(weights, cfg, prompt, max_new_tokens=8)
    assert got == ref[: len(got)]
