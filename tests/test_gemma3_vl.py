"""Gemma 3 multimodal: logit parity vs HF Gemma3ForConditionalGeneration."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mistralrs_tpu.models.gemma3_vl import (
    Gemma3VLConfig,
    gemma3_vl_forward,
    gemma3_vl_weights_from_state_dict,
)
from mistralrs_tpu.models.llama import KVCache


def test_gemma3_vl_parity():
    vis = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
               num_attention_heads=4, image_size=16, patch_size=4,
               num_channels=3)
    txt = dict(vocab_size=160, hidden_size=48, intermediate_size=96,
               num_hidden_layers=4, num_attention_heads=4,
               num_key_value_heads=2, head_dim=16,
               max_position_embeddings=128, sliding_window=4,
               query_pre_attn_scalar=16, rope_theta=1000000.0,
               rope_local_base_freq=10000.0, sliding_window_pattern=2)
    hf_cfg = transformers.Gemma3Config(
        vision_config=vis, text_config=txt,
        mm_tokens_per_image=4, image_token_index=150,
        boi_token_index=151, eoi_token_index=152, pad_token_id=0,
    )
    torch.manual_seed(160)
    model = transformers.Gemma3ForConditionalGeneration(hf_cfg).eval()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    d = hf_cfg.to_dict()
    d["image_token_id"] = hf_cfg.image_token_id
    cfg = Gemma3VLConfig.from_hf(d)
    weights = gemma3_vl_weights_from_state_dict(sd, cfg)

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    ids = np.array([[3, 17, 151] + [150] * 4 + [152, 9, 22]], np.int64)
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(pixels),
        ).logits.numpy()
    b, t = ids.shape
    cache = KVCache.create(cfg.text, b, t + 2, dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t)).astype(jnp.int32)
    got, _ = gemma3_vl_forward(
        weights, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(pixels),
        positions, cache, jnp.zeros((b,), jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=6e-4, atol=6e-4)
