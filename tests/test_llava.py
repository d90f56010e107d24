"""LLaVA multimodal parity vs HF torch (tiny random model): vision tower,
projector, image-embedding merge, full logits."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mistralrs_tpu.models.llava import (
    LlavaConfig,
    llava_forward,
    llava_weights_from_state_dict,
)
from mistralrs_tpu.models.llama import KVCache


def _tiny_llava():
    vision_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=24, patch_size=8,
    )
    text_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    cfg = transformers.LlavaConfig(
        vision_config=vision_cfg, text_config=text_cfg,
        image_token_index=100, vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        image_seq_length=9,  # (24/8)^2 = 9 patches
    )
    torch.manual_seed(0)
    model = transformers.LlavaForConditionalGeneration(cfg).eval()
    return cfg, model


def test_llava_logits_match_torch():
    hf_cfg, model = _tiny_llava()
    sd = {k: v.detach().numpy().astype(np.float32) for k, v in model.state_dict().items()}
    cfg = LlavaConfig.from_hf(hf_cfg.to_dict())
    weights = llava_weights_from_state_dict(sd, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(1)
    pixel = rng.standard_normal((1, 3, 24, 24)).astype(np.float32)
    # 9 image placeholders + text
    ids = np.array([[1] + [100] * 9 + [5, 9, 20]], np.int64)
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids), pixel_values=torch.tensor(pixel)
        ).logits.numpy()

    b, t = ids.shape
    cache = KVCache.create(cfg.text, b, t + 4, dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t)).astype(jnp.int32)
    got, _ = llava_forward(
        weights, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(pixel),
        positions, cache, jnp.zeros((b,), jnp.int32),
        backend="xla", compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=5e-4, atol=5e-4)


def test_text_only_path_unaffected():
    hf_cfg, model = _tiny_llava()
    sd = {k: v.detach().numpy().astype(np.float32) for k, v in model.state_dict().items()}
    cfg = LlavaConfig.from_hf(hf_cfg.to_dict())
    weights = llava_weights_from_state_dict(sd, cfg, dtype=jnp.float32)
    ids = np.array([[1, 5, 9, 20]], np.int64)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids)).logits.numpy()
    b, t = ids.shape
    cache = KVCache.create(cfg.text, b, t + 4, dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t)).astype(jnp.int32)
    got, _ = llava_forward(
        weights, cfg, jnp.asarray(ids, jnp.int32), None, positions, cache,
        jnp.zeros((b,), jnp.int32), backend="xla", compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=5e-4, atol=5e-4)
