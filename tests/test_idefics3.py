"""Idefics3/SmolVLM: logit parity vs HF with real image merging."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mistralrs_tpu.models.idefics3 import (
    Idefics3Config,
    idefics3_forward,
    idefics3_weights_from_state_dict,
)
from mistralrs_tpu.models.llama import KVCache


def test_idefics3_parity():
    vis = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
               num_attention_heads=4, image_size=16, patch_size=4,
               num_channels=3)
    txt = dict(vocab_size=128, hidden_size=48, intermediate_size=96,
               num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=2, max_position_embeddings=128,
               tie_word_embeddings=False, rms_norm_eps=1e-5)
    hf_cfg = transformers.Idefics3Config(
        vision_config=vis, text_config=txt, scale_factor=2,
        image_token_id=120, pad_token_id=0,
    )
    torch.manual_seed(110)
    model = transformers.Idefics3ForConditionalGeneration(hf_cfg).eval()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    cfg = Idefics3Config.from_hf(hf_cfg.to_dict())
    weights = idefics3_weights_from_state_dict(sd, cfg)

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    # 16/4 = 4x4 = 16 patches → shuffle /4 → 4 image tokens
    n_img_tokens = 4
    ids = np.array([[5, 9] + [120] * n_img_tokens + [7, 3]], np.int64)

    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(pixels)[None],
        ).logits.numpy()

    b, t = ids.shape
    cache = KVCache.create(cfg.text, b, t + 2, dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t)).astype(jnp.int32)
    got, _ = idefics3_forward(
        weights, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(pixels),
        positions, cache, jnp.zeros((b,), jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=4e-4, atol=4e-4)


def test_siglip_tower_parity():
    """Shared SigLIP vision tower matches HF SiglipVisionModel."""
    from mistralrs_tpu.vision.clip import (
        VisionConfig,
        vision_tower_forward,
        vision_weights_from_hf,
    )

    hf_cfg = transformers.SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=16, patch_size=4,
    )
    torch.manual_seed(3)
    m = transformers.SiglipVisionModel(hf_cfg).eval()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in m.state_dict().items()}
    cfg = VisionConfig.from_hf(hf_cfg.to_dict(), family="siglip")
    w = vision_weights_from_hf(sd, "", cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    px = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.tensor(px)).last_hidden_state.numpy()
    got = np.asarray(vision_tower_forward(w, cfg, jnp.asarray(px), feature_layer=-1))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
