"""FLUX text encoders: logit parity vs HF T5EncoderModel / CLIPTextModel."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mistralrs_tpu.diffusion.text import (
    ClipTextConfig,
    T5Config,
    clip_text_encode,
    clip_text_params_from_state_dict,
    t5_encode,
    t5_params_from_state_dict,
)


def test_t5_encoder_parity():
    hf_cfg = transformers.T5Config(
        vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, feed_forward_proj="gated-gelu", is_encoder_decoder=False,
        use_cache=False, tie_word_embeddings=False,
    )
    torch.manual_seed(70)
    model = transformers.T5EncoderModel(hf_cfg).eval()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    cfg = T5Config.from_hf(hf_cfg.to_dict())
    params = t5_params_from_state_dict(sd, cfg)
    ids = np.array([[3, 17, 40, 9, 22, 61, 5, 1]], np.int64)
    with torch.no_grad():
        ref = model(torch.tensor(ids)).last_hidden_state.numpy()
    got = np.asarray(t5_encode(params, cfg, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_t5_longer_than_max_distance_bucketing():
    hf_cfg = transformers.T5Config(
        vocab_size=64, d_model=32, d_kv=8, d_ff=64, num_layers=1,
        num_heads=2, feed_forward_proj="relu", is_encoder_decoder=False,
        use_cache=False, relative_attention_max_distance=8,
        relative_attention_num_buckets=8, tie_word_embeddings=False,
    )
    torch.manual_seed(71)
    model = transformers.T5EncoderModel(hf_cfg).eval()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    cfg = T5Config.from_hf(hf_cfg.to_dict())
    params = t5_params_from_state_dict(sd, cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 64, size=(2, 24))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).last_hidden_state.numpy()
    got = np.asarray(t5_encode(params, cfg, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_clip_text_parity():
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=32, eos_token_id=2, bos_token_id=1,
        pad_token_id=0, hidden_act="quick_gelu",
    )
    torch.manual_seed(72)
    model = transformers.CLIPTextModel(hf_cfg).eval()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    cfg = ClipTextConfig.from_hf(hf_cfg.to_dict())
    params = clip_text_params_from_state_dict(sd, cfg)
    ids = np.array([[1, 9, 33, 60, 2, 0, 0, 0]], np.int64)
    with torch.no_grad():
        out = model(torch.tensor(ids))
        ref_h = out.last_hidden_state.numpy()
        ref_p = out.pooler_output.numpy()
    got_h, got_p = clip_text_encode(params, cfg, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got_h), ref_h, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_p), ref_p, rtol=3e-4, atol=3e-4)
