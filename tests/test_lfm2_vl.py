"""LFM2-VL (SigLIP2-NaFlex tower + pixel-unshuffle projector into the LFM2
hybrid): parity vs HF and engine-served multimodal."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mistralrs_tpu.models.lfm2_vl import (
    Lfm2VlConfig,
    encode_image,
    lfm2_vl_weights_from_state_dict,
    num_image_tokens,
    prepare_multimodal_prompt,
)


def _tiny():
    from transformers import Lfm2Config
    from transformers.models.lfm2_vl import (
        Lfm2VlConfig as HfLfm2VlConfig,
        Lfm2VlForConditionalGeneration,
    )
    from transformers.models.siglip2 import Siglip2VisionConfig

    vc = Siglip2VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_patches=16, patch_size=8,
    )
    tc = Lfm2Config(
        vocab_size=160, hidden_size=48, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        layer_types=["conv", "full_attention", "conv", "full_attention"],
        conv_L_cache=3, max_position_embeddings=128, pad_token_id=0,
    )
    hf_cfg = HfLfm2VlConfig(
        vision_config=vc, text_config=tc, image_token_id=150,
        downsample_factor=2, projector_hidden_size=64,
    )
    torch.manual_seed(260)
    model = Lfm2VlForConditionalGeneration(hf_cfg).eval()
    cfg = Lfm2VlConfig.from_hf(hf_cfg.to_dict())
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    return hf_cfg, model, cfg, lfm2_vl_weights_from_state_dict(sd, cfg)


def test_lfm2_vl_image_features_parity():
    """encode_image vs HF get_image_features on a 6x4-patch image (pos
    embeds bilinear-resized from the 4x4 learned grid)."""
    hf_cfg, model, cfg, weights = _tiny()
    rng = np.random.default_rng(0)
    h, w = 6, 4
    patches = rng.standard_normal((h * w, 3 * 8 * 8)).astype(np.float32)
    with torch.no_grad():
        ref = model.model.get_image_features(
            torch.tensor(patches)[None],
            spatial_shapes=torch.tensor([[h, w]]),
            pixel_attention_mask=torch.ones(1, h * w, dtype=torch.bool),
        )[0].numpy()
    got = np.asarray(
        encode_image(weights, cfg, jnp.asarray(patches), (h, w))
    )[0]
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_lfm2_vl_through_engine():
    """Image through the paged engine (Lfm2Adapter prompt-embeds path):
    greedy parity vs HF generate."""
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.pipeline import make_adapter

    hf_cfg, model, cfg, weights = _tiny()
    rng = np.random.default_rng(1)
    h, w = 4, 4
    patches = rng.standard_normal((h * w, 3 * 8 * 8)).astype(np.float32)
    n_tok = num_image_tokens(cfg, (h, w))
    ids = [3, 17] + [150] * n_tok + [9, 22]
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(patches)[None],
            spatial_shapes=torch.tensor([[h, w]]),
            pixel_attention_mask=torch.ones(1, h * w, dtype=torch.bool),
            max_new_tokens=6, do_sample=False,
        )[0, len(ids):].tolist()

    pids, embeds, extra = prepare_multimodal_prompt(
        weights, cfg, ids, patches, (h, w), compute_dtype=jnp.float32
    )
    assert extra
    adapter = make_adapter(cfg.text, weights["text"], compute_dtype=jnp.float32)
    eng = Engine(
        cfg.text, weights["text"], adapter=adapter, num_blocks=32,
        block_size=16, max_batch=2, backend="xla", compute_dtype=jnp.float32,
    )
    seq = eng.add_request(
        pids, SamplingParams(temperature=0.0, max_tokens=6),
        prompt_embeds=embeds,
    )
    eng.run_to_completion()
    assert seq.output_ids == hf_out


def test_lfm2_vl_serving_adapter():
    """build_adapter('lfm2_vl'): NaFlex grid rounding, channel-last
    patchify, engine kwargs."""
    from mistralrs_tpu.serving.vlm import build_adapter

    hf_cfg, model, cfg, weights = _tiny()
    ad = build_adapter("lfm2_vl", weights, cfg, compute_dtype=jnp.float32,
                       max_patches=16)
    rng = np.random.default_rng(2)
    im = rng.integers(0, 255, (40, 24, 3), np.uint8)
    media = ad.process([im])
    gh, gw = 4, 4  # 40x24 px → 5x3 patches → rounded to factor-2 multiples
    assert media.pixels.shape == (gh * gw, 3 * 8 * 8)
    assert media.counts == [(gh // 2) * (gw // 2)]
    ids = [3] + [150] * media.counts[0] + [9]
    kwargs = ad.prepare(ids, media)
    assert kwargs["prompt_embeds"].shape == (len(ids), 48)
