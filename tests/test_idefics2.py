"""Idefics2: perceiver-resampler connector parity vs HF and engine-served
multimodal."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers.models.idefics2.configuration_idefics2 import (
    Idefics2Config as HFCfg,
    Idefics2PerceiverConfig as HFPC,
    Idefics2VisionConfig as HFVC,
)
from transformers.models.idefics2.modeling_idefics2 import (
    Idefics2ForConditionalGeneration,
)

from mistralrs_tpu.models.idefics2 import (
    Idefics2Config,
    encode_images,
    idefics2_weights_from_state_dict,
    prepare_multimodal_prompt,
)


def _tiny():
    vc = HFVC(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
              num_attention_heads=4, image_size=16, patch_size=8)
    pc = HFPC(hidden_act="silu", resampler_n_latents=4, resampler_depth=2,
              resampler_n_heads=4, resampler_head_dim=12,
              num_key_value_heads=2)
    txt = dict(model_type="mistral", vocab_size=136, hidden_size=48,
               intermediate_size=96, num_hidden_layers=2,
               num_attention_heads=4, num_key_value_heads=2, head_dim=12,
               max_position_embeddings=128)
    hf_cfg = HFCfg(vision_config=vc.to_dict(), perceiver_config=pc.to_dict(),
                   text_config=txt, image_token_id=130)
    torch.manual_seed(230)
    model = Idefics2ForConditionalGeneration(hf_cfg).eval()
    cfg = Idefics2Config.from_hf(hf_cfg.to_dict())
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    return hf_cfg, model, cfg, idefics2_weights_from_state_dict(sd, cfg)


def test_idefics2_image_features_parity():
    hf_cfg, model, cfg, weights = _tiny()
    rng = np.random.default_rng(0)
    px = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = model.model.get_image_features(
            pixel_values=torch.tensor(px[None]),
            pixel_attention_mask=None,
        ).numpy()
    got = np.asarray(encode_images(weights, cfg, jnp.asarray(px)))
    assert got.reshape(-1, got.shape[-1]).shape == ref.reshape(-1, ref.shape[-1]).shape
    np.testing.assert_allclose(
        got.reshape(ref.shape), ref, rtol=4e-4, atol=4e-4
    )


def test_idefics2_through_engine():
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams

    hf_cfg, model, cfg, weights = _tiny()
    rng = np.random.default_rng(1)
    px = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    ids = [3, 17] + [130] * cfg.n_latents + [9, 22]
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(px[None]),
            max_new_tokens=6, do_sample=False,
        )[0, len(ids):].tolist()
    pids, embeds, extra = prepare_multimodal_prompt(
        weights, cfg, ids, px, compute_dtype=jnp.float32
    )
    assert extra
    eng = Engine(
        cfg.text, weights["text"], num_blocks=32, block_size=16, max_batch=2,
        backend="xla", compute_dtype=jnp.float32,
    )
    seq = eng.add_request(
        pids, SamplingParams(temperature=0.0, max_tokens=6),
        prompt_embeds=embeds,
    )
    eng.run_to_completion()
    assert seq.output_ids == hf_out
