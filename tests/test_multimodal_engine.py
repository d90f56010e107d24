"""Multimodal serving: image requests through the continuous-batching engine
(prompt-embeds prefill path + encoder cache)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mistralrs_tpu.engine.engine import Engine
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.models.llava import (
    EncoderCache,
    LlavaConfig,
    llava_weights_from_state_dict,
    prepare_multimodal_prompt,
)


def test_image_request_through_engine():
    vision_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=24, patch_size=8,
    )
    text_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
    )
    hf_cfg = transformers.LlavaConfig(
        vision_config=vision_cfg, text_config=text_cfg,
        image_token_index=100, vision_feature_layer=-2,
        vision_feature_select_strategy="default", image_seq_length=9,
    )
    torch.manual_seed(3)
    model = transformers.LlavaForConditionalGeneration(hf_cfg).eval()
    sd = {k: v.detach().numpy().astype(np.float32) for k, v in model.state_dict().items()}
    cfg = LlavaConfig.from_hf(hf_cfg.to_dict())
    weights = llava_weights_from_state_dict(sd, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(5)
    pixel = rng.standard_normal((1, 3, 24, 24)).astype(np.float32)
    ids = [1] + [100] * 9 + [5, 9, 20]

    # torch greedy reference
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor([ids]), pixel_values=torch.tensor(pixel),
            max_new_tokens=5, do_sample=False,
        )[0, len(ids):].tolist()

    cache = EncoderCache()
    pids, embeds = prepare_multimodal_prompt(
        weights, cfg, ids, pixel, encoder_cache=cache, compute_dtype=jnp.float32
    )
    eng = Engine(
        cfg.text, weights["text"], num_blocks=32, block_size=16, max_batch=2,
        backend="xla", compute_dtype=jnp.float32,
    )
    seq = eng.add_request(
        pids, SamplingParams(temperature=0.0, max_tokens=5), prompt_embeds=embeds
    )
    eng.run_to_completion()
    assert seq.output_ids == hf_out

    # second request with the same image hits the encoder cache
    prepare_multimodal_prompt(weights, cfg, ids, pixel, encoder_cache=cache,
                              compute_dtype=jnp.float32)
    assert cache.hits == 1 and cache.misses == 1
