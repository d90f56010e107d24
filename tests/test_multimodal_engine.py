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
    pids, embeds, _extra = prepare_multimodal_prompt(
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

def _run_engine_greedy(text_cfg, text_weights, pids, embeds, n, dtype=jnp.float32):
    eng = Engine(
        text_cfg, text_weights, num_blocks=32, block_size=16, max_batch=2,
        backend="xla", compute_dtype=dtype,
    )
    seq = eng.add_request(
        pids, SamplingParams(temperature=0.0, max_tokens=n), prompt_embeds=embeds
    )
    eng.run_to_completion()
    return seq.output_ids


def test_idefics3_through_engine():
    from mistralrs_tpu.models.idefics3 import (
        Idefics3Config,
        idefics3_weights_from_state_dict,
        prepare_multimodal_prompt as prep_idefics3,
    )

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
    ids = [5, 9] + [120] * 4 + [7, 3]
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(pixels)[None],
            max_new_tokens=5, do_sample=False,
        )[0, len(ids):].tolist()

    pids, embeds, extra = prep_idefics3(
        weights, cfg, ids, pixels, compute_dtype=jnp.float32
    )
    assert extra  # media digest chained into KV block hashes
    got = _run_engine_greedy(cfg.text, weights["text"], pids, embeds, 5)
    assert got == hf_out


def test_gemma3_vl_through_engine():
    from mistralrs_tpu.models.gemma3_vl import (
        Gemma3VLConfig,
        gemma3_vl_weights_from_state_dict,
        prepare_multimodal_prompt as prep_gemma3,
    )

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
    ids = [3, 17, 151] + [150] * 4 + [152, 9, 22]
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor([ids]), pixel_values=torch.tensor(pixels),
            max_new_tokens=5, do_sample=False,
        )[0, len(ids):].tolist()

    pids, embeds, _ = prep_gemma3(
        weights, cfg, ids, pixels, compute_dtype=jnp.float32
    )
    got = _run_engine_greedy(cfg.text, weights["text"], pids, embeds, 5)
    assert got == hf_out


def test_qwen2vl_through_engine():
    """M-RoPE serving: prefill from the 3 position streams, decode at
    token-index + mrope delta — greedy tokens match HF generate."""
    from transformers.models.qwen2_vl.configuration_qwen2_vl import (
        Qwen2VLVisionConfig as HFVC,
    )

    from mistralrs_tpu.models.qwen2vl import (
        Qwen2VLConfig,
        prepare_multimodal_prompt as prep_qwen2vl,
        qwen2vl_weights_from_state_dict,
    )

    vis = HFVC(embed_dim=32, depth=2, num_heads=4, hidden_size=48,
               patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
               in_channels=3).to_dict()
    txt = dict(vocab_size=160, hidden_size=48, intermediate_size=96,
               num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=2, max_position_embeddings=128,
               rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
               tie_word_embeddings=False, rms_norm_eps=1e-5)
    hf_cfg = transformers.Qwen2VLConfig(
        vision_config=vis, text_config=txt,
        image_token_id=150, video_token_id=151, vision_start_token_id=152,
        pad_token_id=0,
    )
    torch.manual_seed(140)
    model = transformers.Qwen2VLForConditionalGeneration(hf_cfg).eval()
    cfg = Qwen2VLConfig.from_hf(hf_cfg.to_dict())
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    weights = qwen2vl_weights_from_state_dict(sd, cfg)
    assert cfg.text.mrope_section  # engine picks M-RoPE off the text config

    grid = (1, 4, 4)
    rng = np.random.default_rng(2)
    patches = rng.standard_normal((16, 3 * 2 * 16)).astype(np.float32)
    ids = [3, 17, 152] + [150] * 4 + [9, 22]
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor([list(grid)]),
            max_new_tokens=6, do_sample=False,
        )[0, len(ids):].tolist()

    pids, embeds, extra, pos3 = prep_qwen2vl(
        weights, cfg, ids, patches, grid, compute_dtype=jnp.float32
    )
    assert extra
    eng = Engine(
        cfg.text, weights["text"], num_blocks=32, block_size=16, max_batch=2,
        backend="xla", compute_dtype=jnp.float32,
    )
    seq = eng.add_request(
        pids, SamplingParams(temperature=0.0, max_tokens=6),
        prompt_embeds=embeds, mrope_positions=pos3,
    )
    eng.run_to_completion()
    assert seq.output_ids == hf_out

    # text-only request through the same M-RoPE engine (streams all equal)
    ids2 = [3, 17, 40, 9, 22, 61]
    with torch.no_grad():
        hf_out2 = model.generate(
            input_ids=torch.tensor([ids2]), max_new_tokens=6, do_sample=False,
        )[0, len(ids2):].tolist()
    seq2 = eng.add_request(ids2, SamplingParams(temperature=0.0, max_tokens=6))
    eng.run_to_completion()
    assert seq2.output_ids == hf_out2
