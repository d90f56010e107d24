"""GLM-4V: bicubic-pos tower parity vs HF and M-RoPE×partial-rotary
engine serving."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mistralrs_tpu.models.glm4v import (
    Glm4vConfig,
    glm4v_weights_from_state_dict,
    num_image_tokens,
    prepare_multimodal_prompt,
)


def _tiny():
    from transformers.models.glm4v.configuration_glm4v import (
        Glm4vConfig as HfGlm4vConfig,
        Glm4vTextConfig,
        Glm4vVisionConfig,
    )
    from transformers.models.glm4v.modeling_glm4v import (
        Glm4vForConditionalGeneration,
    )

    vc = Glm4vVisionConfig(
        depth=2, hidden_size=32, num_heads=4, out_hidden_size=48,
        intermediate_size=64, patch_size=8, temporal_patch_size=2,
        spatial_merge_size=2, image_size=32,
    )
    tc = Glm4vTextConfig(
        vocab_size=160, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
        partial_rotary_factor=0.5,  # head_dim 12, rotary 6 → sections sum 3
        rope_scaling={"rope_type": "default", "mrope_section": [1, 1, 1]},
    )
    hf_cfg = HfGlm4vConfig(
        vision_config=vc.to_dict(), text_config=tc.to_dict(),
        image_token_id=150, video_token_id=151,
        image_start_token_id=152, image_end_token_id=153, pad_token_id=0,
    )
    torch.manual_seed(310)
    model = Glm4vForConditionalGeneration(hf_cfg).eval()
    cfg = Glm4vConfig.from_hf(hf_cfg.to_dict())
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    return hf_cfg, model, cfg, glm4v_weights_from_state_dict(sd, cfg)


def test_glm4v_tower_parity():
    """Tower vs HF Glm4vVisionModel on a grid ≠ the learned pos-embed grid
    (bicubic grid-sample exercised off the identity path)."""
    from mistralrs_tpu.vision.glm4v import glm4v_vision_forward

    hf_cfg, model, cfg, weights = _tiny()
    grid = (1, 6, 4)  # pos grid is 4x4 (32/8) → 6x4 needs real resampling
    rng = np.random.default_rng(0)
    patches = rng.standard_normal((24, 3 * 2 * 8 * 8)).astype(np.float32)
    with torch.no_grad():
        ref = model.model.visual(
            torch.tensor(patches), grid_thw=torch.tensor([list(grid)])
        ).numpy()
    got = np.asarray(glm4v_vision_forward(
        weights["vision"], cfg.vision, jnp.asarray(patches), grid
    ))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=3e-3, atol=3e-3)


def test_glm4v_through_engine():
    """M-RoPE × partial interleaved rotary through the paged engine:
    greedy parity vs HF generate."""
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams

    hf_cfg, model, cfg, weights = _tiny()
    assert cfg.text.mrope_section == (1, 1, 1)
    assert cfg.text.partial_rotary_factor == 0.5
    assert cfg.text.rope_interleaved
    grid = (1, 4, 4)
    rng = np.random.default_rng(1)
    patches = rng.standard_normal((16, 3 * 2 * 8 * 8)).astype(np.float32)
    n_tok = num_image_tokens(cfg, grid)
    ids = [3, 152] + [150] * n_tok + [153, 9]
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor([list(grid)]),
            max_new_tokens=6, do_sample=False,
        )[0, len(ids):].tolist()

    pids, embeds, extra, pos3 = prepare_multimodal_prompt(
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


def test_glm4v_moe_through_engine():
    """GLM-4.5V: glm4moe text (sigmoid noaux-tc routing, dense-prefix) +
    glm4v tower + chunked partial M-RoPE — greedy parity vs HF."""
    from transformers.models.glm4v_moe.configuration_glm4v_moe import (
        Glm4vMoeConfig,
        Glm4vMoeTextConfig,
        Glm4vMoeVisionConfig,
    )
    from transformers.models.glm4v_moe.modeling_glm4v_moe import (
        Glm4vMoeForConditionalGeneration,
    )

    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams

    vc = Glm4vMoeVisionConfig(
        depth=2, hidden_size=32, num_heads=4, out_hidden_size=48,
        intermediate_size=64, patch_size=8, temporal_patch_size=2,
        spatial_merge_size=2, image_size=32,
    )
    tc = Glm4vMoeTextConfig(
        vocab_size=160, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128,
        partial_rotary_factor=0.5, use_qk_norm=True, attention_bias=True,
        n_routed_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        n_shared_experts=1, first_k_dense_replace=1, norm_topk_prob=True,
        rope_scaling={"rope_type": "default", "mrope_section": [2, 1, 1]},
    )
    hf_cfg = Glm4vMoeConfig(
        vision_config=vc.to_dict(), text_config=tc.to_dict(),
        image_token_id=150, video_token_id=151,
        image_start_token_id=152, image_end_token_id=153, pad_token_id=0,
    )
    torch.manual_seed(350)
    model = Glm4vMoeForConditionalGeneration(hf_cfg).eval()
    cfg = Glm4vConfig.from_hf(hf_cfg.to_dict())
    assert cfg.text.arch == "glm4moe" and cfg.text.num_experts == 4
    assert cfg.text.mrope_section == (2, 1, 1) and cfg.text.head_dim == 16
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    weights = glm4v_weights_from_state_dict(sd, cfg)

    grid = (1, 4, 4)
    rng = np.random.default_rng(5)
    patches = rng.standard_normal((16, 3 * 2 * 8 * 8)).astype(np.float32)
    n_tok = num_image_tokens(cfg, grid)
    ids = [3, 152] + [150] * n_tok + [153, 9]
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor([list(grid)]),
            max_new_tokens=6, do_sample=False,
        )[0, len(ids):].tolist()

    pids, embeds, extra, pos3 = prepare_multimodal_prompt(
        weights, cfg, ids, patches, grid, compute_dtype=jnp.float32
    )
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


def test_glm4v_serving_adapter():
    from mistralrs_tpu.serving.vlm import build_adapter

    hf_cfg, model, cfg, weights = _tiny()
    ad = build_adapter("glm4v", weights, cfg, compute_dtype=jnp.float32)
    rng = np.random.default_rng(2)
    im = rng.integers(0, 255, (32, 32, 3), np.uint8)
    media = ad.process([im])
    n = media.counts[0]
    ids = [3, 152] + [150] * n + [153, 9]
    kwargs = ad.prepare(ids, media)
    assert set(kwargs) == {"prompt_embeds", "mrope_positions"}
    assert ad.expand(2).startswith("<|begin_of_image|>")
