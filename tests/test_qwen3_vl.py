"""Qwen3-VL: DeepStack tower parity vs HF, interleaved M-RoPE, and the
engine's deepstack prefill path."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mistralrs_tpu.models.qwen3_vl import (
    Qwen3VLConfig,
    num_image_tokens,
    prepare_multimodal_prompt,
    qwen3_vl_weights_from_state_dict,
)


def _tiny():
    from transformers.models.qwen3_vl.configuration_qwen3_vl import (
        Qwen3VLConfig as HfQwen3VLConfig,
        Qwen3VLTextConfig,
        Qwen3VLVisionConfig,
    )
    from transformers.models.qwen3_vl.modeling_qwen3_vl import (
        Qwen3VLForConditionalGeneration,
    )

    vc = Qwen3VLVisionConfig(
        hidden_size=32, intermediate_size=64, depth=3, num_heads=4,
        patch_size=8, temporal_patch_size=2, spatial_merge_size=2,
        out_hidden_size=48, num_position_embeddings=16,
        deepstack_visual_indexes=[0, 1],
    )
    tc = Qwen3VLTextConfig(
        vocab_size=160, hidden_size=48, intermediate_size=96,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, max_position_embeddings=128,
        rope_scaling={"rope_type": "default", "mrope_section": [2, 2, 2],
                      "mrope_interleaved": True},
    )
    hf_cfg = HfQwen3VLConfig(
        vision_config=vc.to_dict(), text_config=tc.to_dict(),
        image_token_id=150, video_token_id=151, vision_start_token_id=152,
        pad_token_id=0,
    )
    torch.manual_seed(270)
    model = Qwen3VLForConditionalGeneration(hf_cfg).eval()
    cfg = Qwen3VLConfig.from_hf(hf_cfg.to_dict())
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    return hf_cfg, model, cfg, qwen3_vl_weights_from_state_dict(sd, cfg)


def test_qwen3_vl_tower_parity():
    """Tower + final merger + deepstack taps vs HF Qwen3VLVisionModel on a
    non-square grid (pos-embed 4-corner interpolation exercised)."""
    from mistralrs_tpu.vision.qwen3vl import qwen3vl_vision_forward

    hf_cfg, model, cfg, weights = _tiny()
    grid = (1, 4, 6)
    rng = np.random.default_rng(0)
    patches = rng.standard_normal((24, 3 * 2 * 8 * 8)).astype(np.float32)
    with torch.no_grad():
        ref_tokens, ref_ds = model.model.visual(
            torch.tensor(patches), grid_thw=torch.tensor([list(grid)])
        )
    got_tokens, got_ds = qwen3vl_vision_forward(
        weights["vision"], cfg.vision, jnp.asarray(patches), grid
    )
    np.testing.assert_allclose(
        np.asarray(got_tokens), ref_tokens.numpy(), rtol=2e-3, atol=2e-3
    )
    assert len(ref_ds) == 2
    for j in range(2):
        np.testing.assert_allclose(
            np.asarray(got_ds[j]), ref_ds[j].numpy(), rtol=2e-3, atol=2e-3
        )


def test_qwen3_vl_through_engine():
    """Interleaved M-RoPE + DeepStack through the paged engine: greedy
    parity vs HF generate."""
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams

    hf_cfg, model, cfg, weights = _tiny()
    assert cfg.text.mrope_section and cfg.text.mrope_interleaved
    grid = (1, 4, 4)
    rng = np.random.default_rng(1)
    patches = rng.standard_normal((16, 3 * 2 * 8 * 8)).astype(np.float32)
    n_tok = num_image_tokens(cfg, grid)
    ids = [3, 17, 152] + [150] * n_tok + [9, 22]
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor([list(grid)]),
            max_new_tokens=6, do_sample=False,
        )[0, len(ids):].tolist()

    pids, embeds, extra, pos3, ds_rows = prepare_multimodal_prompt(
        weights, cfg, ids, patches, grid, compute_dtype=jnp.float32
    )
    assert extra
    assert ds_rows.shape == (len(ids), 2, 48)
    assert np.abs(ds_rows[:3]).max() == 0  # text rows carry no visual adds
    eng = Engine(
        cfg.text, weights["text"], num_blocks=32, block_size=16, max_batch=2,
        backend="xla", compute_dtype=jnp.float32,
    )
    seq = eng.add_request(
        pids, SamplingParams(temperature=0.0, max_tokens=6),
        prompt_embeds=embeds, mrope_positions=pos3, deepstack_embeds=ds_rows,
    )
    eng.run_to_completion()
    assert seq.output_ids == hf_out


def test_qwen3_vl_serving_adapter():
    """build_adapter('qwen3_vl'): smart-resize patchify + deepstack kwargs."""
    from mistralrs_tpu.serving.vlm import build_adapter

    hf_cfg, model, cfg, weights = _tiny()
    ad = build_adapter("qwen3_vl", weights, cfg, compute_dtype=jnp.float32)
    rng = np.random.default_rng(2)
    im = rng.integers(0, 255, (32, 32, 3), np.uint8)
    media = ad.process([im])
    grid = media.extras["grid_thw"]
    assert grid[0] == 1
    n = media.counts[0]
    ids = [3, 152] + [150] * n + [9]
    kwargs = ad.prepare(ids, media)
    assert set(kwargs) == {"prompt_embeds", "mrope_positions",
                           "deepstack_embeds"}
    assert kwargs["deepstack_embeds"].shape == (len(ids), 2, 48)
    assert ad.expand(2).startswith("<|vision_start|>")


def test_qwen3_vl_moe_through_engine():
    """Qwen3-VL-MoE: fused expert banks split into the shared MoE loader
    layout; greedy parity vs HF through the engine."""
    from transformers.models.qwen3_vl_moe.configuration_qwen3_vl_moe import (
        Qwen3VLMoeConfig,
        Qwen3VLMoeTextConfig,
        Qwen3VLMoeVisionConfig,
    )
    from transformers.models.qwen3_vl_moe.modeling_qwen3_vl_moe import (
        Qwen3VLMoeForConditionalGeneration,
    )

    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams

    vc = Qwen3VLMoeVisionConfig(
        hidden_size=32, intermediate_size=64, depth=2, num_heads=4,
        patch_size=8, temporal_patch_size=2, spatial_merge_size=2,
        out_hidden_size=48, num_position_embeddings=16,
        deepstack_visual_indexes=[0],
    )
    tc = Qwen3VLMoeTextConfig(
        vocab_size=160, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, max_position_embeddings=128, num_experts=4,
        num_experts_per_tok=2, moe_intermediate_size=32,
        rope_scaling={"rope_type": "default", "mrope_section": [2, 2, 2],
                      "mrope_interleaved": True},
    )
    hf_cfg = Qwen3VLMoeConfig(
        vision_config=vc.to_dict(), text_config=tc.to_dict(),
        image_token_id=150, video_token_id=151, vision_start_token_id=152,
        pad_token_id=0,
    )
    torch.manual_seed(280)
    model = Qwen3VLMoeForConditionalGeneration(hf_cfg).eval()
    cfg = Qwen3VLConfig.from_hf(hf_cfg.to_dict())
    assert cfg.text.num_experts == 4 and cfg.text.norm_topk_prob
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    weights = qwen3_vl_weights_from_state_dict(sd, cfg)

    grid = (1, 4, 4)
    rng = np.random.default_rng(3)
    patches = rng.standard_normal((16, 3 * 2 * 8 * 8)).astype(np.float32)
    n_tok = num_image_tokens(cfg, grid)
    ids = [3, 17, 152] + [150] * n_tok + [9, 22]
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor([list(grid)]),
            max_new_tokens=6, do_sample=False,
        )[0, len(ids):].tolist()

    pids, embeds, extra, pos3, ds_rows = prepare_multimodal_prompt(
        weights, cfg, ids, patches, grid, compute_dtype=jnp.float32
    )
    eng = Engine(
        cfg.text, weights["text"], num_blocks=32, block_size=16, max_batch=2,
        backend="xla", compute_dtype=jnp.float32,
    )
    seq = eng.add_request(
        pids, SamplingParams(temperature=0.0, max_tokens=6),
        prompt_embeds=embeds, mrope_positions=pos3, deepstack_embeds=ds_rows,
    )
    eng.run_to_completion()
    assert seq.output_ids == hf_out
