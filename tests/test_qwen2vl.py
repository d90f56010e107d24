"""Qwen2-VL: vision tower parity vs HF (tower + merger), then (part 2)
M-RoPE text model parity."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mistralrs_tpu.vision.qwen2vl import (
    Qwen2VLVisionConfig,
    qwen2vl_vision_forward,
    qwen2vl_vision_params,
)


def test_qwen2vl_vision_parity():
    from transformers.models.qwen2_vl.configuration_qwen2_vl import (
        Qwen2VLVisionConfig as HFVC,
    )
    from transformers.models.qwen2_vl.modeling_qwen2_vl import (
        Qwen2VisionTransformerPretrainedModel,
    )

    hf_cfg = HFVC(embed_dim=32, depth=2, num_heads=4, hidden_size=48,
                  patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
                  in_channels=3)
    torch.manual_seed(130)
    model = Qwen2VisionTransformerPretrainedModel(hf_cfg).eval()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    cfg = Qwen2VLVisionConfig.from_hf(hf_cfg.to_dict())
    params = qwen2vl_vision_params(sd, cfg)

    rng = np.random.default_rng(0)
    grid = (1, 4, 4)  # t, h, w patches → 16 patches → 4 merged tokens
    n = grid[0] * grid[1] * grid[2]
    patches = rng.standard_normal(
        (n, 3 * cfg.temporal_patch_size * cfg.patch_size ** 2)
    ).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(patches),
                    grid_thw=torch.tensor([list(grid)])).numpy()
    got = np.asarray(qwen2vl_vision_forward(params, cfg, jnp.asarray(patches), grid))
    assert got.shape == ref.shape == (4, 48)
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_qwen2vl_vision_rect_grid():
    from transformers.models.qwen2_vl.configuration_qwen2_vl import (
        Qwen2VLVisionConfig as HFVC,
    )
    from transformers.models.qwen2_vl.modeling_qwen2_vl import (
        Qwen2VisionTransformerPretrainedModel,
    )

    hf_cfg = HFVC(embed_dim=32, depth=1, num_heads=2, hidden_size=24,
                  patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
                  in_channels=3)
    torch.manual_seed(131)
    model = Qwen2VisionTransformerPretrainedModel(hf_cfg).eval()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    cfg = Qwen2VLVisionConfig.from_hf(hf_cfg.to_dict())
    params = qwen2vl_vision_params(sd, cfg)
    rng = np.random.default_rng(1)
    grid = (1, 6, 4)  # non-square
    n = 24
    patches = rng.standard_normal((n, 3 * 2 * 16)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(patches),
                    grid_thw=torch.tensor([list(grid)])).numpy()
    got = np.asarray(qwen2vl_vision_forward(params, cfg, jnp.asarray(patches), grid))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def _tiny_vl():
    from transformers.models.qwen2_vl.configuration_qwen2_vl import (
        Qwen2VLVisionConfig as HFVC,
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
    from mistralrs_tpu.models.qwen2vl import (
        Qwen2VLConfig,
        qwen2vl_weights_from_state_dict,
    )

    cfg = Qwen2VLConfig.from_hf(hf_cfg.to_dict())
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    return hf_cfg, model, cfg, qwen2vl_weights_from_state_dict(sd, cfg)


def test_qwen2vl_text_mrope_parity():
    """Text-only M-RoPE path (all three streams equal) matches HF."""
    from mistralrs_tpu.models.llama import KVCache
    from mistralrs_tpu.models.qwen2vl import mrope_position_ids, qwen2vl_forward

    _, model, cfg, weights = _tiny_vl()
    ids = np.array([[3, 17, 40, 9, 22, 61]], np.int64)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids)).logits.numpy()
    pos3 = mrope_position_ids(ids[0], cfg.image_token_id, (1, 2, 2))[:, None]
    cache = KVCache.create(cfg.text, 1, ids.shape[1] + 2, dtype=jnp.float32)
    got, _ = qwen2vl_forward(
        weights, cfg, jnp.asarray(ids, jnp.int32), None, None,
        jnp.asarray(pos3), cache, jnp.zeros((1,), jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=4e-4, atol=4e-4)


def test_qwen2vl_multimodal_parity():
    from mistralrs_tpu.models.llama import KVCache
    from mistralrs_tpu.models.qwen2vl import mrope_position_ids, qwen2vl_forward

    _, model, cfg, weights = _tiny_vl()
    grid = (1, 4, 4)  # 16 patches → 4 merged image tokens
    rng = np.random.default_rng(2)
    patches = rng.standard_normal((16, 3 * 2 * 16)).astype(np.float32)
    # HF's get_rope_index locates images via the vision_start token (152)
    ids = np.array([[3, 17, 152] + [150] * 4 + [9, 22]], np.int64)
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor([list(grid)]),
        ).logits.numpy()
    pos3 = mrope_position_ids(ids[0], cfg.image_token_id, grid)[:, None]
    cache = KVCache.create(cfg.text, 1, ids.shape[1] + 2, dtype=jnp.float32)
    got, _ = qwen2vl_forward(
        weights, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(patches),
        grid, jnp.asarray(pos3), cache, jnp.zeros((1,), jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=5e-4, atol=5e-4)


def test_qwen25vl_vision_parity():
    """Qwen2.5-VL windowed vision tower matches HF, window-padded grid."""
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLVisionConfig as HFVC,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel,
    )

    from mistralrs_tpu.vision.qwen2vl import (
        Qwen25VLVisionConfig,
        qwen25vl_vision_forward,
        qwen25vl_vision_params,
    )

    # window_size 16 with patch 4, merge 2 → windows of 2x2 merged tokens;
    # grid 6x4 merged 3x2 → padding exercised; full attention on layer 1
    hf_cfg = HFVC(depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
                  out_hidden_size=48, patch_size=4, temporal_patch_size=2,
                  spatial_merge_size=2, window_size=16,
                  fullatt_block_indexes=[1], in_channels=3)
    torch.manual_seed(150)
    model = Qwen2_5_VisionTransformerPretrainedModel(hf_cfg).eval()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    cfg = Qwen25VLVisionConfig.from_hf(hf_cfg.to_dict())
    params = qwen25vl_vision_params(sd, cfg)
    rng = np.random.default_rng(3)
    grid = (1, 6, 4)
    patches = rng.standard_normal((24, 3 * 2 * 16)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(patches),
                    grid_thw=torch.tensor([list(grid)])).numpy()
    got = np.asarray(qwen25vl_vision_forward(params, cfg, jnp.asarray(patches), grid))
    assert got.shape == ref.shape == (6, 48)
    np.testing.assert_allclose(got, ref, rtol=4e-4, atol=4e-4)
    # multi-frame (video): full-attention layers stay per-frame
    grid = (2, 4, 4)
    patches = rng.standard_normal((32, 3 * 2 * 16)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(patches),
                    grid_thw=torch.tensor([list(grid)])).numpy()
    got = np.asarray(qwen25vl_vision_forward(params, cfg, jnp.asarray(patches), grid))
    np.testing.assert_allclose(got, ref, rtol=4e-4, atol=4e-4)


def test_qwen25vl_through_engine():
    """Qwen2.5-VL end-to-end: windowed tower + M-RoPE text through the
    paged engine, greedy parity vs HF generate."""
    import torch

    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLConfig as HfCfg,
        Qwen2_5_VLTextConfig,
        Qwen2_5_VLVisionConfig,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLForConditionalGeneration,
    )

    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.qwen2vl import (
        Qwen25VLConfig,
        qwen25vl_prepare_multimodal_prompt,
        qwen25vl_weights_from_state_dict,
    )

    vc = Qwen2_5_VLVisionConfig(
        depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
        out_hidden_size=48, patch_size=4, temporal_patch_size=2,
        spatial_merge_size=2, window_size=8, fullatt_block_indexes=[1],
    )
    tc = Qwen2_5_VLTextConfig(
        vocab_size=160, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
        rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
    )
    hf_cfg = HfCfg(
        vision_config=vc.to_dict(), text_config=tc.to_dict(),
        image_token_id=150, video_token_id=151, vision_start_token_id=152,
        pad_token_id=0,
    )
    torch.manual_seed(320)
    model = Qwen2_5_VLForConditionalGeneration(hf_cfg).eval()
    cfg = Qwen25VLConfig.from_hf(hf_cfg.to_dict())
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    weights = qwen25vl_weights_from_state_dict(sd, cfg)

    grid = (1, 6, 4)  # 3x2 merged grid: windows of 2x2 + padding drop
    rng = np.random.default_rng(4)
    patches = rng.standard_normal((24, 3 * 2 * 16)).astype(np.float32)
    n_tok = 6
    ids = [3, 17, 152] + [150] * n_tok + [9, 22]
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor([list(grid)]),
            max_new_tokens=6, do_sample=False,
        )[0, len(ids):].tolist()

    pids, embeds, extra, pos3 = qwen25vl_prepare_multimodal_prompt(
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
