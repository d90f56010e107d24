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
