"""Mistral 3 / Pixtral: vision tower parity (variable-size packed crops,
2-D rope, block-diagonal attention), projector + patch merger, and
engine-served multimodal parity vs HF."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers.models.mistral3.configuration_mistral3 import Mistral3Config as HFCfg
from transformers.models.mistral3.modeling_mistral3 import (
    Mistral3ForConditionalGeneration,
)
from transformers.models.pixtral.configuration_pixtral import PixtralVisionConfig as HFVC

from mistralrs_tpu.models.mistral3 import (
    Mistral3Config,
    encode_images,
    mistral3_weights_from_state_dict,
    pixtral_vision_forward,
    prepare_multimodal_prompt,
)


def _tiny():
    vc = HFVC(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8, head_dim=8,
        rope_theta=10000.0,
    )
    txt = dict(
        model_type="mistral", vocab_size=136, hidden_size=48,
        intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=128,
    )
    hf_cfg = HFCfg(
        vision_config=vc.to_dict(), text_config=txt, image_token_index=130,
        spatial_merge_size=2, multimodal_projector_bias=False,
    )
    torch.manual_seed(210)
    model = Mistral3ForConditionalGeneration(hf_cfg).eval()
    cfg = Mistral3Config.from_hf(hf_cfg.to_dict())
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    return hf_cfg, model, cfg, mistral3_weights_from_state_dict(sd, cfg)


def test_pixtral_tower_parity_packed_images():
    hf_cfg, model, cfg, weights = _tiny()
    rng = np.random.default_rng(0)
    # two crops of different sizes packed into one sequence
    img1 = rng.standard_normal((3, 32, 24)).astype(np.float32)
    img2 = rng.standard_normal((3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        # HF packs via padded pixel batch + image_sizes
        px = np.zeros((2, 3, 32, 24), np.float32)
        px[0] = img1
        px[1, :, :16, :16] = img2
        ref = model.model.vision_tower(
            torch.tensor(px), image_sizes=torch.tensor([[32, 24], [16, 16]]),
        ).last_hidden_state.numpy()
    got = np.asarray(
        pixtral_vision_forward(
            weights["vision"], cfg.vision,
            [jnp.asarray(img1), jnp.asarray(img2)],
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=4e-4, atol=4e-4)


def test_mistral3_through_engine():
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams

    hf_cfg, model, cfg, weights = _tiny()
    rng = np.random.default_rng(1)
    img = rng.standard_normal((3, 32, 16)).astype(np.float32)
    # 32x16 / patch 8 → 4x2 patches → merge 2 → 2 image tokens
    # (HF's projector squeeze(0) breaks on exactly one merged token)
    ids = [3, 17, 130, 130, 9, 22]
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(img[None]),
            image_sizes=torch.tensor([[32, 16]]),
            max_new_tokens=6, do_sample=False,
        )[0, len(ids):].tolist()

    pids, embeds, extra = prepare_multimodal_prompt(
        weights, cfg, ids, [img], compute_dtype=jnp.float32
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
