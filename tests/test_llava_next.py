"""LLaVA-NeXT (anyres tiles, unpad + newline packing): parity vs HF and
engine-served multimodal."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mistralrs_tpu.models.llava_next import (
    LlavaNextConfig,
    encode_anyres,
    llava_next_weights_from_state_dict,
    num_image_tokens,
    prepare_multimodal_prompt,
)


def _tiny():
    vision_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=16, patch_size=8,
    )
    text_cfg = transformers.LlamaConfig(
        vocab_size=160, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    )
    hf_cfg = transformers.LlavaNextConfig(
        vision_config=vision_cfg, text_config=text_cfg,
        image_token_index=150, vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        image_grid_pinpoints=[[16, 32], [32, 16], [32, 32]],
    )
    torch.manual_seed(220)
    model = transformers.LlavaNextForConditionalGeneration(hf_cfg).eval()
    cfg = LlavaNextConfig.from_hf(hf_cfg.to_dict())
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    return hf_cfg, model, cfg, llava_next_weights_from_state_dict(
        sd, cfg, dtype=jnp.float32
    )


def test_llava_next_through_engine():
    """Anyres image (base + 4 tiles: 20x36 original → [32,32] pinpoint, 2x2
    grid) through the engine, greedy parity vs HF generate."""
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams

    hf_cfg, model, cfg, weights = _tiny()
    rng = np.random.default_rng(0)
    image_size = (20, 36)  # H, W → best pinpoint [32, 32] → 2x2 tile grid
    n_tok = num_image_tokens(cfg, image_size)
    px = rng.standard_normal((1, 5, 3, 16, 16)).astype(np.float32)
    ids = [3, 17] + [150] * n_tok + [9, 22]
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(px),
            image_sizes=torch.tensor([list(image_size)]),
            max_new_tokens=6, do_sample=False,
        )[0, len(ids):].tolist()

    pids, embeds, extra = prepare_multimodal_prompt(
        weights, cfg, ids, px[0], image_size, compute_dtype=jnp.float32
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
