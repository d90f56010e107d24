"""Phi-4-multimodal (image): HD crop assembly + tower parity vs HF, and
engine-served multimodal."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers.models.phi4_multimodal.configuration_phi4_multimodal import (
    Phi4MultimodalAudioConfig,
    Phi4MultimodalConfig,
    Phi4MultimodalVisionConfig,
)
from transformers.models.phi4_multimodal.modeling_phi4_multimodal import (
    Phi4MultimodalForCausalLM,
)

from mistralrs_tpu.models.phi4mm import (
    Phi4MMConfig,
    encode_images,
    num_image_tokens,
    phi4mm_weights_from_state_dict,
    prepare_multimodal_prompt,
)


def _tiny():
    vc = Phi4MultimodalVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8, crop_size=32,
        image_token_id=130, feature_layer=-2,
    )
    ac = Phi4MultimodalAudioConfig(
        input_size=8, hidden_size=32, num_attention_heads=4,
        intermediate_size=48, num_blocks=2, kernel_size=3,
        ext_pw_out_channel=32, depthwise_separable_out_channel=32,
        depthwise_multiplier=1, time_reduction=8, nemo_conv_channels=16,
        nemo_final_size=1, bias_max_distance=20, dropout_rate=0.0,
        audio_token_id=131,
    )
    hf_cfg = Phi4MultimodalConfig(
        vocab_size=256, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, pad_token_id=0,
        vision_config=vc.to_dict(), audio_config=ac.to_dict(),
    )
    torch.manual_seed(250)
    model = Phi4MultimodalForCausalLM(hf_cfg).eval()
    cfg = Phi4MMConfig.from_hf(hf_cfg.to_dict())
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    return hf_cfg, model, cfg, phi4mm_weights_from_state_dict(sd, cfg)


def test_phi4mm_through_engine():
    """Image (global crop + 1x2 sub grid) through the engine: HD assembly,
    avg-pool token compression, separator extensors — greedy parity vs HF."""
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams

    hf_cfg, model, cfg, weights = _tiny()
    rng = np.random.default_rng(0)
    image_size = (32, 64)  # 1x2 crop grid
    px = rng.standard_normal((1, 3, 3, 32, 32)).astype(np.float32)
    n_tok = num_image_tokens(cfg, image_size)
    ids = [3, 17] + [130] * n_tok + [9, 22]
    mask = np.ones((1, 3, 32 // 8, 32 // 8), np.float32)
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor([ids]),
            image_pixel_values=torch.tensor(px),
            image_sizes=torch.tensor([list(image_size)]),
            image_attention_mask=torch.tensor(mask),
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


def test_phi4mm_serving_adapter():
    """build_adapter('phi4mm'): HD grid selection, crop splitting, token
    counts, and engine kwargs."""
    from mistralrs_tpu.serving.vlm import build_adapter

    hf_cfg, model, cfg, weights = _tiny()
    ad = build_adapter("phi4mm", weights, cfg, compute_dtype=jnp.float32,
                       max_crops=4)
    rng = np.random.default_rng(1)
    im = rng.integers(0, 255, (24, 48, 3), np.uint8)  # 1x2 grid
    media = ad.process([im])
    assert media.pixels.shape == (3, 3, 32, 32)  # global + 2 crops
    n_tok = media.counts[0]
    assert n_tok == num_image_tokens(cfg, (32, 64))
    ids = [3] + [130] * n_tok + [9]
    kwargs = ad.prepare(ids, media)
    assert kwargs["prompt_embeds"].shape == (len(ids), 48)
    assert ad.expand(2) == "<|image|><|image|>"


def test_phi4mm_audio_through_engine():
    """Audio through the engine: log-mel → conformer → speech projection →
    merged embeds — greedy parity vs HF's audio_input_features path (the
    reference's conformer + phi4 audio embedding,
    `vision_models/conformer/` + `phi4/mod.rs:448-451`)."""
    from mistralrs_tpu.audio.phi4mm import phi4mm_audio_embed_sizes
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.phi4mm import prepare_audio_prompt

    hf_cfg, model, cfg, weights = _tiny()
    assert cfg.audio is not None and "audio" in weights
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((40, 8)).astype(np.float32)
    n = phi4mm_audio_embed_sizes(cfg.audio, 40)
    ids = [3, 17] + [131] * n + [9, 22]
    with torch.no_grad():
        # suppress the media placeholder ids: a random-weight model can
        # sample them, and HF's re-merge then crashes on later steps
        hf_out = model.generate(
            input_ids=torch.tensor([ids]),
            audio_input_features=torch.tensor(mel[None]),
            audio_embed_sizes=torch.tensor([n]),
            max_new_tokens=6, do_sample=False,
            suppress_tokens=[130, 131],
        )[0, len(ids):].tolist()

    pids, embeds, extra = prepare_audio_prompt(
        weights, cfg, ids, mel, compute_dtype=jnp.float32
    )
    assert extra
    eng = Engine(
        cfg.text, weights["text"], num_blocks=32, block_size=16, max_batch=2,
        backend="xla", compute_dtype=jnp.float32,
    )
    seq = eng.add_request(
        pids, SamplingParams(temperature=0.0, max_tokens=6,
                             logit_bias={130: -1e9, 131: -1e9}),
        prompt_embeds=embeds,
    )
    eng.run_to_completion()
    assert seq.output_ids == hf_out


def test_phi4mm_adapter_audio_waveform():
    """The serving adapter takes a raw waveform (input_audio part): mel →
    conformer → projected rows sized by the conv stack."""
    from mistralrs_tpu.audio.phi4mm import (
        phi4mm_audio_embed_sizes,
        phi4mm_logmel,
    )
    from mistralrs_tpu.serving.vlm import build_adapter

    hf_cfg, model, cfg, weights = _tiny()
    ad = build_adapter("phi4mm", weights, cfg, compute_dtype=jnp.float32)
    assert ad.audio_token == "<|audio|>"
    rng = np.random.default_rng(3)
    wave = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    media = ad.process([wave])
    assert media.extras["kind"] == "audio"
    n = media.counts[0]
    # the fixture's audio encoder expects 8 mel bins; the real extractor
    # makes 80 — resize for the tiny tower
    assert media.pixels.shape[1] == 80
    media.pixels = media.pixels[:, :8]
    assert n == phi4mm_audio_embed_sizes(cfg.audio, media.pixels.shape[0])
    assert ad.expand_media("audio", 3) == "<|audio|>" * 3
    ids = [3] + [131] * n + [9]
    kwargs = ad.prepare(ids, media)
    assert kwargs["prompt_embeds"].shape == (len(ids), 48)
