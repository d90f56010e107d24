"""Qwen2.5-Omni thinker: chunked audio tower parity vs HF, and audio
understanding through the paged engine."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mistralrs_tpu.models.qwen25omni import (
    Qwen25OmniThinkerConfig,
    num_audio_tokens,
    prepare_multimodal_prompt,
    qwen25omni_weights_from_state_dict,
)


def _tiny():
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import (
        Qwen2_5OmniAudioEncoderConfig,
        Qwen2_5OmniTextConfig,
        Qwen2_5OmniThinkerConfig as HfThinkerConfig,
        Qwen2_5OmniVisionEncoderConfig,
    )
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import (
        Qwen2_5OmniThinkerForConditionalGeneration,
    )

    ac = Qwen2_5OmniAudioEncoderConfig(
        num_mel_bins=32, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=64, d_model=32, n_window=8, output_dim=48,
        max_source_positions=64,
    )
    vc = Qwen2_5OmniVisionEncoderConfig(
        depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
        out_hidden_size=48, patch_size=4, temporal_patch_size=2,
        spatial_merge_size=2, window_size=8, fullatt_block_indexes=[1],
    )
    tc = Qwen2_5OmniTextConfig(
        vocab_size=160, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
        rope_scaling={"rope_type": "default", "mrope_section": [2, 2, 2]},
    )
    hf_cfg = HfThinkerConfig(
        audio_config=ac.to_dict(), vision_config=vc.to_dict(),
        text_config=tc.to_dict(), audio_token_id=150, image_token_id=151,
        video_token_id=152, pad_token_id=0, audio_start_token_id=153,
        audio_end_token_id=154, vision_start_token_id=155,
    )
    torch.manual_seed(330)
    model = Qwen2_5OmniThinkerForConditionalGeneration(hf_cfg).eval()
    cfg = Qwen25OmniThinkerConfig.from_hf(hf_cfg.to_dict())
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    return hf_cfg, model, cfg, qwen25omni_weights_from_state_dict(sd, cfg)


def test_audio_tower_parity():
    """Chunked conv + per-chunk positions + block-diag attention + avgpool
    vs HF, including a short tail chunk (T=27 with n_window=8 → chunks
    16+11)."""
    from mistralrs_tpu.audio.qwen25omni import qwen25omni_audio_encode

    hf_cfg, model, cfg, weights = _tiny()
    rng = np.random.default_rng(0)
    t_mel = 27
    mel = rng.standard_normal((32, t_mel)).astype(np.float32)
    with torch.no_grad():
        ref = model.audio_tower(
            torch.tensor(mel),
            feature_lens=torch.tensor([t_mel]),
            aftercnn_lens=torch.tensor([(t_mel - 1) // 2 + 1]),
        ).last_hidden_state.numpy()
    got = np.asarray(
        qwen25omni_audio_encode(weights["audio"], cfg.audio, jnp.asarray(mel))
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=3e-3, atol=3e-3)


def test_qwen25omni_audio_through_engine():
    """Audio prompt through the paged engine: greedy parity vs HF."""
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams

    hf_cfg, model, cfg, weights = _tiny()
    rng = np.random.default_rng(1)
    t_mel = 32
    mel = rng.standard_normal((32, t_mel)).astype(np.float32)
    n_tok = num_audio_tokens(cfg, t_mel)
    ids = [3, 153] + [150] * n_tok + [154, 9]
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor([ids]),
            input_features=torch.tensor(mel)[None],  # [1, F, T]
            feature_attention_mask=torch.ones(1, t_mel, dtype=torch.long),
            max_new_tokens=6, do_sample=False,
        )[0, len(ids):].tolist()

    pids, embeds, extra, pos3 = prepare_multimodal_prompt(
        weights, cfg, ids, mel=mel, compute_dtype=jnp.float32
    )
    assert extra and pos3 is None
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


def test_qwen25omni_serving_adapter():
    """build_adapter('qwen2_5_omni'): waveform → mel path and image path."""
    from mistralrs_tpu.serving.vlm import build_adapter

    hf_cfg, model, cfg, weights = _tiny()
    ad = build_adapter("qwen2_5_omni", weights, cfg, compute_dtype=jnp.float32)
    wav = np.sin(np.arange(16000) / 20).astype(np.float32)
    media = ad.process([wav])
    assert media.extras["kind"] == "audio"
    n = media.counts[0]
    ids = [3, 153] + [150] * n + [154]
    kwargs = ad.prepare(ids, media)
    assert set(kwargs) == {"prompt_embeds"}
    rng = np.random.default_rng(3)
    im = rng.integers(0, 255, (16, 16, 3), np.uint8)
    media = ad.process([im])
    assert media.extras["kind"] == "image"
    ids = [3, 155] + [151] * media.counts[0] + [9]
    kwargs = ad.prepare(ids, media)
    assert set(kwargs) == {"prompt_embeds", "mrope_positions"}


def test_qwen25omni_image_through_engine():
    """Image prompt through the engine (qwen2.5-vl tower reuse + M-RoPE)."""
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams

    hf_cfg, model, cfg, weights = _tiny()
    grid = (1, 4, 4)
    rng = np.random.default_rng(2)
    patches = rng.standard_normal((16, 3 * 2 * 16)).astype(np.float32)
    n_tok = 4
    ids = [3, 155] + [151] * n_tok + [9, 22]
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor([list(grid)]),
            max_new_tokens=6, do_sample=False,
        )[0, len(ids):].tolist()

    pids, embeds, extra, pos3 = prepare_multimodal_prompt(
        weights, cfg, ids, patches=patches, grid_thw=grid,
        compute_dtype=jnp.float32,
    )
    assert pos3 is not None
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
