"""Qwen3-Omni thinker: /8-downsampling chunked audio tower parity vs HF
and audio understanding through the paged engine."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mistralrs_tpu.models.qwen3omni import (
    Qwen3OmniThinkerConfig,
    num_audio_tokens,
    prepare_multimodal_prompt,
    qwen3omni_weights_from_state_dict,
)


def _tiny():
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import (
        Qwen3OmniMoeAudioEncoderConfig,
        Qwen3OmniMoeTextConfig,
        Qwen3OmniMoeThinkerConfig as HfThinkerConfig,
        Qwen3OmniMoeVisionEncoderConfig,
    )
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeThinkerForConditionalGeneration,
    )

    ac = Qwen3OmniMoeAudioEncoderConfig(
        num_mel_bins=32, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=64, d_model=32, n_window=8, output_dim=48,
        downsample_hidden_size=16, n_window_infer=32,
        max_source_positions=64,
    )
    vc = Qwen3OmniMoeVisionEncoderConfig(
        depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
        patch_size=8, temporal_patch_size=2, spatial_merge_size=2,
        out_hidden_size=48, num_position_embeddings=16,
        deepstack_visual_indexes=[0],
    )
    tc = Qwen3OmniMoeTextConfig(
        vocab_size=160, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, max_position_embeddings=128, num_experts=4,
        num_experts_per_tok=2, moe_intermediate_size=32,
        rope_scaling={"rope_type": "default", "mrope_section": [2, 2, 2],
                      "mrope_interleaved": True},
    )
    hf_cfg = HfThinkerConfig(
        audio_config=ac.to_dict(), vision_config=vc.to_dict(),
        text_config=tc.to_dict(), audio_token_id=150, image_token_id=151,
        video_token_id=152, audio_start_token_id=153,
        vision_start_token_id=155, pad_token_id=0,
    )
    torch.manual_seed(370)
    model = Qwen3OmniMoeThinkerForConditionalGeneration(hf_cfg).eval()
    cfg = Qwen3OmniThinkerConfig.from_hf(hf_cfg.to_dict())
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    return hf_cfg, model, cfg, qwen3omni_weights_from_state_dict(sd, cfg)


def test_qwen3omni_audio_tower_parity():
    """Conv2d /8 stack + per-chunk positions + grouped window attention
    (T=27 → chunks 16+11, windows of 2 chunks)."""
    from mistralrs_tpu.audio.qwen25omni import qwen3omni_audio_encode

    hf_cfg, model, cfg, weights = _tiny()
    rng = np.random.default_rng(0)
    t_mel = 27
    mel = rng.standard_normal((32, t_mel)).astype(np.float32)
    with torch.no_grad():
        ref = model.audio_tower(
            torch.tensor(mel), feature_lens=torch.tensor([t_mel])
        ).last_hidden_state.numpy()
    got = np.asarray(
        qwen3omni_audio_encode(weights["audio"], cfg.audio, jnp.asarray(mel))
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=3e-3, atol=3e-3)


def test_qwen3omni_audio_through_engine():
    """Audio prompt through the paged engine (qwen3-moe text): greedy
    parity vs HF."""
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams

    hf_cfg, model, cfg, weights = _tiny()
    assert cfg.text.num_experts == 4
    rng = np.random.default_rng(1)
    t_mel = 32
    mel = rng.standard_normal((32, t_mel)).astype(np.float32)
    n_tok = num_audio_tokens(cfg, t_mel)
    ids = [3, 153] + [150] * n_tok + [9]
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor([ids]),
            input_features=torch.tensor(mel)[None],
            feature_attention_mask=torch.ones(1, t_mel, dtype=torch.long),
            max_new_tokens=6, do_sample=False,
        )[0, len(ids):].tolist()

    pids, embeds, extra = prepare_multimodal_prompt(
        weights, cfg, ids, mel, compute_dtype=jnp.float32
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
