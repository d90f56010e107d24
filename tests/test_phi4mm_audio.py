"""Phi-4-multimodal audio conformer vs HF `Phi4MultimodalAudioModel` —
numeric parity for the NeMo subsampling + conformer blocks + relative
attention bias, and the engine-served audio request path (the analog of the
reference's `vision_models/conformer/` + phi4 audio embedding,
`vision_models/phi4/mod.rs:448`)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mistralrs_tpu.audio.phi4mm import (
    Phi4MMAudioConfig,
    audio_project,
    conformer_encode,
    phi4mm_audio_embed_sizes,
    phi4mm_audio_params,
)


def _tiny_hf_audio(chunk_size=-1):
    hf_cfg = transformers.Phi4MultimodalAudioConfig(
        input_size=8, hidden_size=32, num_attention_heads=4,
        intermediate_size=48, num_blocks=2, kernel_size=3,
        ext_pw_out_channel=32, depthwise_separable_out_channel=32,
        depthwise_multiplier=1, time_reduction=8, nemo_conv_channels=16,
        nemo_final_size=1, bias_max_distance=20, bias_symmetric=False,
        chunk_size=chunk_size, left_chunk=2, dropout_rate=0.0,
    )
    torch.manual_seed(11)
    model = transformers.Phi4MultimodalAudioModel(hf_cfg).eval()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    cfg = Phi4MMAudioConfig.from_hf(hf_cfg.to_dict())
    return model, cfg, phi4mm_audio_params(sd, cfg)


def test_conformer_parity_full_attention():
    model, cfg, params = _tiny_hf_audio()
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 64, 8)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(feats), None).numpy()
    got = np.asarray(conformer_encode(params, cfg, feats))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_conformer_parity_streaming_chunks():
    """chunk_size > 0: the adaptive streaming mask limits attention to the
    current + left_chunk previous chunks."""
    model, cfg, params = _tiny_hf_audio(chunk_size=2)
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((1, 96, 8)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(feats), None).numpy()
    got = np.asarray(conformer_encode(params, cfg, feats))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_conformer_parity_unfolded_long_input():
    """Inputs beyond the 500-frame absolute-position window unfold into
    windows and re-assemble (HF unfold_tensor path)."""
    model, cfg, params = _tiny_hf_audio()
    rng = np.random.default_rng(2)
    # 4360 mel frames → 545 subsampled > 500 → unfold with padding
    feats = rng.standard_normal((1, 4360, 8)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(feats), None).numpy()
    got = np.asarray(conformer_encode(params, cfg, feats))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_embed_sizes_match_conv_stack():
    _, cfg, params = _tiny_hf_audio()
    rng = np.random.default_rng(3)
    for t in (17, 64, 100, 333):
        feats = rng.standard_normal((1, t, 8)).astype(np.float32)
        got = np.asarray(conformer_encode(params, cfg, feats))
        assert got.shape[1] == phi4mm_audio_embed_sizes(cfg, t)


def test_projection_and_engine_serving():
    """Projected audio rows merge at placeholder positions and serve
    through the engine prompt-embeds path (the phi4 audio embedding,
    `vision_models/phi4/mod.rs:448-451`)."""
    from mistralrs_tpu.audio.phi4mm import phi4mm_audio_projection_params
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models import ModelConfig, init_random_weights

    _, cfg, params = _tiny_hf_audio()
    tcfg = ModelConfig(
        arch="llama", vocab_size=128, hidden_size=48, intermediate_size=96,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=12,
        max_position_embeddings=256,
    )
    weights = init_random_weights(tcfg, seed=9, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    # fabricate the projection pair (speech + vision_speech modes)
    sd = {}
    for mode in ("speech", "vision_speech"):
        sd[f"model.audio_embed.up_proj_for_{mode}.weight"] = (
            rng.standard_normal((48, 32)).astype(np.float32) * 0.1)
        sd[f"model.audio_embed.up_proj_for_{mode}.bias"] = np.zeros(
            48, np.float32)
        sd[f"model.audio_embed.down_proj_for_{mode}.weight"] = (
            rng.standard_normal((48, 48)).astype(np.float32) * 0.1)
        sd[f"model.audio_embed.down_proj_for_{mode}.bias"] = np.zeros(
            48, np.float32)
    proj = phi4mm_audio_projection_params(sd)

    feats = rng.standard_normal((1, 40, 8)).astype(np.float32)
    states = conformer_encode(params, cfg, feats)
    rows = np.asarray(audio_project(proj, states))[0]  # [n, 48]
    n = rows.shape[0]
    assert n == phi4mm_audio_embed_sizes(cfg, 40)

    audio_tok = 100
    ids = [3, 17] + [audio_tok] * n + [9, 22]
    from mistralrs_tpu.quant.linear import embedding_lookup

    embeds = np.asarray(embedding_lookup(
        jnp.asarray([ids], jnp.int32), weights["embed"], dtype=jnp.float32
    ))[0].copy()
    embeds[2 : 2 + n] = rows

    def run(e):
        eng = Engine(tcfg, dict(weights), num_blocks=32, block_size=16,
                     max_batch=2, backend="xla", compute_dtype=jnp.float32)
        s = eng.add_request(ids, SamplingParams(temperature=0.0, max_tokens=5),
                            prompt_embeds=e)
        eng.run_to_completion()
        return s.output_ids

    first = run(embeds)
    assert run(embeds) == first and len(first) == 5
    # silence-swapped audio changes the decode
    other = embeds.copy()
    other[2 : 2 + n] = 0.0
    assert run(other) != first


def test_logmel_matches_hf_feature_extractor():
    from mistralrs_tpu.audio.phi4mm import phi4mm_logmel

    fe = transformers.Phi4MultimodalFeatureExtractor()
    rng = np.random.default_rng(6)
    wave = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    ref = fe(wave, sampling_rate=16000,
             return_tensors="np")["audio_input_features"][0]
    got = phi4mm_logmel(wave)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
