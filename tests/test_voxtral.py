"""Voxtral audio understanding: log-mel frontend vs WhisperFeatureExtractor,
encoder parity vs HF, and audio requests through the engine."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers.models.voxtral.configuration_voxtral import (
    VoxtralConfig as HFCfg,
    VoxtralEncoderConfig as HFEnc,
)
from transformers.models.voxtral.modeling_voxtral import (
    VoxtralForConditionalGeneration,
)

from mistralrs_tpu.audio.voxtral import (
    VoxtralConfig,
    get_audio_features,
    prepare_multimodal_prompt,
    voxtral_encoder_forward,
    voxtral_weights_from_state_dict,
)


def test_log_mel_matches_whisper_extractor():
    from transformers import WhisperFeatureExtractor

    from mistralrs_tpu.audio.mel import log_mel_spectrogram

    fe = WhisperFeatureExtractor(feature_size=128)
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    ref = fe(wav, sampling_rate=16000, return_tensors="np")["input_features"][0]
    got = log_mel_spectrogram(wav, num_mel_bins=128, pad_to_samples=16000 * 30)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def _tiny():
    ac = HFEnc(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_mel_bins=16, max_source_positions=8,
    )
    txt = dict(
        model_type="llama", vocab_size=136, hidden_size=48,
        intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=128,
    )
    hf_cfg = HFCfg(
        audio_config=ac.to_dict(), text_config=txt, audio_token_id=130,
    )
    torch.manual_seed(200)
    model = VoxtralForConditionalGeneration(hf_cfg).eval()
    cfg = VoxtralConfig.from_hf(hf_cfg.to_dict())
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    return hf_cfg, model, cfg, voxtral_weights_from_state_dict(sd, cfg)


def test_voxtral_encoder_parity():
    hf_cfg, model, cfg, weights = _tiny()
    rng = np.random.default_rng(1)
    # encoder expects mel length = max_source_positions * 2 (conv2 stride 2)
    mel = rng.standard_normal((1, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = model.audio_tower(torch.tensor(mel)).last_hidden_state.numpy()
    got = np.asarray(
        voxtral_encoder_forward(weights["audio"], cfg.audio, jnp.asarray(mel))
    )
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)

    with torch.no_grad():
        ref_f = model.get_audio_features(torch.tensor(mel)).numpy()
    got_f = np.asarray(get_audio_features(weights, cfg, jnp.asarray(mel)))
    np.testing.assert_allclose(got_f, ref_f, rtol=3e-4, atol=3e-4)


def test_voxtral_through_engine():
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams

    hf_cfg, model, cfg, weights = _tiny()
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((1, 16, 16)).astype(np.float32)
    # 8 encoder frames, concat groups of 2 (64/32) → 4 audio tokens
    n_audio = 8 * cfg.audio.hidden_size // cfg.audio.intermediate_size
    ids = [3, 17] + [130] * n_audio + [9, 22]
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor([ids]), input_features=torch.tensor(mel),
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


def test_voxtral_serving_adapter(tmp_path):
    """load_pipeline detects a voxtral checkpoint; the serving adapter turns
    a waveform into placeholder counts + engine kwargs."""
    import json

    from safetensors.numpy import save_file

    from mistralrs_tpu.pipeline import load_pipeline

    hf_cfg, model, cfg, weights = _tiny()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    d = tmp_path / "voxtral-tiny"
    d.mkdir()
    save_file(sd, str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps(
        hf_cfg.to_dict() | {"model_type": "voxtral"}
    ))
    pipe = load_pipeline(str(d), dtype=jnp.float32)
    assert pipe.vlm is not None and pipe.vlm.family == "voxtral"

    rng = np.random.default_rng(3)
    # one chunk = max_source_positions * 2 * 160 samples = 8*2*160 = 2560
    wav = (rng.standard_normal(3000) * 0.1).astype(np.float32)
    media = pipe.vlm.process([wav])
    # 3000 samples → 2 chunks of 2560 → 2 * (8*32/64) = 8 audio tokens
    assert media.counts == [8]
    ids = [3, 17] + [130] * 8 + [9]
    mm = pipe.vlm.prepare(ids, media)
    assert mm["prompt_embeds"].shape == (len(ids), 48)
