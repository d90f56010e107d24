"""Dia TTS: encoder/decoder logit parity vs HF + cached incremental decode +
delay-pattern round trip (the speech-model analog of the arch parity suite)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mistralrs_tpu.models.dia import (
    DiaConfig,
    apply_delay_pattern,
    dia_cross_kv,
    dia_decode,
    dia_encode,
    dia_weights_from_state_dict,
    revert_delay_pattern,
)


def _tiny():
    hf_cfg = transformers.DiaConfig(
        encoder_config=transformers.DiaEncoderConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, intermediate_size=64, head_dim=8,
            vocab_size=64, max_position_embeddings=64),
        decoder_config=transformers.DiaDecoderConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, intermediate_size=64, head_dim=8,
            vocab_size=40, num_channels=3, cross_hidden_size=32,
            cross_num_attention_heads=4, cross_num_key_value_heads=2,
            cross_head_dim=8, max_position_embeddings=32),
        delay_pattern=[0, 1, 2],
    )
    torch.manual_seed(90)
    model = transformers.DiaForConditionalGeneration(hf_cfg).eval()
    cfg = DiaConfig.from_hf(hf_cfg.to_dict())
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    return hf_cfg, model, cfg, dia_weights_from_state_dict(sd, cfg)


def test_dia_logit_parity():
    _, model, cfg, w = _tiny()
    text = np.array([[3, 17, 40, 9, 22]], np.int64)
    codes = np.array([[[1, 2, 3], [4, 5, 6], [7, 8, 9], [10, 11, 12]]], np.int64)
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(text),
            decoder_input_ids=torch.tensor(codes),
        ).logits.numpy()  # [B*C, T, V]
    enc = dia_encode(w, cfg, jnp.asarray(text, jnp.int32))
    ckv = dia_cross_kv(w, cfg, enc)
    pos = jnp.arange(codes.shape[1])[None].astype(jnp.int32)
    got, _ = dia_decode(w, cfg, jnp.asarray(codes, jnp.int32), ckv, pos)
    got = np.asarray(got)  # [B, T, C, V]
    got_hf_layout = got.transpose(0, 2, 1, 3).reshape(-1, codes.shape[1], cfg.dec_vocab)
    np.testing.assert_allclose(got_hf_layout, ref, rtol=3e-4, atol=3e-4)


def test_dia_cached_decode_consistency():
    """Step-by-step decode with KV caches reproduces the full forward."""
    _, _, cfg, w = _tiny()
    text = np.array([[3, 17, 40, 9]], np.int32)
    codes = np.array([[[1, 2, 3], [4, 5, 6], [7, 8, 9]]], np.int32)
    enc = dia_encode(w, cfg, jnp.asarray(text))
    ckv = dia_cross_kv(w, cfg, enc)
    t = codes.shape[1]
    pos = jnp.arange(t)[None].astype(jnp.int32)
    full, _ = dia_decode(w, cfg, jnp.asarray(codes), ckv, pos)

    caches = [
        (jnp.zeros((1, t + 2, cfg.dec_kv_heads, cfg.dec_head_dim), jnp.float32),
         jnp.zeros((1, t + 2, cfg.dec_kv_heads, cfg.dec_head_dim), jnp.float32))
        for _ in range(cfg.dec_layers)
    ]
    outs = []
    for j in range(t):
        step, caches = dia_decode(
            w, cfg, jnp.asarray(codes[:, j : j + 1]), ckv,
            jnp.asarray([[j]], jnp.int32), self_kv=caches,
            kv_start=jnp.asarray([j], jnp.int32),
        )
        outs.append(np.asarray(step)[:, 0])
    np.testing.assert_allclose(
        np.stack(outs, axis=1), np.asarray(full), rtol=2e-4, atol=2e-4
    )


def test_delay_pattern_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 40, size=(6, 3))
    delays = [0, 1, 2]
    delayed = apply_delay_pattern(codes, delays, pad=39)
    assert delayed.shape == (8, 3)
    # channel 2's first frame appears 2 steps late
    assert delayed[0, 2] == 39 and delayed[2, 2] == codes[0, 2]
    back = revert_delay_pattern(delayed, delays)
    np.testing.assert_array_equal(back, codes)


def test_dac_vocoder_parity():
    """DAC decoder matches HF DacModel.decode bit-close."""
    from mistralrs_tpu.audio import (
        DacDecoderConfig,
        dac_decode_codes,
        dac_params_from_state_dict,
    )

    hf_cfg = transformers.DacConfig(
        encoder_hidden_size=16, decoder_hidden_size=32, hidden_size=24,
        n_codebooks=2, codebook_size=32, codebook_dim=4,
        upsampling_ratios=[4, 2], downsampling_ratios=[2, 4],
        sampling_rate=16000,
    )
    torch.manual_seed(91)
    model = transformers.DacModel(hf_cfg).eval()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    cfg = DacDecoderConfig.from_hf(hf_cfg.to_dict())
    params = dac_params_from_state_dict(sd, cfg)
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 32, size=(1, 2, 12))
    with torch.no_grad():
        ref = model.decode(audio_codes=torch.tensor(codes)).audio_values.numpy()
    got = np.asarray(dac_decode_codes(params, cfg, jnp.asarray(codes, jnp.int32)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_wav_roundtrip(tmp_path):
    from mistralrs_tpu.audio import write_wav

    samples = np.sin(np.linspace(0, 40, 1600)).astype(np.float32) * 0.5
    p = tmp_path / "t.wav"
    write_wav(p, samples, sample_rate=16000)
    import wave

    with wave.open(str(p)) as w:
        assert w.getframerate() == 16000
        assert w.getnchannels() == 1
        frames = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    np.testing.assert_allclose(frames / 32767.0, samples, atol=1e-4)
