"""Gemma 3n audio encoder (USM conformer): parity vs HF's standalone
audio tower + multimodal embedder, and audio tokens served through the
Gemma3nAdapter prompt-embeds path."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mistralrs_tpu.audio.gemma3n import (
    Gemma3nAudioConfig,
    embed_audio_soft,
    gemma3n_audio_encode,
    gemma3n_audio_weights_from_state_dict,
)


def _tiny_audio():
    from transformers.models.gemma3n.configuration_gemma3n import (
        Gemma3nAudioConfig as HfAudioConfig,
    )
    from transformers.models.gemma3n.modeling_gemma3n import Gemma3nAudioEncoder

    hf_ac = HfAudioConfig(
        input_feat_size=32, hidden_size=64, conf_num_hidden_layers=2,
        conf_num_attention_heads=4, conf_attention_chunk_size=4,
        conf_attention_context_left=5, conf_attention_context_right=0,
        conf_conv_kernel_size=3, conf_reduction_factor=2,
        sscp_conv_channel_size=(16, 8), vocab_size=32, vocab_offset=150,
    )
    torch.manual_seed(300)
    enc = Gemma3nAudioEncoder(hf_ac).eval()
    cfg = Gemma3nAudioConfig.from_hf(hf_ac.to_dict())
    return hf_ac, enc, cfg


def test_gemma3n_audio_encoder_parity():
    hf_ac, enc, cfg = _tiny_audio()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in enc.state_dict().items()}
    # loader also wants the embedder keys; synthesize an embedder
    from transformers.models.gemma3n.configuration_gemma3n import (
        Gemma3nTextConfig,
    )
    from transformers.models.gemma3n.modeling_gemma3n import (
        Gemma3nMultimodalEmbedder,
    )

    tc = Gemma3nTextConfig(
        vocab_size=160, hidden_size=48, hidden_size_per_layer_input=16,
        intermediate_size=[96], num_hidden_layers=1, num_attention_heads=4,
        num_key_value_heads=2, head_dim=12,
        layer_types=["full_attention"], activation_sparsity_pattern=[0.0],
        num_kv_shared_layers=0,
    )
    torch.manual_seed(301)
    embedder = Gemma3nMultimodalEmbedder(hf_ac, tc).eval()
    sd.update({f"emb.{k}": v.detach().numpy().astype(np.float32)
               for k, v in embedder.state_dict().items()})
    weights = gemma3n_audio_weights_from_state_dict(
        sd, cfg, tower_prefix="", embedder_prefix="emb."
    )

    rng = np.random.default_rng(0)
    t_frames = 35
    mel = rng.standard_normal((1, t_frames, 32)).astype(np.float32) * 0.5
    mask = torch.zeros(1, t_frames, dtype=torch.bool)  # all valid
    with torch.no_grad():
        ref, ref_mask = enc(torch.tensor(mel), mask)
        ref_emb = embedder(inputs_embeds=ref).numpy()
    got = np.asarray(gemma3n_audio_encode(weights, cfg, jnp.asarray(mel)))
    assert got.shape == tuple(ref.shape)
    np.testing.assert_allclose(got, ref.numpy(), rtol=3e-3, atol=3e-3)
    got_emb = np.asarray(embed_audio_soft(weights, 48, jnp.asarray(got)))
    np.testing.assert_allclose(got_emb, ref_emb, rtol=3e-3, atol=3e-3)


def test_gemma3n_audio_through_engine():
    """Soft audio tokens merged into a gemma3n prompt and served through
    the engine prompt-embeds path (self-consistency: embeds vs ids-only
    differ, text-only embeds path matches ids path)."""
    import sys

    sys.path.insert(0, "tests")
    from test_gemma3n import _tiny

    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.pipeline import make_adapter

    hf_cfg, model, cfg, weights = _tiny(num_kv_shared_layers=0, vocab_pl=160)
    rng = np.random.default_rng(5)
    ids = rng.integers(1, 120, size=8).tolist()

    def run(embeds=None, n=5):
        adapter = make_adapter(cfg, weights, compute_dtype=jnp.float32)
        eng = Engine(cfg, weights, adapter=adapter, num_blocks=32,
                     block_size=16, max_batch=2, backend="xla",
                     compute_dtype=jnp.float32)
        seq = eng.add_request(
            ids, SamplingParams(temperature=0.0, max_tokens=n),
            prompt_embeds=embeds,
        )
        eng.run_to_completion()
        return seq.output_ids

    base = run()
    # text-only prompt embeds (scaled rows) must reproduce the ids path
    scaled = np.asarray(weights["embed"])[ids] * np.sqrt(cfg.hidden_size)
    assert run(embeds=jnp.asarray(scaled, jnp.float32)) == base
    # perturbing one row (as merged audio features would) changes decode
    audio_like = scaled.copy()
    audio_like[3] = rng.standard_normal(scaled.shape[1]) * 0.5
    assert run(embeds=jnp.asarray(audio_like, jnp.float32)) != base
