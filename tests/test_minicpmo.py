"""MiniCPM-O (reference-spec): resampler parity vs torch's own
nn.MultiheadAttention, and engine serving on a synthetic checkpoint."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mistralrs_tpu.models.minicpmo import (
    MiniCpmOConfig,
    encode_images,
    minicpmo_weights_from_state_dict,
    prepare_multimodal_prompt,
    resample,
    sincos_2d_pos_embed,
)


def _tiny():
    rng = np.random.default_rng(50)
    hf_cfg = {
        "text_config": {
            "vocab_size": 160, "hidden_size": 48, "intermediate_size": 96,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "num_key_value_heads": 2, "max_position_embeddings": 128,
        },
        "vision_config": {
            "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "image_size": 16, "patch_size": 4,
        },
        "query_num": 6, "resampler_num_heads": 4, "image_token_id": 150,
    }
    cfg = MiniCpmOConfig.from_hf(hf_cfg)

    # synthetic HF-layout state dict: llm.* (qwen2) + vpm.* (siglip) +
    # resampler.*
    import transformers as tf

    torch.manual_seed(340)
    llm = tf.Qwen2ForCausalLM(tf.Qwen2Config(**hf_cfg["text_config"]))
    vpm = tf.SiglipVisionModel(
        tf.SiglipVisionConfig(**hf_cfg["vision_config"])
    ).vision_model
    sd = {f"llm.{k}": v.detach().numpy().astype(np.float32)
          for k, v in llm.state_dict().items()}
    sd |= {f"vpm.{k}": v.detach().numpy().astype(np.float32)
           for k, v in vpm.state_dict().items()}

    def r(*shape):
        return (rng.standard_normal(shape) * 0.1).astype(np.float32)

    d = 48
    sd |= {
        "resampler.query": r(6, d),
        "resampler.ln_q.weight": np.ones(d, np.float32),
        "resampler.ln_q.bias": np.zeros(d, np.float32),
        "resampler.ln_kv.weight": np.ones(d, np.float32),
        "resampler.ln_kv.bias": np.zeros(d, np.float32),
        "resampler.ln_post.weight": np.ones(d, np.float32),
        "resampler.ln_post.bias": np.zeros(d, np.float32),
        "resampler.kv_proj.weight": r(d, 32),
        "resampler.attn.in_proj_weight": r(3 * d, d),
        "resampler.attn.in_proj_bias": r(3 * d),
        "resampler.attn.out_proj.weight": r(d, d),
        "resampler.attn.out_proj.bias": r(d),
        "resampler.proj": r(d, d),
    }
    return hf_cfg, cfg, minicpmo_weights_from_state_dict(sd, cfg), sd


def test_resampler_matches_torch_mha():
    """Cross-attention core vs torch.nn.MultiheadAttention with the same
    fused in_proj weights (q = ln_q(query), k = ln_kv(kv_proj(x)) + pos,
    v without pos — resampler.rs forward)."""
    hf_cfg, cfg, weights, sd = _tiny()
    rng = np.random.default_rng(0)
    s, d = 16, 48
    feats = rng.standard_normal((1, s, 32)).astype(np.float32)

    got = np.asarray(resample(weights, cfg, jnp.asarray(feats), (4, 4)))[0]

    mha = torch.nn.MultiheadAttention(d, 4, batch_first=True)
    with torch.no_grad():
        mha.in_proj_weight.copy_(torch.tensor(sd["resampler.attn.in_proj_weight"]))
        mha.in_proj_bias.copy_(torch.tensor(sd["resampler.attn.in_proj_bias"]))
        mha.out_proj.weight.copy_(torch.tensor(sd["resampler.attn.out_proj.weight"]))
        mha.out_proj.bias.copy_(torch.tensor(sd["resampler.attn.out_proj.bias"]))
        x = torch.tensor(feats) @ torch.tensor(sd["resampler.kv_proj.weight"]).T
        x = torch.nn.functional.layer_norm(x, (d,), eps=1e-6)
        pos = torch.tensor(sincos_2d_pos_embed(d, 4, 4))[None]
        q = torch.nn.functional.layer_norm(
            torch.tensor(sd["resampler.query"]), (d,), eps=1e-6
        )[None]
        out, _ = mha(q, x + pos, x, need_weights=False)
        out = torch.nn.functional.layer_norm(out, (d,), eps=1e-6)
        ref = (out @ torch.tensor(sd["resampler.proj"])).numpy()[0]
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_minicpmo_through_engine():
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams

    hf_cfg, cfg, weights, _ = _tiny()
    rng = np.random.default_rng(1)
    px = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    ids = [3, 17] + [150] * cfg.query_num + [9, 22]
    pids, embeds, extra = prepare_multimodal_prompt(
        weights, cfg, ids, px, compute_dtype=jnp.float32
    )
    assert extra and embeds.shape == (len(ids), 48)

    def run():
        eng = Engine(
            cfg.text, weights["text"], num_blocks=32, block_size=16,
            max_batch=2, backend="xla", compute_dtype=jnp.float32,
        )
        seq = eng.add_request(
            pids, SamplingParams(temperature=0.0, max_tokens=5),
            prompt_embeds=embeds,
        )
        eng.run_to_completion()
        return seq.output_ids

    first = run()
    assert run() == first and len(first) == 5
