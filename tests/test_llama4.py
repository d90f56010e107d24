"""Llama 4: text model parity vs HF (chunked attention, NoPE temperature
tuning, L2 qk-norm, input-scaled MoE with shared expert)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers.models.llama4.configuration_llama4 import Llama4TextConfig
from transformers.models.llama4.modeling_llama4 import Llama4ForCausalLM

from mistralrs_tpu.models.llama4 import (
    Llama4Cache,
    Llama4Config,
    llama4_forward,
    llama4_text_weights_from_state_dict,
)


def _tiny(interleave=2, chunk=8):
    tc = Llama4TextConfig(
        vocab_size=136, hidden_size=48, intermediate_size=96,
        intermediate_size_mlp=128, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_local_experts=4, num_experts_per_tok=1,
        interleave_moe_layer_step=interleave,
        max_position_embeddings=256, rope_theta=10000.0,
        attention_chunk_size=chunk, attn_temperature_tuning=True,
        floor_scale=8, attn_scale=0.1,
    )
    torch.manual_seed(180)
    model = Llama4ForCausalLM(tc).eval()
    d = {"text_config": tc.to_dict()}
    cfg = Llama4Config.from_hf(d)
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    return tc, model, cfg, llama4_text_weights_from_state_dict(sd, cfg)


def test_llama4_config_mapping():
    tc, _, cfg, weights = _tiny()
    assert cfg.no_rope_layers == (1, 1, 1, 0)
    assert cfg.moe_layers == (1, 3)
    assert "experts_gate_up" in weights["layers"][1]
    assert "gate" in weights["layers"][0]


def test_llama4_text_parity():
    """Prefill logits across chunk boundaries (T > attention_chunk_size)."""
    tc, model, cfg, weights = _tiny()
    ids = np.arange(1, 13, dtype=np.int64)[None] % 130  # T=12 > chunk=8
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids)).logits.numpy()
    cache = Llama4Cache.create(cfg, 1, ids.shape[1] + 4)
    pos = jnp.arange(ids.shape[1])[None].astype(jnp.int32)
    got, _ = llama4_forward(
        weights, cfg, jnp.asarray(ids, jnp.int32), pos, cache,
        jnp.zeros((1,), jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=6e-4, atol=6e-4)


def test_llama4_cached_decode_matches_generate():
    tc, model, cfg, weights = _tiny()
    ids = [3, 17, 9, 22, 61, 40, 7, 88, 5]  # crosses the chunk boundary
    N = 6
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor([ids]), max_new_tokens=N, do_sample=False,
        )[0, len(ids):].tolist()
    t = len(ids)
    cache = Llama4Cache.create(cfg, 1, t + N + 1)
    logits, cache = llama4_forward(
        weights, cfg, jnp.asarray([ids], jnp.int32),
        jnp.arange(t)[None].astype(jnp.int32), cache,
        jnp.zeros((1,), jnp.int32),
    )
    out = [int(jnp.argmax(logits[0, -1]))]
    for i in range(N - 1):
        pos = t + i
        logits, cache = llama4_forward(
            weights, cfg, jnp.asarray([[out[-1]]], jnp.int32),
            jnp.asarray([[pos]], jnp.int32), cache,
            jnp.full((1,), pos, jnp.int32),
        )
        out.append(int(jnp.argmax(logits[0, -1])))
    assert out == hf_out


def test_llama4_vision_parity():
    from transformers.models.llama4.configuration_llama4 import (
        Llama4VisionConfig as HFVC,
    )
    from transformers.models.llama4.modeling_llama4 import Llama4VisionModel

    from mistralrs_tpu.vision.llama4 import (
        Llama4VisionConfig,
        llama4_vision_forward,
        llama4_vision_params,
    )

    # pixel-shuffle constraint: hidden / ratio² == intermediate_size
    hf_cfg = HFVC(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=16, patch_size=4,
        vision_output_dim=32, projector_input_dim=48,
        projector_output_dim=48, pixel_shuffle_ratio=0.5,
    )
    torch.manual_seed(190)
    model = Llama4VisionModel(hf_cfg).eval()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    cfg = Llama4VisionConfig.from_hf(hf_cfg.to_dict())
    params = llama4_vision_params(sd, cfg)
    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.tensor(px)).last_hidden_state.numpy()
    got = np.asarray(llama4_vision_forward(params, cfg, jnp.asarray(px)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=4e-4, atol=4e-4)


def _tiny_vl():
    from transformers.models.llama4.configuration_llama4 import (
        Llama4Config as HFCfg,
        Llama4VisionConfig as HFVC,
    )
    from transformers.models.llama4.modeling_llama4 import (
        Llama4ForConditionalGeneration,
    )

    tc = Llama4TextConfig(
        vocab_size=136, hidden_size=48, intermediate_size=96,
        intermediate_size_mlp=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_local_experts=2, num_experts_per_tok=1,
        interleave_moe_layer_step=2, max_position_embeddings=256,
        rope_theta=10000.0, attention_chunk_size=8,
        attn_temperature_tuning=True, floor_scale=8, attn_scale=0.1,
    )
    vc = HFVC(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=16, patch_size=4,
        vision_output_dim=48, projector_input_dim=48,
        projector_output_dim=48, pixel_shuffle_ratio=0.5,
    )
    hf_cfg = HFCfg(
        vision_config=vc.to_dict(), text_config=tc.to_dict(),
        image_token_index=134,
    )
    torch.manual_seed(191)
    model = Llama4ForConditionalGeneration(hf_cfg).eval()
    from mistralrs_tpu.models.llama4 import (
        Llama4VLConfig,
        llama4_weights_from_state_dict,
    )

    cfg = Llama4VLConfig.from_hf(hf_cfg.to_dict())
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    return hf_cfg, model, cfg, llama4_weights_from_state_dict(sd, cfg)


def test_llama4_multimodal_through_engine():
    """Image + text-only requests through the engine via Llama4Adapter
    (prompt-embeds merge), greedy parity vs HF generate."""
    from mistralrs_tpu.engine.adapters import Llama4Adapter
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.llama4 import prepare_multimodal_prompt

    hf_cfg, model, cfg, weights = _tiny_vl()
    rng = np.random.default_rng(2)
    px = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    # vision: 16 patches → pixel shuffle ×0.25 → 4 image tokens
    ids = [3, 17] + [134] * 4 + [9, 22, 61]
    with torch.no_grad():
        hf_img = model.generate(
            input_ids=torch.tensor([ids]), pixel_values=torch.tensor(px),
            max_new_tokens=6, do_sample=False,
        )[0, len(ids):].tolist()
    ids_txt = [3, 17, 9, 22, 61, 40, 7, 88, 5]  # crosses chunk boundary
    with torch.no_grad():
        hf_txt = model.generate(
            input_ids=torch.tensor([ids_txt]), max_new_tokens=6,
            do_sample=False,
        )[0, len(ids_txt):].tolist()

    adapter = Llama4Adapter(cfg.llm, weights["text"], compute_dtype=jnp.float32)
    eng = Engine(
        cfg.llm, weights["text"], num_blocks=32, block_size=16, max_batch=2,
        backend="xla", compute_dtype=jnp.float32, adapter=adapter,
    )
    pids, embeds, extra = prepare_multimodal_prompt(
        weights, cfg, ids, px, compute_dtype=jnp.float32
    )
    seq_img = eng.add_request(
        pids, SamplingParams(temperature=0.0, max_tokens=6),
        prompt_embeds=embeds,
    )
    seq_txt = eng.add_request(
        ids_txt, SamplingParams(temperature=0.0, max_tokens=6)
    )
    eng.run_to_completion()
    assert seq_img.output_ids == hf_img
    assert seq_txt.output_ids == hf_txt


def test_load_pipeline_llama4(tmp_path):
    import json

    from safetensors.numpy import save_file

    from mistralrs_tpu.models.llama4 import Llama4Config
    from mistralrs_tpu.pipeline import load_pipeline, make_adapter

    hf_cfg, model, cfg, weights = _tiny_vl()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    d = tmp_path / "llama4-tiny"
    d.mkdir()
    save_file(sd, str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps(hf_cfg.to_dict()))
    pipe = load_pipeline(str(d), dtype=jnp.float32)
    assert isinstance(pipe.cfg, Llama4Config)
    assert pipe.vlm is not None and pipe.vlm.family == "llama4"
    adapter = make_adapter(pipe.cfg, pipe.weights)
    assert type(adapter).__name__ == "Llama4Adapter"
    media = pipe.vlm.process([np.zeros((20, 20, 3), np.uint8)])
    assert media.counts == [4]
