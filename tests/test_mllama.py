"""Mllama (Llama 3.2 Vision): tiled vision tower, cross-attention text
model, and full multimodal parity vs HF."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers.models.mllama.configuration_mllama import (
    MllamaTextConfig as HFTextCfg,
    MllamaVisionConfig as HFVisCfg,
)


def _tiny_vis_cfg():
    return HFVisCfg(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_global_layers=2, attention_heads=4, image_size=16, patch_size=8,
        max_num_tiles=2, intermediate_layers_indices=[1, 2],
        vision_output_dim=96,
        supported_aspect_ratios=[[1, 1], [1, 2], [2, 1]],
    )


def test_mllama_vision_parity():
    from transformers.models.mllama.modeling_mllama import MllamaVisionModel

    from mistralrs_tpu.vision.mllama import (
        MllamaVisionConfig,
        mllama_vision_forward,
        mllama_vision_params,
    )

    hf_cfg = _tiny_vis_cfg()
    torch.manual_seed(170)
    model = MllamaVisionModel(hf_cfg).eval()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    cfg = MllamaVisionConfig.from_hf(hf_cfg.to_dict())
    params = mllama_vision_params(sd, cfg)

    rng = np.random.default_rng(0)
    # one image split into 2 tiles (aspect [1,2] → id 2), second tile padded
    # in a second case (aspect [1,1] → id 1, mask [1, 0])
    px = rng.standard_normal((2, 1, 2, 3, 16, 16)).astype(np.float32)
    ar_ids = np.array([[2], [1]], np.int64)
    ar_mask = np.array([[[1, 1]], [[1, 0]]], np.int64)
    with torch.no_grad():
        ref = model(
            pixel_values=torch.tensor(px),
            aspect_ratio_ids=torch.tensor(ar_ids),
            aspect_ratio_mask=torch.tensor(ar_mask),
        ).last_hidden_state.numpy()
    got = np.asarray(
        mllama_vision_forward(
            params, cfg, jnp.asarray(px), jnp.asarray(ar_ids),
            jnp.asarray(ar_mask),
        )
    )
    assert got.shape == ref.reshape(got.shape).shape
    np.testing.assert_allclose(got, ref.reshape(got.shape), rtol=4e-4, atol=4e-4)


def _tiny_mllama():
    from transformers.models.mllama.configuration_mllama import MllamaConfig as HFCfg

    vis = _tiny_vis_cfg().to_dict()
    txt = dict(
        vocab_size=136, hidden_size=48, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        cross_attention_layers=[1, 3], max_position_embeddings=128,
        rope_theta=10000.0, rope_scaling={"rope_type": "default"},
        pad_token_id=0,
    )
    hf_cfg = HFCfg(vision_config=vis, text_config=txt, image_token_index=136)
    torch.manual_seed(171)
    model = transformers.MllamaForConditionalGeneration(hf_cfg).eval()
    from mistralrs_tpu.models.mllama import (
        MllamaConfig,
        mllama_weights_from_state_dict,
    )

    cfg = MllamaConfig.from_hf(hf_cfg.to_dict())
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    return hf_cfg, model, cfg, mllama_weights_from_state_dict(sd, cfg)


def test_mllama_multimodal_parity_and_cached_decode():
    from mistralrs_tpu.models.mllama import (
        MllamaCache,
        encode_images,
        mllama_forward,
        prepare_cross_attention_mask,
    )

    hf_cfg, model, cfg, weights = _tiny_mllama()
    rng = np.random.default_rng(1)
    px = rng.standard_normal((1, 1, 2, 3, 16, 16)).astype(np.float32)
    ar_ids = np.array([[2]], np.int64)  # [1, 2] split → both tiles valid
    ar_mask = np.array([[[1, 1]]], np.int64)
    ids = np.array([[136, 3, 17, 9, 22]], np.int64)  # <image> then text
    t = ids.shape[1]
    # every position from the image token on attends to image 0, both tiles
    xmask = np.zeros((1, t, 1, 2), np.int64)
    xmask[:, 0:, 0, :] = 1
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(px),
            aspect_ratio_ids=torch.tensor(ar_ids),
            aspect_ratio_mask=torch.tensor(ar_mask),
            cross_attention_mask=torch.tensor(xmask),
        ).logits.numpy()

    states = encode_images(
        weights, cfg, jnp.asarray(px), jnp.asarray(ar_ids), jnp.asarray(ar_mask)
    )
    bias, full_row = prepare_cross_attention_mask(xmask, cfg.vision.num_patches)
    cache = MllamaCache.create(cfg, 1, t + 4)
    positions = jnp.arange(t)[None].astype(jnp.int32)
    got, cache = mllama_forward(
        weights, cfg, jnp.asarray(ids, jnp.int32), positions, cache,
        jnp.zeros((1,), jnp.int32), cross_states=states,
        cross_bias=jnp.asarray(bias), full_row=jnp.asarray(full_row),
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=5e-4, atol=5e-4)

    # cached decode: next token, cross K/V reused from the cache
    nxt = np.array([[7]], np.int64)
    ids2 = np.concatenate([ids, nxt], axis=1)
    xmask2 = np.zeros((1, t + 1, 1, 2), np.int64)
    xmask2[:, 0:, 0, :] = 1
    with torch.no_grad():
        ref2 = model(
            input_ids=torch.tensor(ids2),
            pixel_values=torch.tensor(px),
            aspect_ratio_ids=torch.tensor(ar_ids),
            aspect_ratio_mask=torch.tensor(ar_mask),
            cross_attention_mask=torch.tensor(xmask2),
        ).logits.numpy()[:, -1:]
    bias2, full_row2 = prepare_cross_attention_mask(
        xmask2[:, -1:], cfg.vision.num_patches
    )
    got2, _ = mllama_forward(
        weights, cfg, jnp.asarray(nxt, jnp.int32),
        jnp.asarray([[t]], jnp.int32), cache, jnp.full((1,), t, jnp.int32),
        cross_bias=jnp.asarray(bias2), full_row=jnp.asarray(full_row2),
    )
    np.testing.assert_allclose(np.asarray(got2), ref2, rtol=5e-4, atol=5e-4)


def test_mllama_text_only_skips_cross_layers():
    from mistralrs_tpu.models.mllama import MllamaCache, mllama_forward

    hf_cfg, model, cfg, weights = _tiny_mllama()
    ids = np.array([[3, 17, 9, 22, 61]], np.int64)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids)).logits.numpy()
    cache = MllamaCache.create(cfg, 1, ids.shape[1] + 2)
    positions = jnp.arange(ids.shape[1])[None].astype(jnp.int32)
    got, _ = mllama_forward(
        weights, cfg, jnp.asarray(ids, jnp.int32), positions, cache,
        jnp.zeros((1,), jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=5e-4, atol=5e-4)


def test_mllama_through_engine():
    """Image request through the continuous-batching engine (adapter path:
    paged self-attn KV + per-slot cross K/V installed at admission),
    mixed with a text-only request — greedy tokens match HF generate."""
    from mistralrs_tpu.engine.adapters import MllamaAdapter
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams

    hf_cfg, model, cfg, weights = _tiny_mllama()
    adapter = MllamaAdapter(cfg, weights, compute_dtype=jnp.float32)
    eng = Engine(
        cfg, weights, num_blocks=32, block_size=16, max_batch=2,
        backend="xla", compute_dtype=jnp.float32, adapter=adapter,
    )

    rng = np.random.default_rng(1)
    px = rng.standard_normal((1, 1, 2, 3, 16, 16)).astype(np.float32)
    ar_ids = np.array([[2]], np.int64)
    ar_mask = np.array([[[1, 1]]], np.int64)
    ids = [136, 3, 17, 9, 22]
    xmask = np.ones((1, len(ids), 1, 2), np.int64)
    with torch.no_grad():
        hf_img = model.generate(
            input_ids=torch.tensor([ids]), pixel_values=torch.tensor(px),
            aspect_ratio_ids=torch.tensor(ar_ids),
            aspect_ratio_mask=torch.tensor(ar_mask),
            cross_attention_mask=torch.tensor(xmask),
            max_new_tokens=6, do_sample=False,
        )[0, len(ids):].tolist()
    ids_txt = [3, 17, 9, 22, 61]
    with torch.no_grad():
        hf_txt = model.generate(
            input_ids=torch.tensor([ids_txt]), max_new_tokens=6,
            do_sample=False,
        )[0, len(ids_txt):].tolist()

    pids, state = adapter.prepare_request(ids, px, ar_ids, ar_mask, img_start=0)
    seq_img = eng.add_request(
        pids, SamplingParams(temperature=0.0, max_tokens=6),
        adapter_state=state,
    )
    seq_txt = eng.add_request(
        ids_txt, SamplingParams(temperature=0.0, max_tokens=6)
    )
    eng.run_to_completion()
    assert seq_img.output_ids == hf_img
    assert seq_txt.output_ids == hf_txt

    # slot reuse: a new text-only request on the (released) image slot must
    # not see stale cross state
    seq_txt2 = eng.add_request(
        ids_txt, SamplingParams(temperature=0.0, max_tokens=6)
    )
    seq_txt3 = eng.add_request(
        list(reversed(ids_txt)), SamplingParams(temperature=0.0, max_tokens=3)
    )
    eng.run_to_completion()
    assert seq_txt2.output_ids == hf_txt
    assert len(seq_txt3.output_ids) == 3
