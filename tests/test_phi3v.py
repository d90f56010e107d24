"""Phi-3-vision (reference-spec, no HF class in this image): structural
parity — token-count formula, separator placement, 2x2 shuffle layout —
and engine serving on a synthetic checkpoint with real Phi-3-vision key
names."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mistralrs_tpu.models.phi3v import (
    Phi3VConfig,
    encode_images,
    num_image_tokens,
    phi3v_weights_from_state_dict,
    prepare_multimodal_prompt,
)


def _tiny():
    """Synthetic state dict with microsoft/Phi-3-vision key layout: a tiny
    phi3 text stack + a tiny CLIP tower + glb_GN/sub_GN + img_projection."""
    rng = np.random.default_rng(42)
    hf_cfg = {
        "architectures": ["Phi3ForCausalLM"],
        "vocab_size": 160, "hidden_size": 48, "intermediate_size": 96,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "max_position_embeddings": 128,
        "rms_norm_eps": 1e-5,
        "embd_layer": {"embedding_cls": "image", "hd_transform_order": "sub_glb",
                       "use_hd_transform": True, "with_learnable_separator": True},
        "img_processor": {"image_dim_out": 16, "intermediate_size": 32,
                          "num_hidden_layers": 2, "num_attention_heads": 4,
                          "image_size": 32, "patch_size": 8},
        "image_token_id": 150,
    }
    cfg = Phi3VConfig.from_hf(hf_cfg)

    def r(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    c = 16
    sd = {"model.embed_tokens.weight": r(160, 48),
          "model.norm.weight": np.ones(48, np.float32),
          "lm_head.weight": r(160, 48)}
    for i in range(2):
        p = f"model.layers.{i}."
        sd |= {
            p + "input_layernorm.weight": np.ones(48, np.float32),
            p + "post_attention_layernorm.weight": np.ones(48, np.float32),
            p + "self_attn.qkv_proj.weight": r(48 + 2 * 24, 48),
            p + "self_attn.o_proj.weight": r(48, 48),
            p + "mlp.gate_up_proj.weight": r(192, 48),
            p + "mlp.down_proj.weight": r(48, 96),
        }
    v = "model.vision_embed_tokens."
    vm = v + "img_processor.vision_model."
    sd |= {
        vm + "embeddings.patch_embedding.weight": r(c, 3, 8, 8),
        vm + "embeddings.position_embedding.weight": r(17, c),
        vm + "embeddings.class_embedding": r(c),
        vm + "pre_layrnorm.weight": np.ones(c, np.float32),
        vm + "pre_layrnorm.bias": np.zeros(c, np.float32),
        v + "glb_GN": r(1, 1, 4 * c),
        v + "sub_GN": r(1, 1, 1, 4 * c),
        v + "img_projection.0.weight": r(48, 4 * c),
        v + "img_projection.0.bias": r(48),
        v + "img_projection.2.weight": r(48, 48),
        v + "img_projection.2.bias": r(48),
    }
    for i in range(2):
        p = vm + f"encoder.layers.{i}."
        for nm, shape in [
            ("self_attn.q_proj", (c, c)), ("self_attn.k_proj", (c, c)),
            ("self_attn.v_proj", (c, c)), ("self_attn.out_proj", (c, c)),
            ("mlp.fc1", (32, c)), ("mlp.fc2", (c, 32)),
        ]:
            sd[p + nm + ".weight"] = r(*shape)
            sd[p + nm + ".bias"] = r(shape[0])
        for nm in ("layer_norm1", "layer_norm2"):
            sd[p + nm + ".weight"] = np.ones(c, np.float32)
            sd[p + nm + ".bias"] = np.zeros(c, np.float32)
    return hf_cfg, cfg, phi3v_weights_from_state_dict(sd, cfg)


def test_phi3v_assembly_structure():
    """Token count matches the reference formula; glb_GN/sub_GN rows land
    exactly where mod.rs's sub_glb concatenation puts them."""
    hf_cfg, cfg, weights = _tiny()
    rng = np.random.default_rng(0)
    image_size = (32, 64)  # 1x2 crop grid
    px = rng.standard_normal((3, 3, 32, 32)).astype(np.float32)
    n_tok = num_image_tokens(cfg, image_size)
    base = 2  # (32/8)/2
    h, w = 1, 2
    assert n_tok == (h * w + 1) * base * base + 1 + (h + 1) * base

    out = np.asarray(encode_images(weights, cfg, jnp.asarray(px), image_size))[0]
    assert out.shape == (n_tok, 48)
    # the glb_GN separator row sits right after the sub block
    sub_rows = (h * base) * (w * base + 1)
    proj = lambda x: np.asarray(  # noqa: E731
        jnp.asarray(x) @ np.asarray(weights["proj_w1"]).T + np.asarray(weights["proj_b1"])
    )
    import jax

    glb_gn_proj = np.asarray(
        (jax.nn.gelu(jnp.asarray(proj(np.asarray(weights["glb_gn"])[None])), approximate=False)
         @ np.asarray(weights["proj_w2"]).T) + np.asarray(weights["proj_b2"])
    )[0]
    np.testing.assert_allclose(out[sub_rows], glb_gn_proj, rtol=1e-5, atol=1e-5)
    # every (w*base+1)-th row of the sub block is the projected sub_GN
    sub_gn_proj = np.asarray(
        (jax.nn.gelu(jnp.asarray(proj(np.asarray(weights["sub_gn"])[None])), approximate=False)
         @ np.asarray(weights["proj_w2"]).T) + np.asarray(weights["proj_b2"])
    )[0]
    for r_ in range(h * base):
        np.testing.assert_allclose(
            out[r_ * (w * base + 1) + w * base], sub_gn_proj, rtol=1e-5, atol=1e-5
        )


def test_phi3v_through_engine():
    """Synthetic checkpoint served end-to-end: image embeds merge and the
    engine decodes deterministically (greedy twice → same tokens; image
    change → different prefix hash)."""
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams

    hf_cfg, cfg, weights = _tiny()
    rng = np.random.default_rng(1)
    image_size = (32, 64)
    px = rng.standard_normal((3, 3, 32, 32)).astype(np.float32)
    n_tok = num_image_tokens(cfg, image_size)
    ids = [3, 17] + [150] * n_tok + [9, 22]
    pids, embeds, extra = prepare_multimodal_prompt(
        weights, cfg, ids, px, image_size, compute_dtype=jnp.float32
    )
    assert extra

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
    # different image → different merged embeds
    px2 = rng.standard_normal((3, 3, 32, 32)).astype(np.float32)
    _, embeds2, extra2 = prepare_multimodal_prompt(
        weights, cfg, ids, px2, image_size, compute_dtype=jnp.float32
    )
    assert extra2 != extra
    assert float(np.abs(np.asarray(embeds2) - np.asarray(embeds)).max()) > 1e-3


def test_phi3v_serving_adapter():
    from mistralrs_tpu.serving.vlm import build_adapter

    hf_cfg, cfg, weights = _tiny()
    ad = build_adapter("phi3v", weights, cfg, compute_dtype=jnp.float32,
                       max_crops=4)
    rng = np.random.default_rng(2)
    im = rng.integers(0, 255, (24, 48, 3), np.uint8)  # 1x2 grid
    media = ad.process([im])
    assert media.pixels.shape == (3, 3, 32, 32)
    assert media.counts == [num_image_tokens(cfg, (32, 64))]
    ids = [3] + [150] * media.counts[0] + [9]
    kwargs = ad.prepare(ids, media)
    assert kwargs["prompt_embeds"].shape == (len(ids), 48)
