"""Gemma 4 vision tower + unified embedder — reference-spec invariant tests
(no public HF class exists; semantics follow
`mistralrs-core/src/vision_models/gemma4/vision.rs`, same protocol as the
gemma4 text core in test_gemma4.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mistralrs_tpu.vision.gemma4 import (
    Gemma4VisionConfig,
    _pool_by_positions,
    _rope_2d,
    _apply_rope_2d,
    multimodal_embed,
    patch_positions,
    patchify,
    unified_vision_embed,
    vision_tower_encode,
    vision_weights_from_state_dict,
)

CFG = Gemma4VisionConfig(
    hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, head_dim=16,
    patch_size=4, position_embedding_size=64, pooling_kernel_size=2,
    default_output_length=16, rope_theta=100.0,
)


def _tower_sd(cfg=CFG, clips=False, std=False, seed=0):
    rng = np.random.default_rng(seed)

    def r(*s):
        return (rng.standard_normal(s) * 0.1).astype(np.float32)

    pd = cfg.patch_size * cfg.patch_size * 3
    sd = {
        "patch_embedder.input_proj.weight": r(cfg.hidden_size, pd),
        "patch_embedder.position_embedding_table": r(
            2, cfg.position_embedding_size, cfg.hidden_size),
    }
    if std:
        sd["std_bias"] = r(cfg.hidden_size)
        sd["std_scale"] = 1.0 + r(cfg.hidden_size)
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layers.{i}."
        nh, nkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                       cfg.head_dim)
        sd.update({
            p + "input_layernorm.weight": r(cfg.hidden_size),
            p + "post_attention_layernorm.weight": r(cfg.hidden_size),
            p + "pre_feedforward_layernorm.weight": r(cfg.hidden_size),
            p + "post_feedforward_layernorm.weight": r(cfg.hidden_size),
            p + "self_attn.q_proj.weight": r(nh * hd, cfg.hidden_size),
            p + "self_attn.k_proj.weight": r(nkv * hd, cfg.hidden_size),
            p + "self_attn.v_proj.weight": r(nkv * hd, cfg.hidden_size),
            p + "self_attn.o_proj.weight": r(cfg.hidden_size, nh * hd),
            p + "self_attn.q_norm.weight": r(hd),
            p + "self_attn.k_norm.weight": r(hd),
            p + "mlp.gate_proj.weight": r(cfg.intermediate_size,
                                          cfg.hidden_size),
            p + "mlp.up_proj.weight": r(cfg.intermediate_size,
                                        cfg.hidden_size),
            p + "mlp.down_proj.weight": r(cfg.hidden_size,
                                          cfg.intermediate_size),
        })
        if clips:
            sd[p + "self_attn.q_proj.input_min"] = np.float32(-1.0)
            sd[p + "self_attn.q_proj.input_max"] = np.float32(1.0)
    return {("model.vision_tower." + k): v for k, v in sd.items()}


def test_patchify_roundtrip_layout():
    """patchify lays the patch vector out as (ps, ps, C) row-major — one
    patch of a constant-channel image is that channel value repeated."""
    ps = 4
    img = np.zeros((3, 8, 8), np.float32)
    img[0] = 1.0
    img[1] = 2.0
    img[2] = 3.0
    out = np.asarray(patchify(jnp.asarray(img), ps))
    assert out.shape == (4, ps * ps * 3)
    # layout (ps, ps, c): channel varies fastest
    np.testing.assert_allclose(out[0, :3], [1.0, 2.0, 3.0])
    # spatial identity: patch p contains exactly the pixels of its tile
    img2 = np.arange(3 * 8 * 8, dtype=np.float32).reshape(3, 8, 8)
    out2 = np.asarray(patchify(jnp.asarray(img2), ps))
    # patch 1 = columns 4..8 of rows 0..4; element (row=0, col=4, ch=0)
    assert out2[1, 0] == img2[0, 0, 4]


def test_rope2d_properties():
    """Per-axis rotation: norm-preserving, identity at (0,0), and a patch's
    x-axis slice is invariant to its row (axis separability)."""
    hd = 16
    pos = jnp.asarray([[0, 0], [3, 0], [3, 5]])
    cos, sin = _rope_2d(pos, hd, 100.0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((3, 2, hd)),
                    jnp.float32)
    y = _apply_rope_2d(x, cos, sin)
    np.testing.assert_allclose(  # identity at the origin
        np.asarray(y[0]), np.asarray(x[0]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(  # rotations preserve norms
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5)
    # x-slice (first half) depends only on column: patches 1 and 2 share col
    np.testing.assert_allclose(
        np.asarray(y[1, :, : hd // 2] * 0 + _apply_rope_2d(
            x[1:2], cos[2:3], sin[2:3])[0][:, : hd // 2]),
        np.asarray(_apply_rope_2d(x[1:2], cos[1:2], sin[1:2])[0][:, : hd // 2]),
        rtol=1e-5, atol=1e-5)


def test_pooler_is_exact_kxk_average():
    """The position-binned scatter pooling equals plain k×k average pooling
    on a full grid (vision.rs:588 avg_pool_by_positions)."""
    ph = pw = 4
    k = 2
    dim = 8
    rng = np.random.default_rng(1)
    x = rng.standard_normal((ph * pw, dim)).astype(np.float32)
    pos = patch_positions(ph, pw)
    out = np.asarray(_pool_by_positions(
        jnp.asarray(x), jnp.asarray(pos), (ph * pw) // (k * k)))
    grid = x.reshape(ph, pw, dim)
    ref = grid.reshape(ph // k, k, pw // k, k, dim).mean(axis=(1, 3))
    np.testing.assert_allclose(out, ref.reshape(-1, dim), rtol=1e-5,
                               atol=1e-6)


def test_tower_shapes_and_determinism():
    sd = _tower_sd()
    w = vision_weights_from_state_dict(sd, CFG)
    img = jnp.asarray(
        np.random.default_rng(2).random((3, 16, 16)), jnp.float32)
    toks = vision_tower_encode(w, CFG, img)
    # 16×16 @ ps=4 → 16 patches; k=2 → 4 pooled tokens
    assert toks.shape == (4, CFG.hidden_size)
    toks2 = vision_tower_encode(w, CFG, img)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))
    # a bigger image yields more tokens at the same weights (NaFlex-style)
    img2 = jnp.asarray(
        np.random.default_rng(3).random((3, 32, 16)), jnp.float32)
    assert vision_tower_encode(w, CFG, img2).shape == (8, CFG.hidden_size)


def test_tower_standardize_and_clips():
    sd = _tower_sd(clips=True, std=True)
    w = vision_weights_from_state_dict(sd, CFG)
    assert w["layers"][0]["q"]["in_min"] == -1.0
    img = jnp.asarray(
        np.random.default_rng(4).random((3, 16, 16)), jnp.float32)
    toks = np.asarray(vision_tower_encode(w, CFG, img))
    assert np.isfinite(toks).all()
    # standardize changes the output vs the plain tower
    w2 = vision_weights_from_state_dict(_tower_sd(clips=True, std=False), CFG)
    toks2 = np.asarray(vision_tower_encode(w2, CFG, img))
    assert not np.allclose(toks, toks2)


def test_multimodal_embedder_projects_to_text_space():
    rng = np.random.default_rng(5)
    w = {"proj": jnp.asarray(rng.standard_normal((48, CFG.hidden_size)),
                             jnp.float32)}
    feats = jnp.asarray(rng.standard_normal((4, CFG.hidden_size)),
                        jnp.float32)
    out = multimodal_embed(w, feats)
    assert out.shape == (4, 48)
    # weightless RMSNorm: scaling the input must not change the output
    out2 = multimodal_embed(w, feats * 7.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-4,
                               atol=1e-5)


def test_unified_embedder_padding_selection():
    rng = np.random.default_rng(6)
    pd = CFG.patch_size * CFG.patch_size * 3
    w = {
        "ln1_w": jnp.ones(pd), "ln1_b": jnp.zeros(pd),
        "dense_w": jnp.asarray(rng.standard_normal((CFG.hidden_size, pd)),
                               jnp.float32) * 0.1,
        "dense_b": jnp.zeros(CFG.hidden_size),
        "ln2_w": jnp.ones(CFG.hidden_size), "ln2_b": jnp.zeros(CFG.hidden_size),
        "pos_norm_w": jnp.ones(CFG.hidden_size),
        "pos_norm_b": jnp.zeros(CFG.hidden_size),
        "pos_table": jnp.asarray(
            rng.standard_normal((2, CFG.position_embedding_size,
                                 CFG.hidden_size)), jnp.float32) * 0.1,
        "embedder": {"proj": jnp.asarray(
            rng.standard_normal((48, CFG.hidden_size)), jnp.float32)},
    }
    patches = jnp.asarray(rng.standard_normal((6, pd)), jnp.float32)
    pos = jnp.asarray([[0, 0], [1, 0], [2, 0], [3, 0], [-1, -1], [-1, -1]])
    toks, valid = unified_vision_embed(w, CFG, patches, pos)
    assert toks.shape == (6, 48)
    assert np.asarray(valid).tolist() == [True] * 4 + [False] * 2


def test_gemma4_vlm_engine_image_request():
    """End-to-end: image → gemma4 VLM serving adapter → merged prompt
    embeds → engine-served Gemma4Adapter; image content must change the
    output vs a blank image (the tower path of gemma4/mod.rs:360-430)."""
    import sys
    from dataclasses import dataclass
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_gemma4 import HF_CFG, _sd as _g4_sd

    from mistralrs_tpu.engine.adapters import Gemma4Adapter
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models.gemma4 import (
        Gemma4Config, gemma4_weights_from_state_dict,
    )
    from mistralrs_tpu.serving.vlm import build_adapter
    from mistralrs_tpu.vision.gemma4 import vision_weights_from_state_dict

    tcfg = Gemma4Config.from_hf(HF_CFG)
    vcfg = Gemma4VisionConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=1,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        patch_size=4, position_embedding_size=256, pooling_kernel_size=2,
        default_output_length=16,
    )

    @dataclass(frozen=True)
    class VL:
        text: Gemma4Config
        vision: Gemma4VisionConfig
        image_token_id: int = 90

    rng = np.random.default_rng(7)
    tower_sd = {}
    pd = vcfg.patch_size ** 2 * 3
    tower_sd["model.vision_tower.patch_embedder.input_proj.weight"] = (
        rng.standard_normal((vcfg.hidden_size, pd)).astype(np.float32) * 0.1)
    tower_sd["model.vision_tower.patch_embedder.position_embedding_table"] = (
        rng.standard_normal(
            (2, vcfg.position_embedding_size, vcfg.hidden_size)
        ).astype(np.float32) * 0.1)
    p = "model.vision_tower.encoder.layers.0."
    nh, nkv, hd = (vcfg.num_attention_heads, vcfg.num_key_value_heads,
                   vcfg.head_dim)
    for name, shape in (
        ("input_layernorm.weight", (vcfg.hidden_size,)),
        ("post_attention_layernorm.weight", (vcfg.hidden_size,)),
        ("pre_feedforward_layernorm.weight", (vcfg.hidden_size,)),
        ("post_feedforward_layernorm.weight", (vcfg.hidden_size,)),
        ("self_attn.q_proj.weight", (nh * hd, vcfg.hidden_size)),
        ("self_attn.k_proj.weight", (nkv * hd, vcfg.hidden_size)),
        ("self_attn.v_proj.weight", (nkv * hd, vcfg.hidden_size)),
        ("self_attn.o_proj.weight", (vcfg.hidden_size, nh * hd)),
        ("self_attn.q_norm.weight", (hd,)),
        ("self_attn.k_norm.weight", (hd,)),
        ("mlp.gate_proj.weight", (vcfg.intermediate_size, vcfg.hidden_size)),
        ("mlp.up_proj.weight", (vcfg.intermediate_size, vcfg.hidden_size)),
        ("mlp.down_proj.weight", (vcfg.hidden_size, vcfg.intermediate_size)),
    ):
        tower_sd[p + name] = (
            rng.standard_normal(shape).astype(np.float32) * 0.1)

    text_w = gemma4_weights_from_state_dict(_g4_sd(tcfg), tcfg)
    weights = {
        "text": text_w,
        "vision": vision_weights_from_state_dict(tower_sd, vcfg),
        "embed_vision": {"proj": jnp.asarray(
            rng.standard_normal((tcfg.hidden_size, vcfg.hidden_size)),
            jnp.float32) * 0.1},
    }
    cfg = VL(text=tcfg, vision=vcfg)
    vlm = build_adapter("gemma4", weights, cfg, compute_dtype=jnp.float32,
                        image_size=16)

    img = (rng.random((24, 24, 3)) * 255).astype(np.uint8)
    media = vlm.process([img])
    n_tok = media.counts[0]
    assert n_tok == 4  # 16/4=4 patches per side → 16 patches → k=2 → 4

    prompt = [1, 5] + [cfg.image_token_id] * n_tok + [9, 3]
    kwargs = vlm.prepare(prompt, media)
    assert kwargs["prompt_embeds"].shape == (len(prompt), tcfg.hidden_size)

    adapter = Gemma4Adapter(tcfg, text_w)
    eng = Engine(tcfg, text_w, num_blocks=32, block_size=8, max_batch=2,
                 prefill_chunk=8, compute_dtype=jnp.float32, adapter=adapter)
    seq = eng.add_request(
        prompt, SamplingParams(temperature=0.0, max_tokens=4), **kwargs)
    eng.run_to_completion()
    assert len(seq.output_ids) == 4

    # a different image must change the merged embeds (content flows)
    img2 = np.zeros_like(img)
    kwargs2 = vlm.prepare(prompt, vlm.process([img2]))
    assert not np.allclose(np.asarray(kwargs["prompt_embeds"]),
                           np.asarray(kwargs2["prompt_embeds"]))
