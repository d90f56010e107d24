"""Gemma 4 audio encoder — reference-spec invariant tests
(`mistralrs-core/src/vision_models/gemma4/audio.rs`; same protocol as the
gemma4 text/vision cores: no public HF class ships for this family)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mistralrs_tpu.audio.gemma4 import (
    Gemma4AudioConfig,
    gemma4_audio_encode,
    gemma4_audio_weights_from_state_dict,
)

CFG = Gemma4AudioConfig(
    input_feat_size=16, hidden_size=32, output_proj_dims=24,
    conf_attention_chunk_size=4, conf_attention_context_left=5,
    conf_attention_context_right=0, conf_num_attention_heads=4,
    conf_num_hidden_layers=2, conf_conv_kernel_size=3,
    sscp_conv_channel_size=(8, 4),
)


def _sd(cfg=CFG, seed=0, out_proj=True):
    rng = np.random.default_rng(seed)

    def r(*s):
        return (rng.standard_normal(s) * 0.1).astype(np.float32)

    c0, c1 = cfg.sscp_conv_channel_size
    f1 = (cfg.input_feat_size + 2 - 3) // 2 + 1
    f2 = (f1 + 2 - 3) // 2 + 1
    sd = {
        "subsample_conv_projection.layer0.conv.weight": r(c0, 1, 3, 3),
        "subsample_conv_projection.layer1.conv.weight": r(c1, c0, 3, 3),
        "subsample_conv_projection.input_proj_linear.weight": r(
            cfg.hidden_size, c1 * f2),
    }
    if out_proj:
        sd["output_proj.weight"] = r(cfg.output_proj_dims, cfg.hidden_size)
        sd["output_proj.bias"] = r(cfg.output_proj_dims)
    nh, hd = cfg.conf_num_attention_heads, cfg.head_dim
    for i in range(cfg.conf_num_hidden_layers):
        p = f"layers.{i}."
        sd.update({
            p + "norm_pre_attn.weight": r(cfg.hidden_size),
            p + "norm_post_attn.weight": r(cfg.hidden_size),
            p + "norm_out.weight": r(cfg.hidden_size),
            p + "self_attn.q_proj.weight": r(nh * hd, cfg.hidden_size),
            p + "self_attn.k_proj.weight": r(nh * hd, cfg.hidden_size),
            p + "self_attn.v_proj.weight": r(nh * hd, cfg.hidden_size),
            p + "self_attn.post.weight": r(cfg.hidden_size, cfg.hidden_size),
            p + "self_attn.per_dim_scale": r(hd),
            p + "self_attn.relative_k_proj.weight": r(
                nh * hd, cfg.hidden_size),
            p + "lconv1d.pre_layer_norm.weight": r(cfg.hidden_size),
            p + "lconv1d.linear_start.weight": r(
                2 * cfg.hidden_size, cfg.hidden_size),
            p + "lconv1d.depthwise_conv1d.weight": r(
                cfg.hidden_size, 1, cfg.conf_conv_kernel_size),
            p + "lconv1d.conv_norm.weight": r(cfg.hidden_size),
            p + "lconv1d.linear_end.weight": r(
                cfg.hidden_size, cfg.hidden_size),
        })
        for name in ("feed_forward1", "feed_forward2"):
            sd.update({
                p + name + ".pre_layer_norm.weight": r(cfg.hidden_size),
                p + name + ".ffw_layer_1.weight": r(
                    4 * cfg.hidden_size, cfg.hidden_size),
                p + name + ".ffw_layer_2.weight": r(
                    cfg.hidden_size, 4 * cfg.hidden_size),
                p + name + ".post_layer_norm.weight": r(cfg.hidden_size),
            })
    return {("model.audio_tower." + k): v for k, v in sd.items()}


def test_shapes_and_mask_subsampling():
    w = gemma4_audio_weights_from_state_dict(_sd(), CFG)
    rng = np.random.default_rng(1)
    T = 37
    mel = jnp.asarray(rng.standard_normal((1, T, CFG.input_feat_size)),
                      jnp.float32)
    mask = jnp.zeros((1, T), jnp.int32)
    out, m = gemma4_audio_encode(w, CFG, mel, mask)
    # two stride-2 semicausal convs: ceil semantics on the frame axis
    assert out.shape[1] == m.shape[1]
    assert out.shape[2] == CFG.output_proj_dims
    assert np.isfinite(np.asarray(out)).all()


def test_padding_frames_are_zeroed_and_ignored():
    """PAD frames produce zero features, and changing PAD content must not
    change valid frames (mask-respecting attention + convs)."""
    w = gemma4_audio_weights_from_state_dict(_sd(), CFG)
    rng = np.random.default_rng(2)
    T, T_valid = 32, 20
    mel = rng.standard_normal((1, T, CFG.input_feat_size)).astype(np.float32)
    mask = np.zeros((1, T), np.int32)
    mask[0, T_valid:] = 1
    out1, m1 = gemma4_audio_encode(
        w, CFG, jnp.asarray(mel), jnp.asarray(mask))
    mel2 = mel.copy()
    mel2[0, T_valid:] = 777.0  # garbage in the padding
    out2, _ = gemma4_audio_encode(
        w, CFG, jnp.asarray(mel2), jnp.asarray(mask))
    o1, o2 = np.asarray(out1), np.asarray(out2)
    valid = np.asarray(m1[0]) == 0
    np.testing.assert_allclose(o1[0, valid], o2[0, valid], rtol=2e-4,
                               atol=2e-5)
    # padded output frames are exactly zero
    np.testing.assert_array_equal(o1[0, ~valid], 0.0)


def test_locality_horizon():
    """Left-context attention: perturbing frame 0 must not affect outputs
    far beyond the (chunk + left context) horizon through ONE layer — the
    conformer's receptive field is bounded per layer (audio.rs local
    chunked attention + causal depthwise conv)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, conf_num_hidden_layers=1)
    w = gemma4_audio_weights_from_state_dict(
        _sd(cfg, out_proj=False), cfg)
    rng = np.random.default_rng(3)
    T = 120  # → 30 subsampled frames after two stride-2 convs
    mel = rng.standard_normal((1, T, cfg.input_feat_size)).astype(np.float32)
    mask = np.zeros((1, T), np.int32)
    out1, _ = gemma4_audio_encode(w, cfg, jnp.asarray(mel), jnp.asarray(mask))
    mel2 = mel.copy()
    mel2[0, :2] += 3.0
    out2, _ = gemma4_audio_encode(w, cfg, jnp.asarray(mel2), jnp.asarray(mask))
    d = np.abs(np.asarray(out1) - np.asarray(out2))[0]
    # frame 0 of the subsampled stream ≈ mel frames 0..4; horizon in
    # subsampled frames: chunk(4) + left(4) + conv kernel −1 → well under 16
    assert d[:2].max() > 1e-5  # the perturbation is visible locally
    assert d[16:].max() < 1e-6  # and invisible far beyond the horizon


def test_reduction_factor():
    import dataclasses

    cfg = dataclasses.replace(CFG, conf_reduction_factor=2)
    w = gemma4_audio_weights_from_state_dict(_sd(cfg), cfg)
    rng = np.random.default_rng(4)
    mel = jnp.asarray(rng.standard_normal((1, 40, cfg.input_feat_size)),
                      jnp.float32)
    mask = jnp.zeros((1, 40), jnp.int32)
    out, m = gemma4_audio_encode(w, cfg, mel, mask)
    base_cfg = CFG
    wb = gemma4_audio_weights_from_state_dict(_sd(), base_cfg)
    out_b, _ = gemma4_audio_encode(wb, base_cfg, mel, mask)
    assert out.shape[1] == -(-out_b.shape[1] // 2)
