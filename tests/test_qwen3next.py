"""Qwen3-Next (gated DeltaNet hybrid): logit parity vs HF + cached-decode
consistency (the GDN analog of the reference's `gdn/` kernels, validated
against the torch recurrence)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mistralrs_tpu.models.qwen3next import (
    Qwen3NextCache,
    Qwen3NextConfig,
    qwen3next_forward,
    qwen3next_greedy_generate,
    qwen3next_weights_from_state_dict,
)


def _tiny():
    hf_cfg = transformers.Qwen3NextConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16,
        layer_types=["linear_attention", "full_attention",
                     "linear_attention", "full_attention"],
        linear_num_value_heads=4, linear_num_key_heads=2,
        linear_key_head_dim=8, linear_value_head_dim=8,
        linear_conv_kernel_dim=3,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        shared_expert_intermediate_size=32, decoder_sparse_step=1,
        mlp_only_layers=[], norm_topk_prob=True,
        max_position_embeddings=64, tie_word_embeddings=False,
        pad_token_id=0,
    )
    torch.manual_seed(22)
    model = transformers.Qwen3NextForCausalLM(hf_cfg).eval()
    cfg = Qwen3NextConfig.from_hf(hf_cfg.to_dict())
    sd = {k: v.detach().numpy().astype(np.float32) for k, v in model.state_dict().items()}
    weights = qwen3next_weights_from_state_dict(sd, cfg)
    return hf_cfg, model, cfg, weights


def test_qwen3next_parity():
    _, model, cfg, weights = _tiny()
    ids = np.array([[3, 17, 40, 9, 22, 61, 5, 2]], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    b, t = ids.shape
    cache = Qwen3NextCache.create(cfg, b, t + 4)
    positions = np.broadcast_to(np.arange(t)[None], (b, t)).astype(np.int32)
    got, _ = qwen3next_forward(
        weights, cfg, jnp.asarray(ids), jnp.asarray(positions), cache,
        jnp.zeros((b,), jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=5e-4, atol=5e-4)


def test_qwen3next_cached_decode_matches_hf_generate():
    """Recurrent + conv state decode reproduces HF greedy generation."""
    _, model, cfg, weights = _tiny()
    prompt = [3, 17, 40, 9, 22]
    with torch.no_grad():
        ref = model.generate(
            torch.tensor([prompt]), max_new_tokens=8, do_sample=False
        )[0, len(prompt):].tolist()
    got = qwen3next_greedy_generate(weights, cfg, prompt, max_new_tokens=8)
    assert got == ref[: len(got)]


def test_chunked_delta_rule_matches_scan():
    """Chunk-parallel gated delta rule ≡ sequential scan (same math),
    including chunk-boundary state carry, non-multiple lengths, nonzero
    initial state, and masked pad rows (beta=g=0)."""
    import jax.numpy as jnp

    from mistralrs_tpu.models.qwen3next import (
        _delta_rule_chunked,
        _delta_rule_scan,
    )

    rng = np.random.default_rng(7)
    b, n, dk, dv = 2, 3, 8, 16
    for t, chunk in [(1, 4), (4, 4), (9, 4), (64, 16), (37, 16)]:
        q = rng.standard_normal((b, t, n, dk)).astype(np.float32)
        k = rng.standard_normal((b, t, n, dk)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        k /= np.linalg.norm(k, axis=-1, keepdims=True)
        v = rng.standard_normal((b, t, n, dv)).astype(np.float32)
        g = -np.abs(rng.standard_normal((b, t, n))).astype(np.float32) * 0.3
        beta = rng.uniform(0.1, 1.0, (b, t, n)).astype(np.float32)
        # mask a tail on row 1 (paged pad-row convention)
        if t > 2:
            beta[1, -2:] = 0.0
            g[1, -2:] = 0.0
        s0 = rng.standard_normal((b, n, dk, dv)).astype(np.float32) * 0.2
        o_ref, s_ref = _delta_rule_scan(*map(jnp.asarray, (q, k, v, g, beta, s0)))
        o_chk, s_chk = _delta_rule_chunked(
            *map(jnp.asarray, (q, k, v, g, beta, s0)), chunk=chunk
        )
        np.testing.assert_allclose(
            np.asarray(o_chk), np.asarray(o_ref), rtol=2e-4, atol=2e-4,
            err_msg=f"outputs t={t} chunk={chunk}",
        )
        np.testing.assert_allclose(
            np.asarray(s_chk), np.asarray(s_ref), rtol=2e-4, atol=2e-4,
            err_msg=f"state t={t} chunk={chunk}",
        )
