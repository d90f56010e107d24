"""Perplexity harness: exactness vs a hand-computed NLL, and ΔPPL of ISQ
quantization on a *trained* tiny model (random weights would make every
quant look perfect — training gives the distribution structure that
quantization error can actually damage)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mistralrs_tpu.generate import _freeze
from mistralrs_tpu.gguf.constants import GGMLType
from mistralrs_tpu.models import ModelConfig
from mistralrs_tpu.models.hf_loader import weights_from_state_dict
from mistralrs_tpu.models.llama import KVCache, forward
from mistralrs_tpu.perplexity import compute_perplexity

# K dims must be multiples of 256 or Q4_K ISQ silently skips the tensor
CFG = ModelConfig(
    arch="llama", vocab_size=64, hidden_size=256, intermediate_size=512,
    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64,
    max_position_embeddings=256,
)

REV = {
    "wq": "self_attn.q_proj.weight", "wk": "self_attn.k_proj.weight",
    "wv": "self_attn.v_proj.weight", "wo": "self_attn.o_proj.weight",
    "gate": "mlp.gate_proj.weight", "up": "mlp.up_proj.weight",
    "down": "mlp.down_proj.weight", "attn_norm": "input_layernorm.weight",
    "ffn_norm": "post_attention_layernorm.weight",
}


def _state_dict(cfg, seed=0):
    rng = np.random.default_rng(seed)

    def r(*s):
        return (rng.standard_normal(s) * 0.05).astype(np.float32)

    sd = {
        "model.embed_tokens.weight": r(cfg.vocab_size, cfg.hidden_size),
        "model.norm.weight": np.ones(cfg.hidden_size, np.float32),
        "lm_head.weight": r(cfg.vocab_size, cfg.hidden_size),
    }
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(cfg.hidden_size, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(cfg.hidden_size, np.float32)
        sd[p + "self_attn.q_proj.weight"] = r(cfg.q_dim, cfg.hidden_size)
        sd[p + "self_attn.k_proj.weight"] = r(cfg.kv_dim, cfg.hidden_size)
        sd[p + "self_attn.v_proj.weight"] = r(cfg.kv_dim, cfg.hidden_size)
        sd[p + "self_attn.o_proj.weight"] = r(cfg.hidden_size, cfg.q_dim)
        sd[p + "mlp.gate_proj.weight"] = r(cfg.intermediate_size, cfg.hidden_size)
        sd[p + "mlp.up_proj.weight"] = r(cfg.intermediate_size, cfg.hidden_size)
        sd[p + "mlp.down_proj.weight"] = r(cfg.hidden_size, cfg.intermediate_size)
    return sd


def _corpus(n, v, seed=1):
    """Affine next-token language with 10% noise — learnable structure."""
    rng = np.random.default_rng(seed)
    ids = np.zeros(n, np.int32)
    ids[0] = rng.integers(v)
    for t in range(1, n):
        if rng.random() < 0.1:
            ids[t] = rng.integers(v)
        else:
            ids[t] = (ids[t - 1] * 5 + 3) % v
    return ids


def test_perplexity_matches_manual():
    sd = _state_dict(CFG)
    w = weights_from_state_dict(sd, CFG, dtype=jnp.float32)
    ids = _corpus(64, CFG.vocab_size)
    r = compute_perplexity(
        w, CFG, ids, window=32, batch_size=2, compute_dtype=jnp.float32,
        burn_in=1,
    )
    # manual: NLL of positions 1..31 of each 32-token window
    fcfg = _freeze(CFG)
    total, cnt = 0.0, 0
    for win in ids[:64].reshape(2, 32):
        cache = KVCache.create(CFG, 1, 32, dtype=jnp.float32)
        logits, _ = forward(
            w, fcfg, jnp.asarray(win[None]), jnp.arange(32)[None],
            cache, jnp.zeros((1,), jnp.int32), compute_dtype=jnp.float32,
        )
        lp = jax.nn.log_softmax(np.asarray(logits, np.float64)[0])
        for t in range(1, 32):
            total -= lp[t - 1, win[t]]
            cnt += 1
    assert r["tokens_scored"] == cnt
    np.testing.assert_allclose(r["nll"], total / cnt, rtol=1e-4)


def _train(sd, ids, steps=250, bs=16, t=32, lr=8e-3, seed=0):
    """Train the f32 weight pytree on next-token CE over the corpus."""
    import optax

    w = weights_from_state_dict(sd, CFG, dtype=jnp.float32)
    params = {
        "embed": w["embed"], "final_norm": w["final_norm"],
        "lm_head": w["lm_head"], "layers": w["layers"],
    }
    static = {k: v for k, v in w.items() if k not in params}
    fcfg = _freeze(CFG)
    opt = optax.adam(lr)
    state = opt.init(params)
    rng = np.random.default_rng(seed)
    starts_all = len(ids) - t - 1

    def loss_fn(params, batch):
        wfull = {**static, **params}
        x, y = batch[:, :-1], batch[:, 1:]
        cache = KVCache.create(CFG, x.shape[0], t, dtype=jnp.float32)
        positions = jnp.broadcast_to(jnp.arange(t)[None], x.shape).astype(jnp.int32)
        logits, _ = forward(
            wfull, fcfg, x, positions, cache,
            jnp.zeros((x.shape[0],), jnp.int32), compute_dtype=jnp.float32,
        )
        lp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(lp, y[..., None], axis=-1).mean()

    @jax.jit
    def step(params, state, batch):
        l, g = jax.value_and_grad(loss_fn)(params, batch)
        updates, state = opt.update(g, state)
        return optax.apply_updates(params, updates), state, l

    for _ in range(steps):
        s = rng.integers(0, starts_all, bs)
        batch = jnp.asarray(np.stack([ids[i : i + t + 1] for i in s]))
        params, state, l = step(params, state, batch)
    return {**static, **params}


def _to_state_dict(w):
    sd = {
        "model.embed_tokens.weight": np.asarray(w["embed"], np.float32),
        "model.norm.weight": np.asarray(w["final_norm"], np.float32),
        "lm_head.weight": np.asarray(w["lm_head"], np.float32),
    }
    for i in range(CFG.num_layers):
        for key, suffix in REV.items():
            sd[f"model.layers.{i}.{suffix}"] = np.asarray(
                w["layers"][key][i], np.float32
            )
    return sd


def test_cli_perplexity(tmp_path, capsys):
    """`cli perplexity <hf-dir> <text> --compare-isq q8_0` end to end."""
    import json

    from safetensors.numpy import save_file

    from mistralrs_tpu.cli import main

    cfg = ModelConfig(
        arch="llama", vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        max_position_embeddings=256,
    )
    sd = _state_dict(cfg)
    mdir = tmp_path / "model"
    mdir.mkdir()
    save_file(sd, str(mdir / "model.safetensors"))
    (mdir / "config.json").write_text(json.dumps({
        "architectures": ["LlamaForCausalLM"],
        "vocab_size": cfg.vocab_size, "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads, "head_dim": cfg.head_dim,
        "max_position_embeddings": cfg.max_position_embeddings,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
    }))
    from tokenizers import Tokenizer, models, pre_tokenizers

    alphabet = sorted(pre_tokenizers.ByteLevel.alphabet())
    tok = Tokenizer(models.BPE({c: i for i, c in enumerate(alphabet)}, []))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.save(str(mdir / "tokenizer.json"))

    text = tmp_path / "eval.txt"
    text.write_text("abcdefgh " * 200)
    rc = main([
        "perplexity", str(mdir), str(text), "--window", "32",
        "--dtype", "f32", "--compare-isq", "q8_0", "-q",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert lines[0]["quant"] == "base" and lines[0]["ppl"] > 0
    assert lines[1]["quant"] == "q8_0" and "delta_ppl" in lines[1]


def test_isq_delta_ppl_on_trained_model():
    sd = _state_dict(CFG)
    corpus = _corpus(4096, CFG.vocab_size)
    w0 = weights_from_state_dict(sd, CFG, dtype=jnp.float32)
    eval_ids = _corpus(1024, CFG.vocab_size, seed=9)

    ppl_untrained = compute_perplexity(
        w0, CFG, eval_ids, window=64, compute_dtype=jnp.float32
    )["ppl"]
    trained = _train(sd, corpus)
    ppl_f32 = compute_perplexity(
        trained, CFG, eval_ids, window=64, compute_dtype=jnp.float32
    )["ppl"]
    assert ppl_f32 < 0.6 * ppl_untrained, (ppl_f32, ppl_untrained)

    sd_t = _to_state_dict(trained)
    deltas = {}
    for q in (GGMLType.Q8_0, GGMLType.Q4_K):
        wq = weights_from_state_dict(sd_t, CFG, dtype=jnp.float32, isq=q)
        ppl_q = compute_perplexity(
            wq, CFG, eval_ids, window=64, compute_dtype=jnp.float32
        )["ppl"]
        deltas[q] = ppl_q - ppl_f32
    # Q8_0 is ~lossless; Q4_K noticeable but small relative to PPL
    assert abs(deltas[GGMLType.Q8_0]) < 0.02 * ppl_f32, deltas
    assert abs(deltas[GGMLType.Q4_K]) < 0.25 * ppl_f32, deltas

    # bf16 scale/bias storage (MRSTPU_SCALE_DTYPE=bf16: 25% less HBM for
    # 4-bit weights) must cost ~nothing in quality vs the f32 default
    import os

    os.environ["MRSTPU_SCALE_DTYPE"] = "bf16"
    try:
        wq16 = weights_from_state_dict(
            sd_t, CFG, dtype=jnp.float32, isq=GGMLType.Q4_K
        )
    finally:
        del os.environ["MRSTPU_SCALE_DTYPE"]
    ppl_q4_bf16s = compute_perplexity(
        wq16, CFG, eval_ids, window=64, compute_dtype=jnp.float32
    )["ppl"]
    d_scale = ppl_q4_bf16s - (ppl_f32 + deltas[GGMLType.Q4_K])
    assert abs(d_scale) < 0.02 * ppl_f32, (d_scale, deltas)
    # headline-metric shape: report the numbers for the round artifact
    print(
        f"\nPPL untrained={ppl_untrained:.3f} f32={ppl_f32:.3f} "
        f"dQ8={deltas[GGMLType.Q8_0]:+.4f} dQ4K={deltas[GGMLType.Q4_K]:+.4f} "
        f"d(bf16 scales)={d_scale:+.5f}"
    )
