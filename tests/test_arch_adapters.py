"""Engine-served specialized archs (arch adapters) vs their standalone
forwards — the analog of the reference serving DeepSeek/Qwen3-Next/LFM2
through the Pipeline trait + hybrid cache
(`mistralrs-core/src/pipeline/`, `kv_cache/hybrid_cache.rs`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mistralrs_tpu.engine.engine import Engine
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.models.deepseek import (
    DeepseekConfig,
    deepseek_forward,
    deepseek_weights_from_state_dict,
    make_cache,
)


def _tiny_deepseek():
    cfg = DeepseekConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=32, num_layers=3, num_heads=4,
        q_lora_rank=None, kv_lora_rank=16, qk_rope_head_dim=8,
        qk_nope_head_dim=16, v_head_dim=16, n_routed_experts=4,
        num_experts_per_tok=2, n_shared_experts=1, first_k_dense_replace=1,
        routed_scaling_factor=1.5, scoring_func="sigmoid",
        max_position_embeddings=128,
    )
    rng = np.random.default_rng(0)

    def r(*s):
        return (rng.standard_normal(s) * 0.2).astype(np.float32)

    H, V = cfg.hidden_size, cfg.vocab_size
    nh = cfg.num_heads
    sd = {
        "model.embed_tokens.weight": r(V, H),
        "model.norm.weight": np.ones(H, np.float32),
        "lm_head.weight": r(V, H),
    }
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "self_attn.q_proj.weight"] = r(nh * cfg.qk_head_dim, H)
        sd[p + "self_attn.kv_a_proj_with_mqa.weight"] = r(
            cfg.kv_lora_rank + cfg.qk_rope_head_dim, H
        )
        sd[p + "self_attn.kv_a_layernorm.weight"] = np.ones(
            cfg.kv_lora_rank, np.float32
        )
        sd[p + "self_attn.kv_b_proj.weight"] = r(
            nh * (cfg.qk_nope_head_dim + cfg.v_head_dim), cfg.kv_lora_rank
        )
        sd[p + "self_attn.o_proj.weight"] = r(H, nh * cfg.v_head_dim)
        if i >= cfg.first_k_dense_replace:
            sd[p + "mlp.gate.weight"] = r(cfg.n_routed_experts, H)
            for e in range(cfg.n_routed_experts):
                ep = p + f"mlp.experts.{e}."
                sd[ep + "gate_proj.weight"] = r(cfg.moe_intermediate_size, H)
                sd[ep + "up_proj.weight"] = r(cfg.moe_intermediate_size, H)
                sd[ep + "down_proj.weight"] = r(H, cfg.moe_intermediate_size)
            sp = p + "mlp.shared_experts."
            sd[sp + "gate_proj.weight"] = r(cfg.moe_intermediate_size, H)
            sd[sp + "up_proj.weight"] = r(cfg.moe_intermediate_size, H)
            sd[sp + "down_proj.weight"] = r(H, cfg.moe_intermediate_size)
        else:
            sd[p + "mlp.gate_proj.weight"] = r(cfg.intermediate_size, H)
            sd[p + "mlp.up_proj.weight"] = r(cfg.intermediate_size, H)
            sd[p + "mlp.down_proj.weight"] = r(H, cfg.intermediate_size)
    return cfg, sd


def _ref_greedy(cfg, weights, prompt, n):
    """Greedy tokens via the standalone absorbed-MLA forward."""
    ids = list(prompt)
    out = []
    cache = make_cache(cfg, 1, len(prompt) + n + 1, absorbed=True)
    start = 0
    for _ in range(n):
        chunk = jnp.asarray([ids[start:]], jnp.int32)
        pos = jnp.arange(start, len(ids))[None].astype(jnp.int32)
        logits, cache = deepseek_forward(
            weights, cfg, chunk, pos, cache,
            jnp.asarray([start], jnp.int32), backend="xla",
            logits_last_only=True, absorbed=True,
        )
        tok = int(jnp.argmax(logits[0, -1]))
        out.append(tok)
        start = len(ids)
        ids.append(tok)
    return out


def test_deepseek_engine_parity():
    from mistralrs_tpu.engine.adapters import DeepseekAdapter

    cfg, sd = _tiny_deepseek()
    weights = deepseek_weights_from_state_dict(sd, cfg, absorbed=True)
    adapter = DeepseekAdapter(cfg, weights, backend="xla")
    eng = Engine(
        cfg, weights, num_blocks=64, block_size=8, max_batch=4,
        prefill_chunk=8, compute_dtype=jnp.float32, adapter=adapter,
    )
    rng = np.random.default_rng(3)
    prompts = [
        [int(x) for x in rng.integers(1, cfg.vocab_size, n)]
        for n in (5, 11, 19)  # 19 > prefill_chunk → chunked prefill
    ]
    seqs = [
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=6))
        for p in prompts
    ]
    eng.run_to_completion()
    for p, s in zip(prompts, seqs):
        assert s.output_ids == _ref_greedy(cfg, weights, p, 6), (
            p, s.output_ids
        )


def test_deepseek_engine_preemption():
    """Block pressure: preempted MLA sequences recompute correctly."""
    from mistralrs_tpu.engine.adapters import DeepseekAdapter

    cfg, sd = _tiny_deepseek()
    weights = deepseek_weights_from_state_dict(sd, cfg, absorbed=True)
    adapter = DeepseekAdapter(cfg, weights, backend="xla")
    eng = Engine(
        cfg, weights, num_blocks=7, block_size=8, max_batch=4,
        prefill_chunk=16, compute_dtype=jnp.float32, adapter=adapter,
    )
    rng = np.random.default_rng(5)
    prompts = [
        [int(x) for x in rng.integers(1, cfg.vocab_size, 10)] for _ in range(3)
    ]
    seqs = [
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=12))
        for p in prompts
    ]
    fin = eng.run_to_completion()
    assert len(fin) == 3
    for p, s in zip(prompts, seqs):
        # generated_ids, not output_ids: preemption-recompute folds generated
        # tokens into prompt_ids
        assert s.generated_ids == _ref_greedy(cfg, weights, p, 12)
    assert eng.stats["preemptions"] > 0


# ---------------------------------------------------------------------------
# Qwen3-Next hybrid (GDN + full attention) via the engine
# ---------------------------------------------------------------------------


def _tiny_qwen3next():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from mistralrs_tpu.models.qwen3next import (
        Qwen3NextConfig,
        qwen3next_weights_from_state_dict,
    )

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
    torch.manual_seed(7)
    model = transformers.Qwen3NextForCausalLM(hf_cfg).eval()
    cfg = Qwen3NextConfig.from_hf(hf_cfg.to_dict())
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    return cfg, qwen3next_weights_from_state_dict(sd, cfg)


def test_qwen3next_engine_parity():
    """Engine-served hybrid (chunked prefill + per-slot GDN state) matches
    the standalone forward, including a prompt longer than prefill_chunk."""
    from mistralrs_tpu.engine.adapters import Qwen3NextAdapter
    from mistralrs_tpu.models.qwen3next import qwen3next_greedy_generate

    cfg, weights = _tiny_qwen3next()
    adapter = Qwen3NextAdapter(cfg, weights)
    eng = Engine(
        cfg, weights, num_blocks=64, block_size=4, max_batch=4,
        prefill_chunk=8, compute_dtype=jnp.float32, adapter=adapter,
    )
    rng = np.random.default_rng(9)
    prompts = [
        [int(x) for x in rng.integers(1, cfg.vocab_size, n)]
        for n in (5, 11)  # 11 > prefill_chunk → GDN state across chunks
    ]
    seqs = [
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=6))
        for p in prompts
    ]
    eng.run_to_completion()
    for p, s in zip(prompts, seqs):
        ref = qwen3next_greedy_generate(weights, cfg, p, 6)
        assert s.generated_ids[: len(ref)] == ref, (p, s.generated_ids, ref)


def test_qwen3next_engine_preemption():
    """Recompute-preemption replays the recurrent state correctly (reset=1
    zeroes the slot's conv/rec pools before the re-prefill)."""
    from mistralrs_tpu.engine.adapters import Qwen3NextAdapter
    from mistralrs_tpu.models.qwen3next import qwen3next_greedy_generate

    cfg, weights = _tiny_qwen3next()
    adapter = Qwen3NextAdapter(cfg, weights)
    eng = Engine(
        cfg, weights, num_blocks=9, block_size=4, max_batch=4,
        prefill_chunk=16, compute_dtype=jnp.float32, adapter=adapter,
    )
    rng = np.random.default_rng(13)
    prompts = [
        [int(x) for x in rng.integers(1, cfg.vocab_size, 8)] for _ in range(3)
    ]
    seqs = [
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=10))
        for p in prompts
    ]
    fin = eng.run_to_completion()
    assert len(fin) == 3
    for p, s in zip(prompts, seqs):
        ref = qwen3next_greedy_generate(weights, cfg, p, 10)
        assert s.generated_ids[: len(ref)] == ref, (p, s.generated_ids, ref)
    assert eng.stats["preemptions"] > 0


# ---------------------------------------------------------------------------
# LFM2 hybrid (short conv + full attention) via the engine
# ---------------------------------------------------------------------------


def _tiny_lfm2():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from mistralrs_tpu.models.lfm2 import (
        Lfm2Config,
        lfm2_weights_from_state_dict,
    )

    hf_cfg = transformers.Lfm2Config(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        layer_types=["conv", "full_attention", "conv", "full_attention"],
        conv_L_cache=3, max_position_embeddings=64,
        block_auto_adjust_ff_dim=False, pad_token_id=0,
    )
    torch.manual_seed(20)
    model = transformers.Lfm2ForCausalLM(hf_cfg).eval()
    cfg = Lfm2Config.from_hf(hf_cfg.to_dict())
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    return cfg, lfm2_weights_from_state_dict(sd, cfg)


def test_lfm2_engine_parity():
    """Engine-served LFM2 (chunked prefill crossing conv state) matches the
    standalone hybrid forward."""
    from mistralrs_tpu.engine.adapters import Lfm2Adapter
    from mistralrs_tpu.models.lfm2 import lfm2_greedy_generate

    cfg, weights = _tiny_lfm2()
    adapter = Lfm2Adapter(cfg, weights)
    eng = Engine(
        cfg, weights, num_blocks=64, block_size=4, max_batch=4,
        prefill_chunk=8, compute_dtype=jnp.float32, adapter=adapter,
    )
    rng = np.random.default_rng(17)
    prompts = [
        [int(x) for x in rng.integers(1, cfg.vocab_size, n)]
        for n in (4, 13)  # 13 > prefill_chunk → conv state across chunks
    ]
    seqs = [
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=6))
        for p in prompts
    ]
    eng.run_to_completion()
    for p, s in zip(prompts, seqs):
        ref = lfm2_greedy_generate(weights, cfg, p, 6)
        assert s.generated_ids[: len(ref)] == ref, (p, s.generated_ids, ref)


def test_lfm2_engine_preemption():
    from mistralrs_tpu.engine.adapters import Lfm2Adapter
    from mistralrs_tpu.models.lfm2 import lfm2_greedy_generate

    cfg, weights = _tiny_lfm2()
    adapter = Lfm2Adapter(cfg, weights)
    eng = Engine(
        cfg, weights, num_blocks=9, block_size=4, max_batch=4,
        prefill_chunk=16, compute_dtype=jnp.float32, adapter=adapter,
    )
    rng = np.random.default_rng(19)
    prompts = [
        [int(x) for x in rng.integers(1, cfg.vocab_size, 8)] for _ in range(3)
    ]
    seqs = [
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=10))
        for p in prompts
    ]
    fin = eng.run_to_completion()
    assert len(fin) == 3
    for p, s in zip(prompts, seqs):
        ref = lfm2_greedy_generate(weights, cfg, p, 10)
        assert s.generated_ids[: len(ref)] == ref, (p, s.generated_ids, ref)
    assert eng.stats["preemptions"] > 0


def test_load_pipeline_specialized_arch(tmp_path):
    """`load_pipeline` auto-detects specialized archs from config.json and
    `make_adapter` serves them through the engine (the analog of the
    reference's AutoLoader arch dispatch, pipeline/auto.rs)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from safetensors.numpy import save_file

    from mistralrs_tpu.pipeline import load_pipeline, make_adapter
    from mistralrs_tpu.models.lfm2 import lfm2_greedy_generate

    hf_cfg = transformers.Lfm2Config(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        layer_types=["conv", "full_attention"],
        conv_L_cache=3, max_position_embeddings=64,
        block_auto_adjust_ff_dim=False, pad_token_id=0,
    )
    torch.manual_seed(23)
    model = transformers.Lfm2ForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    d = tmp_path / "lfm2-tiny"
    d.mkdir()
    save_file(sd, str(d / "model.safetensors"))
    (d / "config.json").write_text(
        __import__("json").dumps({**hf_cfg.to_dict(), "model_type": "lfm2"})
    )

    pipe = load_pipeline(str(d))
    adapter = make_adapter(pipe.cfg, pipe.weights)
    assert adapter is not None
    eng = Engine(
        pipe.cfg, pipe.weights, num_blocks=32, block_size=4, max_batch=2,
        prefill_chunk=8, compute_dtype=jnp.float32, adapter=adapter,
    )
    prompt = [3, 17, 40, 9, 22]
    seq = eng.add_request(prompt, SamplingParams(temperature=0.0, max_tokens=5))
    eng.run_to_completion()
    ref = lfm2_greedy_generate(pipe.weights, pipe.cfg, prompt, 5)
    assert seq.generated_ids[: len(ref)] == ref


def test_deepseek_engine_kv_quant_int8():
    """int8 latent pool (per-slot scales) through the engine: greedy output
    must match the unquantized engine for a short horizon (the MLA analog
    of fp8 paged KV, cache_engine.rs:13 — round-3 adapter exclusion lift)."""
    from mistralrs_tpu.engine.adapters import DeepseekAdapter

    cfg, sd = _tiny_deepseek()
    weights = deepseek_weights_from_state_dict(sd, cfg, absorbed=True)
    rng = np.random.default_rng(11)
    prompts = [
        [int(x) for x in rng.integers(1, cfg.vocab_size, n)] for n in (6, 13)
    ]

    def run(kv_quant):
        adapter = DeepseekAdapter(cfg, weights, backend="xla")
        eng = Engine(
            cfg, weights, num_blocks=64, block_size=8, max_batch=4,
            prefill_chunk=8, compute_dtype=jnp.float32, adapter=adapter,
            kv_quant=kv_quant,
        )
        seqs = [
            eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=5))
            for p in prompts
        ]
        eng.run_to_completion()
        return [s.output_ids for s in seqs]

    got = run("int8")
    ref = run(None)
    assert all(len(o) == 5 for o in got)
    assert got == ref, (got, ref)


def test_deepseek_engine_speculative():
    """Speculative decoding with an MLA-adapter target + llama draft:
    greedy-exact vs the plain adapter engine (reference pairs speculative
    with ANY pipeline, speculative/driver.rs:18)."""
    from mistralrs_tpu.engine.adapters import DeepseekAdapter
    from mistralrs_tpu.models import ModelConfig, init_random_weights

    cfg, sd = _tiny_deepseek()
    weights = deepseek_weights_from_state_dict(sd, cfg, absorbed=True)
    dcfg = ModelConfig(
        arch="llama", vocab_size=cfg.vocab_size, hidden_size=32,
        intermediate_size=64, num_layers=1, num_heads=2, num_kv_heads=2,
        head_dim=16, max_position_embeddings=256,
    )
    dw = init_random_weights(dcfg, seed=21, dtype=jnp.float32)
    rng = np.random.default_rng(13)
    prompts = [
        [int(x) for x in rng.integers(1, cfg.vocab_size, n)] for n in (5, 9)
    ]

    def run(draft):
        adapter = DeepseekAdapter(cfg, weights, backend="xla")
        eng = Engine(
            cfg, weights, num_blocks=96, block_size=8, max_batch=4,
            prefill_chunk=8, compute_dtype=jnp.float32, adapter=adapter,
            draft=draft, gamma=3,
        )
        seqs = [
            eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=10))
            for p in prompts
        ]
        eng.run_to_completion()
        return [s.output_ids for s in seqs]

    spec = run((dcfg, dw))
    plain = run(None)
    assert all(len(o) == 10 for o in spec)
    assert spec == plain, (spec, plain)


def test_deepseek_engine_speculative_with_kv_quant():
    """The full round-3 exclusion matrix at once: MLA adapter + int8 latent
    pool + speculative draft."""
    from mistralrs_tpu.engine.adapters import DeepseekAdapter
    from mistralrs_tpu.models import ModelConfig, init_random_weights

    cfg, sd = _tiny_deepseek()
    weights = deepseek_weights_from_state_dict(sd, cfg, absorbed=True)
    dcfg = ModelConfig(
        arch="llama", vocab_size=cfg.vocab_size, hidden_size=32,
        intermediate_size=64, num_layers=1, num_heads=2, num_kv_heads=2,
        head_dim=16, max_position_embeddings=256,
    )
    dw = init_random_weights(dcfg, seed=22, dtype=jnp.float32)
    prompt = [3, 9, 27, 50, 11, 8]

    def run(draft):
        adapter = DeepseekAdapter(cfg, weights, backend="xla")
        eng = Engine(
            cfg, weights, num_blocks=96, block_size=8, max_batch=2,
            prefill_chunk=8, compute_dtype=jnp.float32, adapter=adapter,
            draft=draft, gamma=3, kv_quant="int8",
        )
        seq = eng.add_request(
            prompt, SamplingParams(temperature=0.0, max_tokens=8))
        eng.run_to_completion()
        return seq.output_ids

    spec = run((dcfg, dw))
    plain = run(None)
    assert len(spec) == 8 and spec == plain, (spec, plain)


def test_qwen3next_engine_speculative():
    """Speculative with the hybrid GDN target: the verify forward captures
    per-prefix conv/recurrent states and the engine commits exactly the
    accepted length — greedy output must match the plain adapter engine
    (recurrent rollback, the analog of speculative/cache.rs)."""
    from mistralrs_tpu.engine.adapters import Qwen3NextAdapter
    from mistralrs_tpu.models import ModelConfig, init_random_weights

    cfg, weights = _tiny_qwen3next()
    dcfg = ModelConfig(
        arch="llama", vocab_size=cfg.vocab_size, hidden_size=32,
        intermediate_size=64, num_layers=1, num_heads=2, num_kv_heads=2,
        head_dim=16, max_position_embeddings=256,
    )
    dw = init_random_weights(dcfg, seed=23, dtype=jnp.float32)
    rng = np.random.default_rng(17)
    prompts = [
        [int(x) for x in rng.integers(1, cfg.vocab_size, n)] for n in (5, 11)
    ]

    def run(draft):
        adapter = Qwen3NextAdapter(cfg, weights)
        eng = Engine(
            cfg, weights, num_blocks=96, block_size=4, max_batch=4,
            prefill_chunk=8, compute_dtype=jnp.float32, adapter=adapter,
            draft=draft, gamma=3,
        )
        seqs = [
            eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=10))
            for p in prompts
        ]
        eng.run_to_completion()
        return [s.output_ids for s in seqs]

    spec = run((dcfg, dw))
    plain = run(None)
    assert all(len(o) == 10 for o in spec)
    assert spec == plain, (spec, plain)


def test_qwen3next_engine_kv_quant_int8():
    """int8 attention-KV pools (per-slot,head scales) on the hybrid adapter;
    GDN state stays full-precision. Greedy must match the unquantized
    engine for a short horizon."""
    from mistralrs_tpu.engine.adapters import Qwen3NextAdapter

    cfg, weights = _tiny_qwen3next()
    rng = np.random.default_rng(19)
    prompts = [
        [int(x) for x in rng.integers(1, cfg.vocab_size, n)] for n in (5, 11)
    ]

    def run(kv_quant):
        adapter = Qwen3NextAdapter(cfg, weights)
        eng = Engine(
            cfg, weights, num_blocks=64, block_size=4, max_batch=4,
            prefill_chunk=8, compute_dtype=jnp.float32, adapter=adapter,
            kv_quant=kv_quant,
        )
        seqs = [
            eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=5))
            for p in prompts
        ]
        eng.run_to_completion()
        return [s.output_ids for s in seqs]

    got = run("int8")
    ref = run(None)
    assert all(len(o) == 5 for o in got)
    assert got == ref, (got, ref)
