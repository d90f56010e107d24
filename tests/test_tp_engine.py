"""TP×DP mesh-sharded PAGED serving engine vs the single-device engine —
the composition the reference achieves with Row/ColumnParallel layers driven
by the engine loop (mistralrs-quant/src/distributed/layers.rs:58 +
mistralrs-core/src/engine/mod.rs:962). Runs real XLA collectives on the
virtual 8-CPU mesh (SURVEY.md §4 'Distributed testing without a cluster')."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mistralrs_tpu.engine.engine import Engine
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.gguf.constants import GGMLType
from mistralrs_tpu.models import ModelConfig
from mistralrs_tpu.models.hf_loader import weights_from_state_dict
from mistralrs_tpu.parallel import build_mesh

CFG = ModelConfig(
    arch="llama", vocab_size=512, hidden_size=128, intermediate_size=256,
    num_layers=2, num_heads=8, num_kv_heads=4, head_dim=16,
    max_position_embeddings=512,
)


def _tiny_state_dict(cfg: ModelConfig, seed=0):
    rng = np.random.default_rng(seed)
    H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size

    def r(*s):
        return rng.standard_normal(s, dtype=np.float32) * 0.05

    sd = {
        "model.embed_tokens.weight": r(V, H),
        "model.norm.weight": np.ones(H, np.float32),
        "lm_head.weight": r(V, H),
    }
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "self_attn.q_proj.weight"] = r(cfg.q_dim, H)
        sd[p + "self_attn.k_proj.weight"] = r(cfg.kv_dim, H)
        sd[p + "self_attn.v_proj.weight"] = r(cfg.kv_dim, H)
        sd[p + "self_attn.o_proj.weight"] = r(H, cfg.q_dim)
        sd[p + "mlp.gate_proj.weight"] = r(I, H)
        sd[p + "mlp.up_proj.weight"] = r(I, H)
        sd[p + "mlp.down_proj.weight"] = r(H, I)
    return sd


PROMPTS = [[1, 5, 9, 200, 7], [2, 4, 6, 8, 10, 12, 14], [100, 101], [50] * 21]


def _run_engine(weights, *, mesh=None, max_batch=4, num_blocks=64, seeds=False):
    eng = Engine(
        CFG, weights, num_blocks=num_blocks, block_size=16, max_batch=max_batch,
        backend="xla", compute_dtype=jnp.float32, mesh=mesh,
    )
    seqs = [
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=8))
        for p in PROMPTS
    ]
    eng.run_to_completion()
    return [s.output_ids for s in seqs], eng


def _need(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} virtual devices")


@pytest.mark.parametrize("dp,tp", [(1, 4), (2, 2), (2, 4), (4, 1)])
def test_tp_engine_matches_single_device(dp, tp):
    _need(dp * tp)
    sd = _tiny_state_dict(CFG)
    weights = weights_from_state_dict(sd, CFG, dtype=jnp.float32)
    ref, _ = _run_engine(weights)
    mesh = build_mesh(tp=tp, dp=dp)
    got, eng = _run_engine(weights, mesh=mesh)
    assert got == ref
    assert eng.dp == dp


def test_tp_engine_quantized():
    """TP + per-shard chunked row-parallel packing through the ENGINE."""
    _need(4)
    tp = 2
    sd = _tiny_state_dict(CFG, seed=3)
    wq = weights_from_state_dict(
        sd, CFG, dtype=jnp.float32, isq=GGMLType.Q8_0, row_parallel_chunks=tp
    )
    ref, _ = _run_engine(wq)
    got, _ = _run_engine(wq, mesh=build_mesh(tp=tp, dp=2))
    assert got == ref


def test_dp_groups_isolate_pools():
    """DP groups get independent block pools; preemption stays in-group."""
    _need(4)
    sd = _tiny_state_dict(CFG, seed=5)
    weights = weights_from_state_dict(sd, CFG, dtype=jnp.float32)
    mesh = build_mesh(tp=2, dp=2)
    # tiny pool so several long generations force block pressure per group
    eng = Engine(
        CFG, weights, num_blocks=6, block_size=16, max_batch=4,
        backend="xla", compute_dtype=jnp.float32, mesh=mesh,
    )
    seqs = [
        eng.add_request([7 * (i + 1)] * 5, SamplingParams(temperature=0.0, max_tokens=24))
        for i in range(4)
    ]
    eng.run_to_completion()
    for s in seqs:
        assert len(s.output_ids) == 24
    groups = {eng.kv.group_of(s.request_id) for s in seqs}
    # after completion requests are freed; group map is cleared
    ref_eng = Engine(
        CFG, weights, num_blocks=64, block_size=16, max_batch=4,
        backend="xla", compute_dtype=jnp.float32,
    )
    refs = [
        ref_eng.add_request([7 * (i + 1)] * 5, SamplingParams(temperature=0.0, max_tokens=24))
        for i in range(4)
    ]
    ref_eng.run_to_completion()
    for s, r in zip(seqs, refs):
        assert s.output_ids == r.output_ids


def test_paged_decode_kernel_under_shard_map():
    """The fused Pallas write+attend decode kernel composes with mesh
    sharding: pools sharded on kv-heads (model) + DP slot planes (data),
    interpret mode on the CPU mesh. Verifies the production TP combination
    the XLA-only tests miss."""
    _need(4)
    from jax.sharding import PartitionSpec as P

    from mistralrs_tpu.ops.paged_attention import paged_decode_attention_fused

    mesh = build_mesh(tp=2, dp=2)
    B, n_kv, group, hd, bs = 4, 4, 2, 64, 16
    L, blocks_per_group = 2, 8
    S = 2 * (blocks_per_group + 1) * bs  # dp=2 group planes incl. trash
    rng = np.random.default_rng(0)
    kp = jnp.asarray(rng.standard_normal((L, n_kv, S, hd)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((L, n_kv, S, hd)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, n_kv * group, hd)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((B, n_kv, hd)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, n_kv, hd)), jnp.float32)
    # per-group LOCAL tables/slots (2 seqs per group)
    bt = jnp.asarray(
        [[0, 1, 2], [3, 4, 5]] * 2, jnp.int32
    )  # [B, 3] local block ids
    kv_lens = jnp.asarray([33, 40, 17, 25], jnp.int32)
    slots = jnp.asarray(
        [bt[i, (kv_lens[i] - 1) // bs] * bs + (kv_lens[i] - 1) % bs for i in range(B)],
        jnp.int32,
    )

    def body(q, kp, vp, k_new, v_new, slots, bt, kv_lens):
        out, kp, vp = paged_decode_attention_fused(
            q, kp, vp, k_new, v_new, slots, bt, kv_lens,
            block_size=bs, interpret=True,
        )
        return out, kp, vp

    pool_spec = P(None, "model", "data", None)
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P("data", "model", None), pool_spec, pool_spec,
            P("data", "model", None), P("data", "model", None),
            P("data"), P("data", None), P("data"),
        ),
        out_specs=(P("data", "model", None), pool_spec, pool_spec),
        check_vma=False,
    )
    out, kp2, vp2 = jax.jit(mapped)(q, kp, vp, k_new, v_new, slots, bt, kv_lens)

    # reference: single-device kernel per group with its own pool plane
    outs = []
    half = S // 2
    kps, vps = [], []
    for g in range(2):
        rows = slice(2 * g, 2 * g + 2)
        o, kpg, vpg = paged_decode_attention_fused(
            q[rows], kp[:, :, g * half : (g + 1) * half],
            vp[:, :, g * half : (g + 1) * half],
            k_new[rows], v_new[rows], slots[rows], bt[rows], kv_lens[rows],
            block_size=bs, interpret=True,
        )
        outs.append(o)
        kps.append(kpg)
        vps.append(vpg)
    np.testing.assert_allclose(np.asarray(out), np.concatenate(outs), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kp2), np.concatenate(kps, axis=2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vp2), np.concatenate(vps, axis=2), atol=1e-6)


def test_quant_matmul_pallas_under_shard_map():
    """Row-parallel chunk-packed w4 + the Pallas matmul (interpret) inside
    shard_map — the production TP × fused-kernel combination."""
    _need(2)
    from dataclasses import replace

    from jax.sharding import NamedSharding, PartitionSpec as P

    from mistralrs_tpu.gguf.constants import GGMLType
    from mistralrs_tpu.models.llama import _local_view
    from mistralrs_tpu.ops import quant_matmul
    from mistralrs_tpu.quant import QTensor

    tp = 2
    mesh = build_mesh(tp=tp, dp=1)
    rng = np.random.default_rng(4)
    n, k = 128, 512
    w = rng.standard_normal((n, k)).astype(np.float32)
    qt = QTensor.quantize(w, GGMLType.Q4_K, chunks=tp)  # row-parallel packing
    x = jnp.asarray(rng.standard_normal((4, k)) * 0.1, jnp.bfloat16)
    ref = quant_matmul(x, qt, backend="xla", out_dtype=jnp.float32)

    # K-major planar storage — a row-parallel shard is the LEADING axis of
    # data/scale/bias; chunked packing makes each shard's slice self-contained
    wspec = QTensor(
        data=P("model", None), scale=P("model", None),
        bias=None if qt.bias is None else P("model", None),
        group_size=qt.group_size, packed=qt.packed, code_bits=qt.code_bits,
        ggml_type=qt.ggml_type, chunks=qt.chunks,
    )

    def body(x, qt_l):
        out = quant_matmul(x, _local_view(qt_l), backend="pallas",
                           interpret=True, out_dtype=jnp.float32)
        return jax.lax.psum(out, "model")

    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, "model"), wspec),
        out_specs=P(None, None),
        check_vma=False,
    )
    got = jax.jit(mapped)(x, qt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-2, atol=3e-2)


def test_tp_engine_sampled_logprobs_close():
    """Non-greedy path: identical seeds → identical tokens (same PRNG stream,
    logits replicated), logprobs match the single-device engine."""
    _need(4)
    sd = _tiny_state_dict(CFG, seed=8)
    weights = weights_from_state_dict(sd, CFG, dtype=jnp.float32)

    def run(mesh):
        eng = Engine(
            CFG, weights, num_blocks=64, block_size=16, max_batch=4,
            backend="xla", compute_dtype=jnp.float32, mesh=mesh, seed=42,
        )
        s = eng.add_request(
            [3, 1, 4, 1, 5], SamplingParams(temperature=0.8, top_k=20, max_tokens=6)
        )
        eng.run_to_completion()
        return s

    a = run(None)
    b = run(build_mesh(tp=4, dp=1))
    assert a.output_ids == b.output_ids
    np.testing.assert_allclose(a.output_logprobs, b.output_logprobs, atol=1e-4)


def test_moe_expert_parallel_engine():
    """EP-sharded Mixtral-style MoE through the paged serving engine."""
    _need(4)
    from test_tp import MOE_CFG, _moe_state_dict

    sd = _moe_state_dict(MOE_CFG)
    weights = weights_from_state_dict(sd, MOE_CFG, dtype=jnp.float32)

    def run(mesh):
        eng = Engine(
            MOE_CFG, weights, num_blocks=64, block_size=16, max_batch=4,
            backend="xla", compute_dtype=jnp.float32, mesh=mesh,
        )
        seqs = [
            eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=8))
            for p in PROMPTS
        ]
        eng.run_to_completion()
        return [s.output_ids for s in seqs]

    ref = run(None)
    got = run(build_mesh(tp=4, dp=1))  # 1 whole expert per shard
    assert got == ref


def test_tp_engine_mrope_matches_single_device():
    """mesh × M-RoPE (qwen-VL serving): the 3 position streams shard over
    data and ride into the shard_map forward; outputs must match the
    single-chip engine for mixed multimodal/text batches."""
    _need(4)
    import dataclasses

    cfg = dataclasses.replace(CFG, mrope_section=(4, 2, 2))
    sd = _tiny_state_dict(cfg, seed=11)
    weights = weights_from_state_dict(sd, cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)

    def requests(eng):
        seqs = []
        # multimodal-style: embeds + grid-style position streams
        T = 6
        embeds = rng.standard_normal((T, cfg.hidden_size)).astype(np.float32) * 0.05
        pos3 = np.stack([
            np.arange(T), np.arange(T) // 2, np.arange(T) % 3
        ]).astype(np.int32)
        seqs.append(eng.add_request(
            [7] * T, SamplingParams(temperature=0.0, max_tokens=8),
            prompt_embeds=embeds, mrope_positions=pos3,
        ))
        # plain text rows in the same batch
        seqs.append(eng.add_request(
            [1, 5, 9, 200, 7], SamplingParams(temperature=0.0, max_tokens=8)))
        seqs.append(eng.add_request(
            [2, 4, 6, 8], SamplingParams(temperature=0.0, max_tokens=8)))
        eng.run_to_completion()
        return [s.output_ids for s in seqs]

    rng = np.random.default_rng(0)
    eng0 = Engine(cfg, weights, num_blocks=64, block_size=16, max_batch=4,
                  backend="xla", compute_dtype=jnp.float32)
    ref = requests(eng0)
    rng = np.random.default_rng(0)
    eng1 = Engine(cfg, weights, num_blocks=64, block_size=16, max_batch=4,
                  backend="xla", compute_dtype=jnp.float32,
                  mesh=build_mesh(tp=2, dp=2))
    got = requests(eng1)
    assert got == ref


def test_tp_engine_deepstack_matches_single_device():
    """mesh × DeepStack (qwen3-vl): per-layer visual adds shard over data."""
    _need(4)
    sd = _tiny_state_dict(CFG, seed=13)
    weights = weights_from_state_dict(sd, CFG, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    T = 5
    ds = rng.standard_normal((T, 2, CFG.hidden_size)).astype(np.float32) * 0.1

    def run(mesh=None):
        eng = Engine(CFG, weights, num_blocks=64, block_size=16, max_batch=4,
                     backend="xla", compute_dtype=jnp.float32, mesh=mesh)
        seqs = [
            eng.add_request([9] * T, SamplingParams(temperature=0.0, max_tokens=8),
                            deepstack_embeds=ds),
            eng.add_request([1, 5, 9], SamplingParams(temperature=0.0, max_tokens=8)),
        ]
        eng.run_to_completion()
        return [s.output_ids for s in seqs]

    assert run(build_mesh(tp=2, dp=2)) == run()


def test_qwen3next_gdn_adapter_on_mesh():
    """mesh × hybrid-arch adapter: Qwen3-Next GDN serves on a tp=8 mesh
    with conv/delta state sharded on heads and EP experts — outputs match
    the single-chip adapter engine (the reference TP-shards every model,
    distributed/layers.rs:58)."""
    _need(2)
    import transformers

    from mistralrs_tpu.engine.adapters import Qwen3NextAdapter
    from mistralrs_tpu.models.qwen3next import (
        Qwen3NextConfig, qwen3next_weights_from_state_dict,
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
    import torch

    torch.manual_seed(22)
    model = transformers.Qwen3NextForCausalLM(hf_cfg).eval()
    cfg = Qwen3NextConfig.from_hf(hf_cfg.to_dict())
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    weights = qwen3next_weights_from_state_dict(sd, cfg)
    rng = np.random.default_rng(9)
    prompts = [
        [int(x) for x in rng.integers(1, cfg.vocab_size, n)]
        for n in (5, 11, 3)  # 11 > prefill_chunk → GDN state across chunks
    ]

    def run(mesh=None):
        adapter = Qwen3NextAdapter(cfg, weights)
        eng = Engine(
            cfg, weights, num_blocks=64, block_size=4, max_batch=4,
            prefill_chunk=8, compute_dtype=jnp.float32, adapter=adapter,
            mesh=mesh,
        )
        seqs = [
            eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=6))
            for p in prompts
        ]
        eng.run_to_completion()
        return [s.output_ids for s in seqs]

    ref = run()
    got = run(build_mesh(tp=2, dp=1))  # n_k_heads=2 caps tp at 2
    assert got == ref


def test_tp_engine_per_request_lora_matches_single_device():
    """Per-request LoRA selection on a dp×tp mesh: adapter banks shard with
    the base weights (column targets shard B's N axis, row targets shard
    A's K axis — the row delta rides the down/wo psum), and each request's
    one-hot mix selects its adapter under shard_map exactly as on one chip.
    Reference composition: TP layers + per-request adapters
    (mistralrs-quant/src/distributed/layers.rs:58 + adapter/selection.rs)."""
    _need(4)
    from mistralrs_tpu.lora import attach_adapter_bank

    rng = np.random.default_rng(11)
    sd = _tiny_state_dict(CFG, seed=11)
    r = 4
    cfg_a = {"r": r, "lora_alpha": 8,
             "target_modules": ["q_proj", "down_proj"]}
    t_a, t_b = {}, {}
    for i in range(CFG.num_layers):
        p = f"base_model.model.model.layers.{i}."
        for t, scale in ((t_a, 0.1), (t_b, 0.2)):
            t[p + "self_attn.q_proj.lora_A.weight"] = (
                rng.standard_normal((r, CFG.hidden_size)).astype(np.float32) * scale)
            t[p + "self_attn.q_proj.lora_B.weight"] = (
                rng.standard_normal((CFG.q_dim, r)).astype(np.float32) * scale)
            t[p + "mlp.down_proj.lora_A.weight"] = (
                rng.standard_normal((r, CFG.intermediate_size)).astype(np.float32) * scale)
            t[p + "mlp.down_proj.lora_B.weight"] = (
                rng.standard_normal((CFG.hidden_size, r)).astype(np.float32) * scale)
    base = weights_from_state_dict(sd, CFG, dtype=jnp.float32)
    bank = attach_adapter_bank(
        base, [("a", cfg_a, t_a), ("b", cfg_a, t_b)], CFG.num_layers,
        dtype=jnp.float32,
    )

    def run(mesh):
        eng = Engine(CFG, dict(bank), num_blocks=64, block_size=16,
                     max_batch=4, backend="xla", compute_dtype=jnp.float32,
                     mesh=mesh)
        seqs = [
            eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=8),
                            lora=name)
            for p, name in zip(PROMPTS, ["a", "b", None, "a"])
        ]
        eng.run_to_completion()
        return [s.output_ids for s in seqs]

    ref = run(None)
    got = run(build_mesh(tp=2, dp=2))
    assert got == ref
    # the adapters actually alter generation vs the bare model
    bare = _run_engine(weights_from_state_dict(sd, CFG, dtype=jnp.float32))[0]
    assert ref != bare


def test_tp_engine_speculative_matches_single_device():
    """Speculative decoding on a TP×DP mesh: the draft proposes (sharded
    when its dims divide tp, replicated over the model axis otherwise), the
    target verifies under shard_map, and greedy outputs are identical to the
    single-device speculative engine — the composition the reference reaches
    with its TP layers driven from the speculative pipeline
    (speculative/driver.rs over distributed/layers.rs:58)."""
    _need(4)
    from mistralrs_tpu.models import init_random_weights

    dcfg = ModelConfig(
        arch="llama", vocab_size=CFG.vocab_size, hidden_size=64,
        intermediate_size=128, num_layers=1, num_heads=2, num_kv_heads=2,
        head_dim=32, max_position_embeddings=512,
    )
    dw = init_random_weights(dcfg, seed=61, dtype=jnp.float32)
    sd = _tiny_state_dict(CFG, seed=5)
    weights = weights_from_state_dict(sd, CFG, dtype=jnp.float32)

    def run(mesh):
        eng = Engine(
            CFG, dict(weights), num_blocks=64, block_size=16, max_batch=4,
            backend="xla", compute_dtype=jnp.float32, mesh=mesh,
            draft=(dcfg, dw), gamma=3,
        )
        seqs = [
            eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=8))
            for p in PROMPTS
        ]
        eng.run_to_completion()
        return [s.output_ids for s in seqs], eng

    ref, ref_eng = run(None)
    got2, eng2 = run(build_mesh(tp=2, dp=2))  # draft dims divide tp: sharded
    assert got2 == ref
    assert not eng2._draft_replicated
    assert eng2.stats["spec_drafted"] > 0
    got4, eng4 = run(build_mesh(tp=4, dp=1))  # 2 kv heads < tp=4: replicated
    assert got4 == ref
    assert eng4._draft_replicated


def test_tp_engine_speculative_with_quantized_kv():
    """Speculative decoding composed with int8 KV on a mesh: the verify-fn
    spec pytree must mirror the packed kv_scale plane of the quantized pool
    (regression — _tp_model_specs used to build unquantized cache specs and
    shard_map failed at trace time with a pytree structure mismatch)."""
    _need(4)
    from mistralrs_tpu.models import init_random_weights

    dcfg = ModelConfig(
        arch="llama", vocab_size=CFG.vocab_size, hidden_size=64,
        intermediate_size=128, num_layers=1, num_heads=2, num_kv_heads=2,
        head_dim=32, max_position_embeddings=512,
    )
    dw = init_random_weights(dcfg, seed=61, dtype=jnp.float32)
    sd = _tiny_state_dict(CFG, seed=5)
    weights = weights_from_state_dict(sd, CFG, dtype=jnp.float32)

    def run(mesh):
        eng = Engine(
            CFG, dict(weights), num_blocks=64, block_size=16, max_batch=4,
            backend="xla", compute_dtype=jnp.float32, mesh=mesh,
            draft=(dcfg, dw), gamma=3, kv_quant="int8",
        )
        seqs = [
            eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=8))
            for p in PROMPTS
        ]
        eng.run_to_completion()
        return [s.output_ids for s in seqs], eng

    ref, ref_eng = run(None)
    assert ref_eng.stats["spec_drafted"] > 0
    got, eng = run(build_mesh(tp=2, dp=2))
    assert got == ref


def test_qwen3next_engine_dp_mesh_matches_single_device():
    """GDN hybrid on a dp=2 × tp=2 mesh: slot pools group-partitioned over
    the data axis (per-group trash, body-local slot rebase) — the round-4
    'GDN adapter mesh dp=1 only' exclusion, lifted."""
    _need(4)
    from mistralrs_tpu.engine.adapters import Qwen3NextAdapter
    from test_arch_adapters import _tiny_qwen3next

    cfg, weights = _tiny_qwen3next()
    rng = np.random.default_rng(17)
    prompts = [
        [int(x) for x in rng.integers(1, cfg.vocab_size, n)]
        for n in (5, 11, 3, 7)
    ]

    def run(mesh):
        adapter = Qwen3NextAdapter(cfg, weights)
        eng = Engine(
            cfg, dict(weights), num_blocks=32, block_size=4, max_batch=4,
            prefill_chunk=8, compute_dtype=jnp.float32, adapter=adapter,
            mesh=mesh,
        )
        seqs = [
            eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=6))
            for p in prompts
        ]
        eng.run_to_completion()
        return [s.output_ids for s in seqs]

    ref = run(None)
    got = run(build_mesh(tp=2, dp=2))
    assert got == ref


def test_qwen3next_speculative_on_mesh():
    """Speculative decoding with a GDN-hybrid target on a tp=2 mesh: the
    capture-mode verify + state commit run TP-sharded (round-4 'qwen3next
    speculative on a mesh' exclusion, lifted). Greedy → exact."""
    _need(2)
    from mistralrs_tpu.engine.adapters import Qwen3NextAdapter
    from mistralrs_tpu.models import init_random_weights
    from test_arch_adapters import _tiny_qwen3next

    cfg, weights = _tiny_qwen3next()
    dcfg = ModelConfig(
        arch="llama", vocab_size=cfg.vocab_size, hidden_size=32,
        intermediate_size=64, num_layers=1, num_heads=2, num_kv_heads=2,
        head_dim=16, max_position_embeddings=256,
    )
    dw = init_random_weights(dcfg, seed=33, dtype=jnp.float32)
    rng = np.random.default_rng(19)
    prompts = [
        [int(x) for x in rng.integers(1, cfg.vocab_size, n)] for n in (5, 9)
    ]

    def run(mesh, draft):
        adapter = Qwen3NextAdapter(cfg, weights)
        kwargs = dict(draft=draft, gamma=3) if draft is not None else {}
        eng = Engine(
            cfg, dict(weights), num_blocks=64, block_size=4, max_batch=4,
            prefill_chunk=8, compute_dtype=jnp.float32, adapter=adapter,
            mesh=mesh, **kwargs,
        )
        seqs = [
            eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=8))
            for p in prompts
        ]
        eng.run_to_completion()
        return [s.output_ids for s in seqs]

    ref = run(None, None)
    got_spec_mesh = run(build_mesh(tp=2, dp=1), (dcfg, dw))
    assert got_spec_mesh == ref


def test_qwen3next_speculative_on_dp_mesh():
    """The full triple: GDN target × speculative × dp=2 mesh — dp-sharded
    verify logits gather globally before the sampler transform; the commit
    rebases slots per group."""
    _need(4)
    from mistralrs_tpu.engine.adapters import Qwen3NextAdapter
    from mistralrs_tpu.models import init_random_weights
    from test_arch_adapters import _tiny_qwen3next

    cfg, weights = _tiny_qwen3next()
    dcfg = ModelConfig(
        arch="llama", vocab_size=cfg.vocab_size, hidden_size=32,
        intermediate_size=64, num_layers=1, num_heads=2, num_kv_heads=2,
        head_dim=16, max_position_embeddings=256,
    )
    dw = init_random_weights(dcfg, seed=33, dtype=jnp.float32)
    rng = np.random.default_rng(19)
    prompts = [
        [int(x) for x in rng.integers(1, cfg.vocab_size, n)]
        for n in (5, 9, 4)
    ]

    def run(mesh, draft):
        adapter = Qwen3NextAdapter(cfg, weights)
        kwargs = dict(draft=draft, gamma=3) if draft is not None else {}
        eng = Engine(
            cfg, dict(weights), num_blocks=32, block_size=4, max_batch=4,
            prefill_chunk=8, compute_dtype=jnp.float32, adapter=adapter,
            mesh=mesh, **kwargs,
        )
        seqs = [
            eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=8))
            for p in prompts
        ]
        eng.run_to_completion()
        return [s.output_ids for s in seqs]

    ref = run(None, None)
    got = run(build_mesh(tp=2, dp=2), (dcfg, dw))
    assert got == ref
