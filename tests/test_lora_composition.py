"""Per-request LoRA composition: × speculative (draft model) and × arch
adapters (DeepSeek MLA, Qwen3-Next hybrid) — lifting the round-4 exclusions.
The reference composes its adapter runtime with every pipeline
(`mistralrs-core/src/adapter/selection.rs`, `speculative/driver.rs:18`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mistralrs_tpu.engine.engine import Engine
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.lora import (
    DEEPSEEK_MODULE_TO_KEY,
    QWEN3NEXT_MODULE_TO_KEY,
    attach_adapter_bank,
)
from mistralrs_tpu.models import ModelConfig
from mistralrs_tpu.models.hf_loader import weights_from_state_dict

from test_lora import CFG, _adapter, _base_sd


# ---------------------------------------------------------------------------
# per-request LoRA × draft model (speculative)
# ---------------------------------------------------------------------------


def _spec_engine(weights, draft_weights):
    return Engine(
        CFG, dict(weights), num_blocks=64, block_size=16, max_batch=4,
        backend="xla", compute_dtype=jnp.float32,
        draft=(CFG, draft_weights), gamma=3,
    )


def test_per_request_lora_with_draft_model():
    """LoRA applies to the TARGET verify path; the draft proposes from the
    base model. Greedy speculative is lossless, so outputs must equal the
    plain (non-draft) engine with the same bank — for both the adapter
    request and a no-adapter request in the same batch."""
    rng = np.random.default_rng(11)
    base_sd = _base_sd(rng)
    cfg_a, t_a = _adapter(rng)
    base = weights_from_state_dict(base_sd, CFG, dtype=jnp.float32)
    bank = attach_adapter_bank(base, [("a", cfg_a, t_a)], CFG.num_layers,
                               dtype=jnp.float32)

    def run(eng, loras):
        seqs = [
            eng.add_request([1, 5, 9, 20], SamplingParams(temperature=0.0,
                                                          max_tokens=8),
                            lora=name)
            for name in loras
        ]
        eng.run_to_completion()
        return [s.output_ids for s in seqs]

    got = run(_spec_engine(bank, base), ["a", None])

    plain = Engine(CFG, dict(bank), num_blocks=64, block_size=16, max_batch=4,
                   backend="xla", compute_dtype=jnp.float32)
    ref = run(plain, ["a", None])
    assert got[0] == ref[0]
    assert got[1] == ref[1]
    assert got[0] != got[1]  # the adapter actually changes the output


# ---------------------------------------------------------------------------
# per-request LoRA × DeepSeek MLA adapter engine
# ---------------------------------------------------------------------------


def _ds_adapter_tensors(rng, cfg, r=4, seed_scale=0.1):
    """PEFT-style tensors targeting o_proj + q_proj (+ dense-layer mlp)."""
    H = cfg.hidden_size
    nh = cfg.num_heads
    t = {}
    acfg = {"r": r, "lora_alpha": 8,
            "target_modules": ["o_proj", "q_proj", "down_proj"]}
    for i in range(cfg.num_layers):
        b = f"base_model.model.model.layers.{i}."
        t[b + "self_attn.o_proj.lora_A.weight"] = (
            rng.standard_normal((r, nh * cfg.v_head_dim)).astype(np.float32)
            * seed_scale)
        t[b + "self_attn.o_proj.lora_B.weight"] = (
            rng.standard_normal((H, r)).astype(np.float32) * seed_scale)
        t[b + "self_attn.q_proj.lora_A.weight"] = (
            rng.standard_normal((r, H)).astype(np.float32) * seed_scale)
        t[b + "self_attn.q_proj.lora_B.weight"] = (
            rng.standard_normal((nh * cfg.qk_head_dim, r)).astype(np.float32)
            * seed_scale)
        if i < cfg.first_k_dense_replace:
            t[b + "mlp.down_proj.lora_A.weight"] = (
                rng.standard_normal((r, cfg.intermediate_size)).astype(
                    np.float32) * seed_scale)
            t[b + "mlp.down_proj.lora_B.weight"] = (
                rng.standard_normal((H, r)).astype(np.float32) * seed_scale)
    return acfg, t


def _ds_run(weights, loras, draft=None):
    from mistralrs_tpu.engine.adapters import DeepseekAdapter
    from test_arch_adapters import _tiny_deepseek

    cfg, _ = _tiny_deepseek()
    adapter = DeepseekAdapter(cfg, weights, backend="xla")
    kwargs = {}
    if draft is not None:
        kwargs["draft"] = draft
        kwargs["gamma"] = 3
    eng = Engine(
        cfg, dict(weights), num_blocks=64, block_size=8, max_batch=4,
        prefill_chunk=8, compute_dtype=jnp.float32, adapter=adapter,
        **kwargs,
    )
    seqs = [
        eng.add_request([2, 7, 13, 21, 5],
                        SamplingParams(temperature=0.0, max_tokens=6),
                        lora=name)
        for name in loras
    ]
    eng.run_to_completion()
    return [s.output_ids for s in seqs]


def test_deepseek_per_request_lora():
    """Bank selection on the MLA adapter engine: each request gets exactly
    its adapter's weights (matches single-adapter engines; None matches the
    bank-free engine)."""
    from mistralrs_tpu.models.deepseek import deepseek_weights_from_state_dict
    from test_arch_adapters import _tiny_deepseek

    cfg, sd = _tiny_deepseek()
    base = deepseek_weights_from_state_dict(sd, cfg, absorbed=True)
    rng = np.random.default_rng(23)
    acfg_a, t_a = _ds_adapter_tensors(rng, cfg)
    acfg_b, t_b = _ds_adapter_tensors(rng, cfg, r=2, seed_scale=0.2)

    bank = attach_adapter_bank(
        base, [("a", acfg_a, t_a), ("b", acfg_b, t_b)], cfg.num_layers,
        dtype=jnp.float32, module_to_key=DEEPSEEK_MODULE_TO_KEY,
    )
    assert "o_lora" in bank["segments"]["dense"]
    assert "o_lora" in bank["segments"]["moe"]
    assert "down_lora" in bank["segments"]["dense"]
    assert "down_lora" not in bank["segments"]["moe"]  # expert MLPs excluded

    got = _ds_run(bank, ["a", "b", None])
    only_a = attach_adapter_bank(base, [("a", acfg_a, t_a)], cfg.num_layers,
                                 dtype=jnp.float32,
                                 module_to_key=DEEPSEEK_MODULE_TO_KEY)
    ref_a = _ds_run(only_a, ["a"])[0]
    ref_none = _ds_run(base, [None])[0]
    assert got[0] == ref_a
    assert got[2] == ref_none
    assert got[0] != ref_none  # adapter changes the output
    assert got[1] != got[0]


def test_deepseek_lora_with_speculative():
    """The full triple: per-request LoRA × MLA adapter × draft model.
    Greedy speculative stays lossless with the adapter on the verify
    path."""
    from mistralrs_tpu.models.deepseek import deepseek_weights_from_state_dict
    from test_arch_adapters import _tiny_deepseek

    cfg, sd = _tiny_deepseek()
    base = deepseek_weights_from_state_dict(sd, cfg, absorbed=True)
    rng = np.random.default_rng(29)
    acfg_a, t_a = _ds_adapter_tensors(rng, cfg)
    bank = attach_adapter_bank(base, [("a", acfg_a, t_a)], cfg.num_layers,
                               dtype=jnp.float32,
                               module_to_key=DEEPSEEK_MODULE_TO_KEY)
    # llama-family draft (cross-arch, as in test_arch_adapters)
    from mistralrs_tpu.models import init_random_weights

    dcfg = ModelConfig(
        arch="llama", vocab_size=cfg.vocab_size, hidden_size=32,
        intermediate_size=64, num_layers=1, num_heads=2, num_kv_heads=2,
        head_dim=16, max_position_embeddings=256,
    )
    draft_w = init_random_weights(dcfg, seed=21, dtype=jnp.float32)
    got = _ds_run(bank, ["a", None], draft=(dcfg, draft_w))
    ref = _ds_run(bank, ["a", None])
    assert got[0] == ref[0]
    assert got[1] == ref[1]


# ---------------------------------------------------------------------------
# per-request LoRA × Qwen3-Next hybrid adapter engine
# ---------------------------------------------------------------------------


def _q3n_adapter_tensors(rng, cfg, r=4, seed_scale=0.1):
    """PEFT tensors on the attention layers' o_proj/q_proj (GDN layers have
    no such modules — their bank slices stay zero and uninjected)."""
    H = cfg.hidden_size
    t = {}
    acfg = {"r": r, "lora_alpha": 8, "target_modules": ["o_proj", "q_proj"]}
    for i, lt in enumerate(cfg.layer_types):
        if lt != "full_attention":
            continue
        b = f"base_model.model.model.layers.{i}."
        t[b + "self_attn.o_proj.lora_A.weight"] = (
            rng.standard_normal(
                (r, cfg.num_heads * cfg.head_dim)).astype(np.float32)
            * seed_scale)
        t[b + "self_attn.o_proj.lora_B.weight"] = (
            rng.standard_normal((H, r)).astype(np.float32) * seed_scale)
        t[b + "self_attn.q_proj.lora_A.weight"] = (
            rng.standard_normal((r, H)).astype(np.float32) * seed_scale)
        t[b + "self_attn.q_proj.lora_B.weight"] = (
            rng.standard_normal(
                (cfg.num_heads * 2 * cfg.head_dim, r)).astype(np.float32)
            * seed_scale)
    return acfg, t


def test_qwen3next_per_request_lora():
    from mistralrs_tpu.engine.adapters import Qwen3NextAdapter
    from test_arch_adapters import _tiny_qwen3next

    cfg, base = _tiny_qwen3next()
    rng = np.random.default_rng(31)
    acfg_a, t_a = _q3n_adapter_tensors(rng, cfg)

    bank = attach_adapter_bank(
        base, [("a", acfg_a, t_a)], cfg.num_layers, dtype=jnp.float32,
        module_to_key=QWEN3NEXT_MODULE_TO_KEY,
    )
    # injected only on attention layers
    for li, lt in enumerate(cfg.layer_types):
        has = "wo_lora" in bank["layers"][li]
        assert has == (lt == "full_attention")

    def run(weights, loras):
        adapter = Qwen3NextAdapter(cfg, weights)
        eng = Engine(
            cfg, dict(weights), num_blocks=64, block_size=4, max_batch=4,
            prefill_chunk=8, compute_dtype=jnp.float32, adapter=adapter,
        )
        seqs = [
            eng.add_request([3, 9, 17, 4, 26],
                            SamplingParams(temperature=0.0, max_tokens=6),
                            lora=name)
            for name in loras
        ]
        eng.run_to_completion()
        return [s.output_ids for s in seqs]

    got = run(bank, ["a", None])
    ref_none = run(base, [None])[0]
    assert got[1] == ref_none
    assert got[0] != ref_none  # adapter changes the output


def test_unsupported_adapter_still_rejects_lora():
    """Adapters without bank support keep a clear error (no silent base
    fallback)."""
    from mistralrs_tpu.engine.adapters import Lfm2Adapter
    from test_arch_adapters import _tiny_lfm2

    cfg, weights = _tiny_lfm2()
    adapter = Lfm2Adapter(cfg, weights)
    w = dict(weights)
    w["lora_names"] = ("a",)
    eng = Engine(cfg, w, num_blocks=32, block_size=4, max_batch=2,
                 prefill_chunk=8, compute_dtype=jnp.float32, adapter=adapter)
    with pytest.raises(NotImplementedError):
        eng.add_request([1, 2, 3], SamplingParams(max_tokens=2), lora="a")
