"""Gemma 3n: AltUp/Laurel/per-layer-input decoder with KV-shared layers —
greedy parity vs HF through the paged engine (arch adapter)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from mistralrs_tpu.models.gemma3n import (
    Gemma3nConfig,
    gemma3n_weights_from_state_dict,
)


def _tiny(num_kv_shared_layers=2, vocab_pl=160):
    from transformers.models.gemma3n.configuration_gemma3n import (
        Gemma3nTextConfig,
    )
    from transformers.models.gemma3n.modeling_gemma3n import Gemma3nForCausalLM

    # NOTE: bare Gemma3nForCausalLM crashes on generated ids ≥ the per-layer
    # vocab (the multimodal wrapper masks them upstream), so parity tests
    # must keep generated ids in range or use the full vocab per layer
    hf_cfg = Gemma3nTextConfig(
        vocab_size=160, vocab_size_per_layer_input=vocab_pl, hidden_size=48,
        hidden_size_per_layer_input=16, intermediate_size=[96, 96, 96, 96],
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, altup_num_inputs=3, laurel_rank=8,
        num_kv_shared_layers=num_kv_shared_layers, sliding_window=8,
        layer_types=["sliding_attention", "full_attention"] * 2,
        activation_sparsity_pattern=[0.95, 0.95, 0.0, 0.0],
        max_position_embeddings=128, pad_token_id=0,
    )
    torch.manual_seed(290)
    model = Gemma3nForCausalLM(hf_cfg).eval()
    cfg = Gemma3nConfig.from_hf(hf_cfg.to_dict())
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    return hf_cfg, model, cfg, gemma3n_weights_from_state_dict(sd, cfg)


def test_gemma3n_kv_plan():
    _, _, cfg, _ = _tiny()
    planes, writes = cfg.kv_plan()
    # layers: [sliding, full, sliding, full]; last 2 shared →
    # layer 2 (sliding) reads layer 0's plane, layer 3 (full) layer 1's
    assert planes == [0, 1, 0, 1]
    assert writes == [True, True, False, False]
    assert cfg.num_kv_planes == 2


def test_gemma3n_through_engine():
    """Greedy parity vs HF generate, prompt long enough to slide the
    window past the KV-shared boundary."""
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.pipeline import make_adapter

    hf_cfg, model, cfg, weights = _tiny(vocab_pl=128)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 120, size=14).tolist()
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor([ids]), max_new_tokens=8, do_sample=False,
        )[0, len(ids):].tolist()

    adapter = make_adapter(cfg, weights, compute_dtype=jnp.float32)
    eng = Engine(
        cfg, weights, adapter=adapter, num_blocks=32, block_size=16,
        max_batch=2, backend="xla", compute_dtype=jnp.float32,
    )
    seq = eng.add_request(ids, SamplingParams(temperature=0.0, max_tokens=8))
    eng.run_to_completion()
    assert seq.output_ids == hf_out


def test_gemma3n_matformer_slice():
    """Elastic slicing: identity slice preserves outputs; a real slice
    (dropped layer + reduced per-layer FFN dims) serves correctly."""
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.matformer import MatformerSlice
    from mistralrs_tpu.models.gemma3n import apply_matformer
    from mistralrs_tpu.pipeline import make_adapter

    hf_cfg, model, cfg, weights = _tiny(num_kv_shared_layers=0, vocab_pl=160)
    rng = np.random.default_rng(3)
    ids = rng.integers(1, 120, size=9).tolist()

    def run(c, w, n=5):
        adapter = make_adapter(c, w, compute_dtype=jnp.float32)
        eng = Engine(c, w, adapter=adapter, num_blocks=32, block_size=16,
                     max_batch=2, backend="xla", compute_dtype=jnp.float32)
        seq = eng.add_request(ids, SamplingParams(temperature=0.0, max_tokens=n))
        eng.run_to_completion()
        return seq.output_ids

    base = run(cfg, weights)
    ident_cfg, ident_w = apply_matformer(
        cfg, weights, MatformerSlice(name="full", ffn_hidden_dims=[96] * 4)
    )
    assert run(ident_cfg, ident_w) == base

    sub_cfg, sub_w = apply_matformer(
        cfg, weights,
        MatformerSlice(name="sub", ffn_hidden_dims=[48, 96, 64],
                       layers_skipped=(2,)),
    )
    assert sub_cfg.num_layers == 3
    assert sub_cfg.intermediate_sizes == (48, 96, 64)
    assert sub_cfg.layer_types == ("sliding_attention", "full_attention",
                                   "full_attention")
    out = run(sub_cfg, sub_w)
    assert len(out) == 5


def test_gemma3n_no_sharing_parity():
    """num_kv_shared_layers=0 path (every layer stores KV)."""
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.pipeline import make_adapter

    hf_cfg, model, cfg, weights = _tiny(num_kv_shared_layers=0, vocab_pl=160)
    assert cfg.num_kv_planes == 4
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 120, size=7).tolist()
    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor([ids]), max_new_tokens=6, do_sample=False,
        )[0, len(ids):].tolist()
    adapter = make_adapter(cfg, weights, compute_dtype=jnp.float32)
    eng = Engine(
        cfg, weights, adapter=adapter, num_blocks=32, block_size=16,
        max_batch=2, backend="xla", compute_dtype=jnp.float32,
    )
    seq = eng.add_request(ids, SamplingParams(temperature=0.0, max_tokens=6))
    eng.run_to_completion()
    assert seq.output_ids == hf_out
