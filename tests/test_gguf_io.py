"""GGUF container reader/writer roundtrip tests (offline fixtures)."""

import numpy as np

from mistralrs_tpu.gguf import GGMLType, GGUFContent, GGUFWriter


def _write_fixture(path, n_tensors=3, seed=0):
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path)
    w.add_metadata("general.architecture", "llama")
    w.add_metadata("general.name", "test-model")
    w.add_metadata("llama.block_count", 2)
    w.add_metadata("llama.embedding_length", 64)
    w.add_metadata("llama.attention.head_count", 4)
    w.add_metadata("tokenizer.ggml.tokens", ["<s>", "</s>", "a", "b"])
    w.add_metadata("tokenizer.ggml.scores", [0.0, 0.0, -1.0, -2.0])
    w.add_metadata("tokenizer.ggml.token_type", [3, 3, 1, 1])
    tensors = {}
    types = [GGMLType.F32, GGMLType.Q8_0, GGMLType.Q4_K]
    for i in range(n_tensors):
        t = types[i % len(types)]
        x = rng.normal(size=(8, 256)).astype(np.float32)
        name = f"blk.{i}.weight"
        w.add_tensor(name, x, t)
        tensors[name] = (x, t)
    w.write()
    return tensors


def test_roundtrip_metadata_and_tensors(tmp_path):
    path = tmp_path / "model.gguf"
    tensors = _write_fixture(path)
    c = GGUFContent.open(path)
    assert c.architecture == "llama"
    assert c.metadata["llama.block_count"] == 2
    assert c.metadata["tokenizer.ggml.tokens"] == ["<s>", "</s>", "a", "b"]
    assert c.metadata["tokenizer.ggml.scores"] == [0.0, 0.0, -1.0, -2.0]
    for name, (x, t) in tensors.items():
        info = c.tensor_info(name)
        assert info.shape == x.shape
        assert info.ggml_type == t
        y = c.dequantize(name)
        rel = np.sqrt(np.mean((x - y) ** 2)) / np.sqrt(np.mean(x**2))
        assert rel < (1e-7 if t == GGMLType.F32 else 0.1)
    c.close()


def test_multifile_split(tmp_path):
    t1 = _write_fixture(tmp_path / "m-00001-of-00002.gguf", n_tensors=1, seed=1)
    w = GGUFWriter(tmp_path / "m-00002-of-00002.gguf")
    w.add_metadata("split.no", 1)
    x = np.ones((4, 32), dtype=np.float32)
    w.add_tensor("extra.weight", x, GGMLType.F32)
    w.write()
    c = GGUFContent.open(tmp_path / "m-00001-of-00002.gguf")
    assert "blk.0.weight" in c
    assert "extra.weight" in c
    np.testing.assert_allclose(c.dequantize("extra.weight"), x)
    assert c.architecture == "llama"  # metadata merged, first file wins
    c.close()


def test_alignment(tmp_path):
    path = tmp_path / "model.gguf"
    _write_fixture(path)
    c = GGUFContent.open(path)
    for info in c.tensors.values():
        assert info.offset % 32 == 0
    c.close()


def test_reference_uqff_roundtrip(tmp_path):
    """Read a mistral.rs-format UQFF artifact (v1.2 layout: version scalars,
    per-layer weight.format/dtype/shape + raw GGML bytes) built here with
    the documented layout, and check the decoded weights match our own GGUF
    dequantization bit-for-bit."""
    import numpy as np
    from safetensors.numpy import save_file

    from mistralrs_tpu.gguf import dequantize, quantize
    from mistralrs_tpu.uqff import is_reference_uqff, load_reference_uqff

    rng = np.random.default_rng(0)
    n, k = 8, 512
    w = rng.standard_normal((n, k), dtype=np.float32)
    raw = quantize(w, GGMLType.Q4_K)
    bias = rng.standard_normal(n).astype(np.float32)
    wu = rng.standard_normal((4, 16), dtype=np.float32)

    tensors = {
        "uqff.version.major": np.asarray([1], np.uint32).reshape(()),
        "uqff.version.minor": np.asarray([2], np.uint32).reshape(()),
        "uqff.version.patch": np.asarray([0], np.uint32).reshape(()),
        # gguf-quantized layer
        "model.layers.0.self_attn.q_proj.weight.format": np.asarray(0, np.uint8),
        "model.layers.0.self_attn.q_proj.weight": np.frombuffer(raw.tobytes(), np.uint8),
        "model.layers.0.self_attn.q_proj.weight.dtype": np.asarray(12, np.uint32),
        "model.layers.0.self_attn.q_proj.weight.shape": np.asarray([n, k], np.uint32),
        "model.layers.0.self_attn.q_proj.bias": bias,
        # unquant layer
        "model.layers.0.mlp.gate_proj.weight.format": np.asarray(1, np.uint8),
        "model.layers.0.mlp.gate_proj.weight": wu,
        # plain passthrough tensor
        "model.norm.weight": np.ones(16, np.float32),
    }
    f = tmp_path / "model.uqff"
    save_file(tensors, str(f))

    assert is_reference_uqff(str(f))
    sd = load_reference_uqff(str(f))
    qt = sd["model.layers.0.self_attn.q_proj.weight"]
    import jax.numpy as jnp

    got = np.asarray(qt.dequantize(jnp.float32))
    ref = dequantize(raw, GGMLType.Q4_K, (n, k))
    np.testing.assert_array_equal(got, ref)
    np.testing.assert_array_equal(sd["model.layers.0.self_attn.q_proj.bias"], bias)
    np.testing.assert_array_equal(sd["model.layers.0.mlp.gate_proj.weight"], wu)
    np.testing.assert_array_equal(sd["model.norm.weight"], np.ones(16, np.float32))


def test_load_pipeline_from_uqff_overlay(tmp_path):
    """--from-uqff flow: UQFF-quantized layers override the base checkpoint
    and the model serves through the engine."""
    import json

    import jax.numpy as jnp
    import numpy as np
    from safetensors.numpy import save_file

    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.gguf import quantize
    from mistralrs_tpu.models import ModelConfig
    from mistralrs_tpu.models.llama import fuse_projections
    from mistralrs_tpu.pipeline import load_pipeline
    from mistralrs_tpu.quant.qtensor import QTensor

    cfg = ModelConfig(
        arch="llama", vocab_size=64, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64,
        max_position_embeddings=128,
    )
    rng = np.random.default_rng(0)

    def r(*s):
        return (rng.standard_normal(s) * 0.05).astype(np.float32)

    sd = {
        "model.embed_tokens.weight": r(cfg.vocab_size, cfg.hidden_size),
        "model.norm.weight": np.ones(cfg.hidden_size, np.float32),
        "lm_head.weight": r(cfg.vocab_size, cfg.hidden_size),
    }
    uq = {
        "uqff.version.major": np.asarray(1, np.uint32),
        "uqff.version.minor": np.asarray(2, np.uint32),
        "uqff.version.patch": np.asarray(0, np.uint32),
    }
    names = {
        "self_attn.q_proj": (cfg.q_dim, cfg.hidden_size),
        "self_attn.k_proj": (cfg.kv_dim, cfg.hidden_size),
        "self_attn.v_proj": (cfg.kv_dim, cfg.hidden_size),
        "self_attn.o_proj": (cfg.hidden_size, cfg.q_dim),
        "mlp.gate_proj": (cfg.intermediate_size, cfg.hidden_size),
        "mlp.up_proj": (cfg.intermediate_size, cfg.hidden_size),
        "mlp.down_proj": (cfg.hidden_size, cfg.intermediate_size),
    }
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(cfg.hidden_size, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(cfg.hidden_size, np.float32)
        for nm, shape in names.items():
            w = r(*shape)
            sd[p + nm + ".weight"] = w  # base (fp32) copy
            raw = quantize(w, GGMLType.Q4_K)
            uq[p + nm + ".weight.format"] = np.asarray(0, np.uint8)
            uq[p + nm + ".weight"] = np.frombuffer(raw.tobytes(), np.uint8)
            uq[p + nm + ".weight.dtype"] = np.asarray(12, np.uint32)
            uq[p + nm + ".weight.shape"] = np.asarray(shape, np.uint32)

    d = tmp_path / "model"
    d.mkdir()
    save_file(sd, str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps({
        "architectures": ["LlamaForCausalLM"],
        "vocab_size": cfg.vocab_size, "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads, "head_dim": cfg.head_dim,
        "max_position_embeddings": cfg.max_position_embeddings,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
    }))
    save_file(uq, str(tmp_path / "model-q4k.uqff"))

    pipe = load_pipeline(
        str(d), dtype=jnp.float32,
        from_uqff=str(tmp_path / "model-q4k.uqff"),
    )
    # quantized layers actually landed (stacked QTensor on the hot path)
    assert isinstance(pipe.weights["layers"]["wq"], QTensor)
    pipe.weights = fuse_projections(pipe.weights, pipe.cfg)
    eng = Engine(pipe.cfg, pipe.weights, num_blocks=16, block_size=16,
                 max_batch=2, backend="xla", compute_dtype=jnp.float32)
    seq = eng.add_request([1, 5, 9], SamplingParams(temperature=0.0, max_tokens=4))
    eng.run_to_completion()
    assert len(seq.output_ids) == 4


def test_reference_uqff_writer_roundtrip(tmp_path):
    """save_reference_uqff emits a mistral.rs-compatible v1.x artifact:
    our own reader decodes it, quantized weights match the direct
    quantize→dequantize result bit-for-bit, the sensitive-tensor policy
    boosts embeddings/lm_head to Q8_0, and unquantizable shapes pass
    through dense (reference container: mistralrs-quant/src/uqff/)."""
    import jax.numpy as jnp
    import numpy as np

    from mistralrs_tpu.gguf import dequantize, quantize
    from mistralrs_tpu.quant.linear import QTensor
    from mistralrs_tpu.uqff import (
        is_reference_uqff, load_reference_uqff, save_reference_uqff,
    )

    rng = np.random.default_rng(1)
    sd = {
        "model.layers.0.self_attn.q_proj.weight":
            rng.standard_normal((8, 512), dtype=np.float32),
        "model.layers.0.self_attn.q_proj.bias":
            rng.standard_normal(8).astype(np.float32),
        "model.embed_tokens.weight":
            rng.standard_normal((32, 256), dtype=np.float32),
        # last dim not divisible by 256 -> stored dense
        "model.layers.0.mlp.gate_proj.weight":
            rng.standard_normal((4, 48), dtype=np.float32),
        "model.norm.weight": np.ones(16, np.float32),
    }
    f = tmp_path / "out.uqff"
    save_reference_uqff(str(f), sd, GGMLType.Q4_K)
    assert is_reference_uqff(str(f))

    back = load_reference_uqff(str(f))
    qt = back["model.layers.0.self_attn.q_proj.weight"]
    assert isinstance(qt, QTensor) and qt.ggml_type == GGMLType.Q4_K
    ref = dequantize(quantize(sd["model.layers.0.self_attn.q_proj.weight"],
                              GGMLType.Q4_K), GGMLType.Q4_K, (8, 512))
    np.testing.assert_array_equal(np.asarray(qt.dequantize(jnp.float32)), ref)
    np.testing.assert_array_equal(
        back["model.layers.0.self_attn.q_proj.bias"],
        sd["model.layers.0.self_attn.q_proj.bias"])
    # sensitive-tensor boost: embeddings at Q8_0 when a 4-bit type is asked
    et = back["model.embed_tokens.weight"]
    assert isinstance(et, QTensor) and et.ggml_type == GGMLType.Q8_0
    # unquantizable last dim -> dense passthrough
    np.testing.assert_array_equal(back["model.layers.0.mlp.gate_proj.weight"],
                                  sd["model.layers.0.mlp.gate_proj.weight"])
    np.testing.assert_array_equal(back["model.norm.weight"],
                                  sd["model.norm.weight"])

    # per-tensor map: None keeps a layer dense with the UNQUANT serde tag
    f2 = tmp_path / "mixed.uqff"
    save_reference_uqff(
        str(f2), sd,
        {"model.layers.0.self_attn.q_proj.weight": GGMLType.Q6_K,
         "model.embed_tokens.weight": None,
         "model.layers.0.mlp.gate_proj.weight": None},
    )
    back2 = load_reference_uqff(str(f2))
    qt2 = back2["model.layers.0.self_attn.q_proj.weight"]
    assert isinstance(qt2, QTensor) and qt2.ggml_type == GGMLType.Q6_K
    np.testing.assert_array_equal(back2["model.embed_tokens.weight"],
                                  sd["model.embed_tokens.weight"])
