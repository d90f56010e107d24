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
