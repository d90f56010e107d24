"""Planar decomposition + fused dequant-matmul correctness.

Validates the whole quantized compute chain against the bit-exact numpy
dequant reference (`gguf/quants.py`):
  GGUF bytes -> PlanarQuant -> QTensor -> dequantize / quant_matmul
mirroring the reference's CPU-reference-in-test kernel strategy
(`mistralrs-quant/tests/cutlass_moe_tests.rs:23-50`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mistralrs_tpu.gguf import GGMLType, dequantize, quantize, row_byte_size
from mistralrs_tpu.gguf.planar import PLANAR_TYPES, to_planar
from mistralrs_tpu.ops import quant_matmul
from mistralrs_tpu.quant import QTensor

ALL_TYPES = sorted(PLANAR_TYPES, key=lambda t: t.value)


def _random_raw(t: GGMLType, n: int, k: int, seed: int = 0) -> np.ndarray:
    """Random raw GGUF bytes for an [n, k] tensor (round-trip via quantize)."""
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((n, k), dtype=np.float32)
    try:
        return quantize(w, t)
    except NotImplementedError:
        # formats we can read but not write: synthesize raw bytes directly
        raw = rng.integers(0, 256, size=row_byte_size(t, n * k), dtype=np.uint8)
        return raw


@pytest.mark.parametrize("t", ALL_TYPES, ids=lambda t: t.name)
def test_planar_matches_dequant(t):
    n, k = 4, 512
    raw = _random_raw(t, n, k)
    ref = dequantize(raw, t, (n, k))
    planar = to_planar(raw, t)
    np.testing.assert_array_equal(planar.dequantize().reshape(n, k), ref)


@pytest.mark.parametrize("t", ALL_TYPES, ids=lambda t: t.name)
def test_qtensor_dequant_exact(t):
    n, k = 4, 512
    raw = _random_raw(t, n, k)
    ref = dequantize(raw, t, (n, k))
    qt = QTensor.from_gguf_raw(raw, t, (n, k))
    got = np.asarray(qt.dequantize(jnp.float32))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("t", [GGMLType.Q4_K, GGMLType.Q8_0, GGMLType.Q6_K, GGMLType.Q4_0])
def test_xla_matmul_matches_numpy(t):
    n, k, m = 8, 512, 3
    raw = _random_raw(t, n, k)
    w = dequantize(raw, t, (n, k))
    rng = np.random.default_rng(1)
    x = rng.standard_normal((m, k), dtype=np.float32)
    qt = QTensor.from_gguf_raw(raw, t, (n, k))
    got = np.asarray(
        quant_matmul(jnp.asarray(x), qt, backend="xla", dequant_dtype=jnp.float32,
                     out_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, x @ w.T, rtol=1e-4, atol=2e-3)


@pytest.mark.parametrize(
    "t", [GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q8_0, GGMLType.Q6_K, GGMLType.Q4_0]
)
@pytest.mark.parametrize("m", [1, 16])
def test_pallas_matmul_matches_xla(t, m):
    n, k = 256, 512
    raw = _random_raw(t, n, k)
    qt = QTensor.from_gguf_raw(raw, t, (n, k))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((m, k), dtype=np.float32) * 0.1, jnp.bfloat16)
    ref = quant_matmul(x, qt, backend="xla", out_dtype=jnp.float32)
    got = quant_matmul(x, qt, backend="pallas", interpret=True, out_dtype=jnp.float32)
    assert got.shape == (m, n)
    # both paths must be close to the exact f32 answer (the pallas path's
    # MXU bias term is MORE accurate than bf16 per-weight dequant, so the
    # two paths are compared through the truth, not each other)
    truth = np.asarray(x, np.float32) @ np.asarray(qt.dequantize(), np.float32).T
    np.testing.assert_allclose(np.asarray(got), truth, rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(ref), truth, rtol=5e-2, atol=5e-2)


def test_pallas_batch_dims():
    t = GGMLType.Q4_K
    n, k = 256, 512
    raw = _random_raw(t, n, k)
    qt = QTensor.from_gguf_raw(raw, t, (n, k))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 5, k), dtype=np.float32), jnp.bfloat16)
    got = quant_matmul(x, qt, backend="pallas", interpret=True)
    ref = quant_matmul(x, qt, backend="xla")
    assert got.shape == (2, 5, n)
    truth = np.asarray(x, np.float32).reshape(10, k) @ np.asarray(
        qt.dequantize(), np.float32
    ).T
    # unit-variance x → outputs O(sqrt(K)); tolerance scales with magnitude
    np.testing.assert_allclose(
        np.asarray(got, np.float32).reshape(10, n), truth, rtol=5e-2, atol=0.5
    )
    np.testing.assert_allclose(
        np.asarray(ref, np.float32).reshape(10, n), truth, rtol=5e-2, atol=0.5
    )


def test_isq_roundtrip_quality():
    """ISQ (quantize-from-float) keeps relative error within format bounds."""
    rng = np.random.default_rng(4)
    w = rng.standard_normal((16, 512), dtype=np.float32)
    for t, max_rel in [(GGMLType.Q8_0, 0.01), (GGMLType.Q4_K, 0.08), (GGMLType.Q6_K, 0.02)]:
        qt = QTensor.quantize(w, t)
        deq = np.asarray(qt.dequantize())
        rel = np.abs(deq - w).mean() / np.abs(w).mean()
        assert rel < max_rel, (t, rel)


def test_fused_projection_concat_quantized():
    """Quantized QKV concat (merged projections) stays exact."""
    from dataclasses import replace

    from mistralrs_tpu.models.llama import _concat_weights_n

    rng = np.random.default_rng(9)
    k = 512
    parts = []
    refs = []
    for n in (256, 128, 128):
        w = rng.standard_normal((n, k)).astype(np.float32)
        qt = QTensor.quantize(w, GGMLType.Q4_K)
        parts.append(replace(qt, data=qt.data[None], scale=qt.scale[None],
                             bias=None if qt.bias is None else qt.bias[None]))
        refs.append(np.asarray(qt.dequantize()))
    fused = _concat_weights_n(parts)
    import jax

    f0 = jax.tree_util.tree_map(lambda x: x[0], fused)
    got = np.asarray(f0.dequantize())
    np.testing.assert_array_equal(got, np.concatenate(refs, axis=0))


@pytest.mark.parametrize("t", [GGMLType.Q4_K, GGMLType.Q8_0, GGMLType.Q6_K])
def test_stacked_layer_matmul_matches_sliced(t):
    """Layer-indexed kernels over stacked [L, ...] planes (the decoder scan
    hot path: no per-layer weight slice copies) match the per-layer 2-D
    kernels exactly, on both the pallas(interpret) and xla paths."""
    import dataclasses

    L, n, k = 3, 256, 512
    qts = [
        QTensor.from_gguf_raw(_random_raw(t, n, k, seed=10 + i), t, (n, k))
        for i in range(L)
    ]
    stacked = dataclasses.replace(
        qts[0],
        data=jnp.stack([q.data for q in qts]),
        scale=jnp.stack([q.scale for q in qts]),
        bias=(
            None if qts[0].bias is None
            else jnp.stack([q.bias for q in qts])
        ),
    )
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((5, k), dtype=np.float32) * 0.1,
                    jnp.bfloat16)
    for li in range(L):
        ref = quant_matmul(x, qts[li], backend="xla", out_dtype=jnp.float32)
        got_x = quant_matmul(
            x, stacked, backend="xla", layer=jnp.int32(li),
            out_dtype=jnp.float32,
        )
        np.testing.assert_allclose(
            np.asarray(got_x), np.asarray(ref), rtol=1e-5, atol=1e-5
        )
        got_p = quant_matmul(
            x, stacked, backend="pallas", interpret=True,
            layer=jnp.int32(li), out_dtype=jnp.float32,
        )
        np.testing.assert_allclose(
            np.asarray(got_p), np.asarray(ref), rtol=6e-2, atol=6e-2
        )


@pytest.mark.parametrize("variant", ["f32dot", "bf16mul", "groupdot"])
def test_deq_dot_variants_match_truth(variant):
    """Every MRSTPU_MM_VARIANT inner-loop formulation (exp/vpu_ablation.py;
    the decode VPU-dequant ablation) stays within quantization tolerance of
    the exact f32 matmul."""
    t = GGMLType.Q4_K
    n, k = 256, 512
    raw = _random_raw(t, n, k)
    qt = QTensor.from_gguf_raw(raw, t, (n, k))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((8, k), dtype=np.float32) * 0.1,
                    jnp.bfloat16)
    truth = np.asarray(x, np.float32) @ np.asarray(
        qt.dequantize(), np.float32).T
    import importlib

    qmm = importlib.import_module("mistralrs_tpu.ops.quant_matmul")
    old = qmm._MM_VARIANT
    qmm._MM_VARIANT = variant
    jax.clear_caches()
    try:
        got = qmm.quant_matmul(
            x, qt, backend="pallas", interpret=True, out_dtype=jnp.float32
        )
    finally:
        qmm._MM_VARIANT = old
        jax.clear_caches()
    np.testing.assert_allclose(np.asarray(got), truth, rtol=6e-2, atol=6e-2)
