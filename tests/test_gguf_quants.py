"""Quant/dequant reference tests.

Dequant layouts are validated two ways: (1) hand-constructed blocks with
known expected values (spec-exactness), (2) quantize->dequantize roundtrips
bounding reconstruction error (quantizer quality). Mirrors the reference's
in-module quant test strategy (SURVEY.md §4)."""

import numpy as np
import pytest

from mistralrs_tpu.gguf import GGMLType, quantize, dequantize
from mistralrs_tpu.gguf.constants import type_traits
from mistralrs_tpu.gguf import quants as Q


def test_type_traits_sizes():
    assert type_traits(GGMLType.Q4_0).type_size == 18
    assert type_traits(GGMLType.Q8_0).type_size == 34
    assert type_traits(GGMLType.Q2_K).type_size == 84
    assert type_traits(GGMLType.Q3_K).type_size == 110
    assert type_traits(GGMLType.Q4_K).type_size == 144
    assert type_traits(GGMLType.Q5_K).type_size == 176
    assert type_traits(GGMLType.Q6_K).type_size == 210
    assert type_traits(GGMLType.Q8_K).type_size == 292


def test_q8_0_exact():
    # d = 0.5, qs = [-128..127 slice]
    raw = np.zeros(34, dtype=np.uint8)
    raw[0:2] = np.array([0.5], dtype=np.float16).view(np.uint8)
    q = np.arange(-16, 16, dtype=np.int8)
    raw[2:34] = q.view(np.uint8)
    out = dequantize(raw, GGMLType.Q8_0, (32,))
    np.testing.assert_allclose(out, q.astype(np.float32) * 0.5)


def test_q4_0_exact():
    raw = np.zeros(18, dtype=np.uint8)
    raw[0:2] = np.array([2.0], dtype=np.float16).view(np.uint8)
    # byte j holds elements j (lo) and j+16 (hi)
    raw[2:18] = np.arange(16, dtype=np.uint8) | (np.arange(16, dtype=np.uint8)[::-1] << 4)
    out = dequantize(raw, GGMLType.Q4_0, (32,))
    expect = np.concatenate([np.arange(16), np.arange(16)[::-1]]).astype(np.float32)
    np.testing.assert_allclose(out, (expect - 8.0) * 2.0)


def test_q4_k_scale_min_pack_roundtrip():
    rng = np.random.default_rng(0)
    sc = rng.integers(0, 64, size=(7, 8)).astype(np.uint8)
    mn = rng.integers(0, 64, size=(7, 8)).astype(np.uint8)
    packed = Q._pack_scale_min_k4(sc, mn)
    sc2, mn2 = Q._unpack_scale_min_k4(packed)
    np.testing.assert_array_equal(sc, sc2)
    np.testing.assert_array_equal(mn, mn2)


def test_q4_k_exact_handbuilt():
    # One superblock: d=1, dmin=0, all scales 1, q = known pattern.
    raw = np.zeros(144, dtype=np.uint8)
    raw[0:2] = np.array([1.0], dtype=np.float16).view(np.uint8)
    raw[2:4] = np.array([0.0], dtype=np.float16).view(np.uint8)
    sc = np.ones((1, 8), dtype=np.uint8)
    mn = np.zeros((1, 8), dtype=np.uint8)
    raw[4:16] = Q._pack_scale_min_k4(sc, mn)[0]
    # qs byte layout: chunk c (of 64 elems) uses bytes [32c, 32c+32); element
    # local=64c+p: lo nibble if p<32 else hi nibble of byte 32c + p%32.
    q_elem = (np.arange(256) * 7 % 16).astype(np.uint8)
    qs = np.zeros(128, dtype=np.uint8)
    for local in range(256):
        c, p = local // 64, local % 64
        byte = c * 32 + p % 32
        if p < 32:
            qs[byte] |= q_elem[local]
        else:
            qs[byte] |= q_elem[local] << 4
    raw[16:144] = qs
    out = dequantize(raw, GGMLType.Q4_K, (256,))
    np.testing.assert_allclose(out, q_elem.astype(np.float32))


def test_q6_k_exact_handbuilt():
    raw = np.zeros(210, dtype=np.uint8)
    q_elem = (np.arange(256) * 11 % 64).astype(np.uint8)
    ql = np.zeros(128, dtype=np.uint8)
    qh = np.zeros(64, dtype=np.uint8)
    for local in range(256):
        half, pos, quarter = local // 128, local % 32, (local % 128) // 32
        pi = half * 64 + pos + (quarter % 2) * 32
        lo = q_elem[local] & 15
        hi = q_elem[local] >> 4
        if quarter < 2:
            ql[pi] |= lo
        else:
            ql[pi] |= lo << 4
        qh[half * 32 + pos] |= hi << (quarter * 2)
    raw[0:128] = ql
    raw[128:192] = qh
    raw[192:208] = np.full(16, 2, dtype=np.int8).view(np.uint8)  # all scales 2
    raw[208:210] = np.array([0.25], dtype=np.float16).view(np.uint8)
    out = dequantize(raw, GGMLType.Q6_K, (256,))
    np.testing.assert_allclose(out, 0.5 * (q_elem.astype(np.float32) - 32.0))


def test_q5_k_exact_handbuilt():
    raw = np.zeros(176, dtype=np.uint8)
    raw[0:2] = np.array([1.0], dtype=np.float16).view(np.uint8)
    raw[2:4] = np.array([1.0], dtype=np.float16).view(np.uint8)
    sc = np.full((1, 8), 2, dtype=np.uint8)
    mn = np.full((1, 8), 3, dtype=np.uint8)
    raw[4:16] = Q._pack_scale_min_k4(sc, mn)[0]
    q_elem = (np.arange(256) * 13 % 32).astype(np.uint8)
    qh = np.zeros(32, dtype=np.uint8)
    qs = np.zeros(128, dtype=np.uint8)
    for local in range(256):
        c, p = local // 64, local % 64
        byte = c * 32 + p % 32
        lo = q_elem[local] & 15
        if p < 32:
            qs[byte] |= lo
        else:
            qs[byte] |= lo << 4
        qh[local % 32] |= (q_elem[local] >> 4) << (local // 32)
    raw[16:48] = qh
    raw[48:176] = qs
    out = dequantize(raw, GGMLType.Q5_K, (256,))
    np.testing.assert_allclose(out, 2.0 * q_elem.astype(np.float32) - 3.0)


@pytest.mark.parametrize(
    "ggml_type,max_rel_rmse",
    [
        (GGMLType.Q8_0, 0.007),
        (GGMLType.Q4_0, 0.10),
        (GGMLType.Q5_0, 0.05),
        (GGMLType.Q4_K, 0.08),
        (GGMLType.Q5_K, 0.042),
        (GGMLType.Q6_K, 0.022),
    ],
)
def test_quant_roundtrip_error(ggml_type, max_rel_rmse):
    rng = np.random.default_rng(42)
    x = rng.normal(size=(16, 256)).astype(np.float32)
    raw = quantize(x, ggml_type)
    y = dequantize(raw, ggml_type, x.shape)
    rmse = np.sqrt(np.mean((x - y) ** 2))
    rms = np.sqrt(np.mean(x**2))
    assert rmse / rms < max_rel_rmse, f"{ggml_type}: rel rmse {rmse / rms:.4f}"


@pytest.mark.parametrize("t", [GGMLType.F16, GGMLType.BF16, GGMLType.F32])
def test_float_formats_roundtrip(t):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 64)).astype(np.float32)
    raw = quantize(x, t)
    y = dequantize(raw, t, x.shape)
    tol = {GGMLType.F32: 0, GGMLType.F16: 1e-3, GGMLType.BF16: 1e-2}[t]
    np.testing.assert_allclose(x, y, rtol=tol, atol=tol)


def test_quant_flat_blocks_are_zero_safe():
    x = np.zeros((2, 256), dtype=np.float32)
    for t in [GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q4_K, GGMLType.Q6_K]:
        raw = quantize(x, t)
        y = dequantize(raw, t, x.shape)
        assert np.all(np.isfinite(y))
        np.testing.assert_allclose(y, 0.0, atol=1e-6)


def test_q2k_q3k_encoders_roundtrip():
    """The low-bit ISQ encoders decode through the same wire format with
    error ordered by bit width (q2k > q3k > q4k)."""
    import numpy as np

    from mistralrs_tpu.gguf.quants import (
        dequant_q2_k,
        dequant_q3_k,
        dequant_q4_k,
        quant_q2_k,
        quant_q3_k,
        quant_q4_k,
    )

    rng = np.random.default_rng(3)
    x = (rng.standard_normal((8, 256)) * 0.1).astype(np.float32)
    errs = {}
    for name, qf, df in (("q2k", quant_q2_k, dequant_q2_k),
                         ("q3k", quant_q3_k, dequant_q3_k),
                         ("q4k", quant_q4_k, dequant_q4_k)):
        y = df(qf(x).reshape(-1)).reshape(x.shape)
        errs[name] = float(np.abs(y - x).mean() / np.abs(x).mean())
    assert errs["q2k"] < 0.40 and errs["q3k"] < 0.25 and errs["q4k"] < 0.10
    assert errs["q2k"] > errs["q3k"] > errs["q4k"]  # ordered by bit width
