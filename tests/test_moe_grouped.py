"""Grouped (ragged) MoE kernels: parity vs the dense every-expert reference
on w4 / w8 / dense banks, ragged routing edge cases (all-to-one, empty
experts, EP shard masking), and the engine-path wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mistralrs_tpu.gguf.constants import GGMLType
from mistralrs_tpu.gguf.quants import quantize
from mistralrs_tpu.ops.moe_grouped import (
    build_groups, dense_matmul_grouped, moe_grouped_mlp,
)
from mistralrs_tpu.ops.quant_matmul import quant_matmul_grouped
from mistralrs_tpu.quant.qtensor import QTensor

E, H, I = 4, 256, 512


def _bank(rng, e, n, k, ggml=None):
    """Stacked [e, n, k] bank: QTensor (from GGUF codec) or dense f32."""
    w = (rng.standard_normal((e, n, k)) * 0.05).astype(np.float32)
    if ggml is None:
        return jnp.asarray(w), w
    qts, deq = [], []
    for i in range(e):
        raw = quantize(w[i], ggml)
        qt = QTensor.from_gguf_raw(np.asarray(raw, np.uint8), ggml, (n, k))
        qts.append(qt)
        deq.append(np.asarray(qt.dequantize(jnp.float32)))
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *qts)
    return stacked, np.stack(deq)


def _route(rng, n, k=2, e=E):
    topi = rng.integers(0, e, (n, k)).astype(np.int32)
    topw = rng.uniform(0.1, 1.0, (n, k)).astype(np.float32)
    return jnp.asarray(topi), jnp.asarray(topw)


def _ref_moe(x, deq_g, deq_u, deq_d, topi, topw, act):
    """Dense reference: every expert on every token, masked combine."""
    x = np.asarray(x, np.float32)
    n = x.shape[0]
    out = np.zeros((n, deq_d.shape[1]), np.float32)
    for e in range(deq_g.shape[0]):
        h = act(x @ deq_g[e].T) * (x @ deq_u[e].T)
        y = h @ deq_d[e].T
        w = np.where(np.asarray(topi) == e, np.asarray(topw), 0.0).sum(-1)
        out += y * w[:, None]
    return out


def test_build_groups_ragged():
    rng = np.random.default_rng(0)
    topi, topw = _route(rng, 16, k=2)
    st, dest, sw, tile_idx, mp = build_groups(topi, topw, E, tm=8)
    st, dest, sw, tile_idx = map(np.asarray, (st, dest, sw, tile_idx))
    assert mp % 8 == 0 and dest.max() < mp
    # every (token, choice) pair lands in a tile owned by its expert
    flat_e = np.asarray(topi).reshape(-1)
    order = np.argsort(flat_e, kind="stable")
    for row, e in zip(dest, flat_e[order]):
        assert tile_idx[row // 8] == e
    # weights preserved
    np.testing.assert_allclose(np.sort(sw), np.sort(np.asarray(topw).ravel()))


def test_build_groups_all_to_one_and_empty():
    topi = jnp.full((8, 2), 3, jnp.int32)  # experts 0-2 empty
    topw = jnp.ones((8, 2), jnp.float32)
    st, dest, sw, tile_idx, mp = build_groups(topi, topw, E, tm=8)
    assert np.asarray(dest).max() == 15  # one dense group, no padding holes
    assert (np.asarray(tile_idx)[:2] == 3).all()


@pytest.mark.parametrize("ggml", [GGMLType.Q4_K, GGMLType.Q8_0, None])
def test_moe_grouped_parity(ggml):
    rng = np.random.default_rng(1)
    gate, dg = _bank(rng, E, I, H, ggml)
    up, du = _bank(rng, E, I, H, ggml)
    down, dd = _bank(rng, E, H, I, ggml)
    x = jnp.asarray(rng.standard_normal((24, H)).astype(np.float32))
    topi, topw = _route(rng, 24)
    act = jax.nn.silu
    out = moe_grouped_mlp(
        x, {"gate": gate, "up": up, "down": down}, topw, topi, act,
        tm=8, backend="xla", dequant_dtype=jnp.float32,
    )
    ref = _ref_moe(x, dg, du, dd, topi, topw,
                   lambda v: v / (1 + np.exp(-v)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("ggml", [GGMLType.Q4_K, GGMLType.Q8_0])
def test_grouped_quant_kernel_interpret(ggml):
    """The Pallas grouped kernel (interpret mode) matches the XLA path."""
    rng = np.random.default_rng(2)
    bank, deq = _bank(rng, E, I, H, ggml)
    topi, topw = _route(rng, 12)
    st, dest, sw, tile_idx, mp = build_groups(topi, topw, E, tm=16)
    x = jnp.asarray(rng.standard_normal((12, H)).astype(np.float32))
    xs = jnp.zeros((mp, H), jnp.float32).at[dest].set(x[st])
    got = quant_matmul_grouped(
        xs, bank, tile_idx, tm=16, backend="pallas", interpret=True,
        dequant_dtype=jnp.float32, out_dtype=jnp.float32,
    )
    ref = quant_matmul_grouped(
        xs, bank, tile_idx, tm=16, backend="xla",
        dequant_dtype=jnp.float32, out_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3
    )


def test_grouped_dense_kernel_interpret():
    rng = np.random.default_rng(3)
    bank, _ = _bank(rng, E, I, H, None)
    topi, topw = _route(rng, 12)
    st, dest, sw, tile_idx, mp = build_groups(topi, topw, E, tm=16)
    x = jnp.asarray(rng.standard_normal((12, H)).astype(np.float32))
    xs = jnp.zeros((mp, H), jnp.float32).at[dest].set(x[st])
    got = dense_matmul_grouped(
        xs, bank, tile_idx, tm=16, backend="pallas", interpret=True
    )
    ref = dense_matmul_grouped(xs, bank, tile_idx, tm=16, backend="xla")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3
    )


def test_moe_grouped_ep_masking():
    """EP shard: only local experts computed; two shards sum to the full
    result (the caller's psum)."""
    rng = np.random.default_rng(4)
    gate, dg = _bank(rng, E, I, H, None)
    up, du = _bank(rng, E, I, H, None)
    down, dd = _bank(rng, E, H, I, None)
    x = jnp.asarray(rng.standard_normal((10, H)).astype(np.float32))
    topi, topw = _route(rng, 10)
    act = jax.nn.silu
    full = moe_grouped_mlp(
        x, {"gate": gate, "up": up, "down": down}, topw, topi, act,
        tm=8, backend="xla",
    )
    half = E // 2
    parts = []
    for s in range(2):
        sl = slice(s * half, (s + 1) * half)
        parts.append(moe_grouped_mlp(
            x, {"gate": gate[sl], "up": up[sl], "down": down[sl]},
            topw, topi, act, tm=8, backend="xla",
            expert_offset=jnp.int32(s * half), num_local=half,
        ))
    np.testing.assert_allclose(
        np.asarray(parts[0] + parts[1]), np.asarray(full),
        rtol=2e-3, atol=2e-3,
    )


def test_moe_mlp_grouped_vs_scan_quantized():
    """_moe_mlp routes quantized banks through the grouped path; outputs
    match the dense every-expert scan (MRSTPU_MOE_GROUPED=0) on a
    mixtral-geometry layer with k-quant experts."""
    import os

    from mistralrs_tpu.models import ModelConfig
    from mistralrs_tpu.models.llama import ACTIVATIONS, _moe_mlp

    rng = np.random.default_rng(5)
    e, k, h, i = 8, 2, H, I
    cfg = ModelConfig(
        arch="mixtral", vocab_size=32, hidden_size=h, intermediate_size=i,
        num_layers=1, num_heads=2, num_kv_heads=2, head_dim=128,
        num_experts=e, num_experts_per_tok=k, max_position_embeddings=64,
    )
    gate, _ = _bank(rng, e, i, h, GGMLType.Q4_K)
    up, _ = _bank(rng, e, i, h, GGMLType.Q4_K)
    down, _ = _bank(rng, e, h, i, GGMLType.Q4_K)
    lw = {
        "router": jnp.asarray(rng.standard_normal((e, h)), jnp.float32),
        "experts": {"gate": gate, "up": up, "down": down},
    }
    x = jnp.asarray(rng.standard_normal((2, 5, h)) * 0.3, jnp.float32)
    act = ACTIVATIONS["silu"]
    grouped = np.asarray(_moe_mlp(x, lw, cfg, act, "xla"))
    os.environ["MRSTPU_MOE_GROUPED"] = "0"
    try:
        scan = np.asarray(_moe_mlp(x, lw, cfg, act, "xla"))
    finally:
        os.environ.pop("MRSTPU_MOE_GROUPED", None)
    np.testing.assert_allclose(grouped, scan, rtol=5e-3, atol=5e-3)


def test_moe_mlp_stacked_layerslice_matches_sliced():
    """Stacked [L, E, ...] banks via LayerSlice (the scan scalar-prefetch
    path — no per-layer bank copy) produce exactly the layer's unstacked
    result, through both the grouped kernel path and the scan fallback."""
    import os

    from mistralrs_tpu.models import ModelConfig
    from mistralrs_tpu.models.llama import ACTIVATIONS, _moe_mlp
    from mistralrs_tpu.quant.linear import LayerSlice

    rng = np.random.default_rng(9)
    e, k, h, i, L = 8, 2, H, I, 3
    cfg = ModelConfig(
        arch="mixtral", vocab_size=32, hidden_size=h, intermediate_size=i,
        num_layers=L, num_heads=2, num_kv_heads=2, head_dim=128,
        num_experts=e, num_experts_per_tok=k, max_position_embeddings=64,
    )
    per_layer = []
    for _ in range(L):
        gate, _ = _bank(rng, e, i, h, GGMLType.Q4_K)
        up, _ = _bank(rng, e, i, h, GGMLType.Q4_K)
        down, _ = _bank(rng, e, h, i, GGMLType.Q4_K)
        per_layer.append({"gate": gate, "up": up, "down": down})
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer)
    router = jnp.asarray(rng.standard_normal((e, h)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 5, h)) * 0.3, jnp.float32)
    act = ACTIVATIONS["silu"]
    for layer in (0, 2):
        lw_ref = {"router": router, "experts": per_layer[layer]}
        ref = np.asarray(_moe_mlp(x, lw_ref, cfg, act, "xla"))
        lw_st = {
            "router": router,
            "experts": {
                kk: LayerSlice(v, jnp.int32(layer))
                for kk, v in stacked.items()
            },
        }
        got = np.asarray(_moe_mlp(x, lw_st, cfg, act, "xla"))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
        os.environ["MRSTPU_MOE_GROUPED"] = "0"
        try:
            got_scan = np.asarray(_moe_mlp(x, lw_st, cfg, act, "xla"))
        finally:
            os.environ.pop("MRSTPU_MOE_GROUPED", None)
        np.testing.assert_allclose(got_scan, ref, rtol=1e-5, atol=1e-5)
