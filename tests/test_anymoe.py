"""AnyMoE: runtime MoE construction + gate training decreases loss."""

import numpy as np

import jax.numpy as jnp

from mistralrs_tpu.anymoe import build_anymoe, train_gate
from mistralrs_tpu.models import ModelConfig, init_random_weights
from mistralrs_tpu.models.llama import KVCache, forward


def test_build_and_train_gate():
    cfg = ModelConfig(
        arch="llama", vocab_size=64, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=2, num_kv_heads=1, head_dim=16,
    )
    w = init_random_weights(cfg, seed=1, dtype=jnp.float32)
    base_mlp = {k: w["layers"][k] for k in ("gate", "up", "down")}
    rng = np.random.default_rng(2)
    expert2 = {
        k: v + jnp.asarray(rng.standard_normal(v.shape) * 0.01, v.dtype)
        for k, v in base_mlp.items()
    }
    mcfg, mw = build_anymoe(cfg, w, [base_mlp, expert2])
    assert mcfg.num_experts == 2
    assert mw["layers"]["experts"]["gate"].shape == (2, 2, 64, 32)

    ids = np.array([[1, 5, 9, 20]], np.int32)
    cache = KVCache.create(mcfg, 1, 8, dtype=jnp.float32)
    pos = jnp.arange(4)[None].astype(jnp.int32)
    lg, _ = forward(mw, mcfg, jnp.asarray(ids), pos, cache,
                    jnp.zeros((1,), jnp.int32), backend="xla",
                    compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(lg)).all()

    data = [[1, 5, 9, 20, 7, 3], [2, 4, 6, 8, 10], [11, 13, 17, 19]]
    trained, hist = train_gate(mcfg, mw, data, steps=8, lr=5e-3)
    assert len(hist) == 8
    assert hist[-1] < hist[0]  # loss decreases
    assert not np.allclose(
        np.asarray(trained["layers"]["router"]),
        np.asarray(mw["layers"]["router"]),
    )
