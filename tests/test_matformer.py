"""Matformer elastic slicing: skipped layers + FFN prefix dims."""

import numpy as np

import jax.numpy as jnp

from mistralrs_tpu.matformer import MatformerSlice, apply_matformer
from mistralrs_tpu.models import ModelConfig, init_random_weights
from mistralrs_tpu.models.llama import KVCache, forward


def test_slice_runs_and_prefix_zero_equivalence():
    cfg = ModelConfig(
        arch="llama", vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=4, num_heads=4, num_kv_heads=2, head_dim=16,
    )
    w = init_random_weights(cfg, seed=5, dtype=jnp.float32)
    sl = MatformerSlice(name="small", ffn_hidden_dims=[64, 64, 96],
                        layers_skipped=[2])
    scfg, sw = apply_matformer(cfg, w, sl)
    assert scfg.num_layers == 3
    assert scfg.intermediate_size == 96
    assert sw["layers"]["gate"].shape == (3, 96, 64)
    assert sw["layers"]["down"].shape == (3, 64, 96)
    # masked FFN columns are zero for the 64-dim layers
    assert float(jnp.abs(sw["layers"]["gate"][0, 64:]).max()) == 0.0

    ids = np.array([[1, 5, 9]], np.int32)
    cache = KVCache.create(scfg, 1, 8, dtype=jnp.float32)
    pos = jnp.arange(3)[None].astype(jnp.int32)
    lg, _ = forward(sw, scfg, jnp.asarray(ids), pos, cache,
                    jnp.zeros((1,), jnp.int32), backend="xla",
                    compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(lg)).all()
