"""Repro: int8-KV fused decode kernel MosaicError at depth 8192 (bench skip)."""
import sys
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from mistralrs_tpu.ops.paged_attention import paged_decode_attention_fused

B, n_kv, group, hd = 8, 8, 4, 128
BS = 64
CTX = 8192
L = 1
S = B * CTX
W = CTX // BS

key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (B, n_kv * group, hd), jnp.bfloat16)
k_pool = jnp.zeros((L, n_kv, S, hd), jnp.int8)
v_pool = jnp.zeros((L, n_kv, S, hd), jnp.int8)
kv_scale = jnp.ones((L, S, 128), jnp.bfloat16)
k_new = jax.random.normal(key, (B, n_kv, hd), jnp.bfloat16)
v_new = jax.random.normal(key, (B, n_kv, hd), jnp.bfloat16)
bt = (jnp.arange(B)[:, None] * W + jnp.arange(W)[None, :]).astype(jnp.int32)
lens = jnp.full((B,), CTX - 1, jnp.int32)
slots = (bt[jnp.arange(B), (CTX - 1) // BS] * BS + (CTX - 1) % BS).astype(jnp.int32)

out = paged_decode_attention_fused(
    q, k_pool, v_pool, k_new, v_new, slots, bt, lens,
    0, 0, kv_scale, block_size=BS,
)
print("OK", out[0].shape, jnp.asarray(out[0]).mean())
