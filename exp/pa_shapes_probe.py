"""Probe fused PA kernel compile across head_dim / n_kv / group shapes."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mistralrs_tpu.ops.paged_attention import paged_decode_attention_fused

BS = 16
for hd, n_kv, group in [(64, 2, 2), (64, 8, 4), (128, 2, 2), (128, 8, 4),
                        (256, 4, 2), (64, 2, 1), (128, 8, 1)]:
    b, w = 4, 8
    q = jnp.zeros((b, n_kv * group, hd), jnp.bfloat16)
    kp = jnp.zeros((2, n_kv, w * BS * b, hd), jnp.bfloat16)
    vp = jnp.zeros_like(kp)
    kn = jnp.zeros((b, n_kv, hd), jnp.bfloat16)
    bt = jnp.zeros((b, w), jnp.int32)
    lens = jnp.full((b,), 17, jnp.int32)
    slots = jnp.arange(b, dtype=jnp.int32)
    t0 = time.time()
    try:
        out, _, _ = paged_decode_attention_fused(
            q, kp, vp, kn, kn, slots, bt, lens, 0, 1, block_size=BS
        )
        jax.block_until_ready(out)
        print(json.dumps({"hd": hd, "n_kv": n_kv, "group": group, "ok": True,
                          "s": round(time.time() - t0, 1)}), flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:120]
        print(json.dumps({"hd": hd, "n_kv": n_kv, "group": group, "ok": False,
                          "err": msg}), flush=True)
