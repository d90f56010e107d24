"""MoE grouped-kernel ablation at the bench mixtral-slice decode shape
(VERDICT r5 item 3): where do the ~10 roofline points go — routing
(build_groups sort/segment), the scatter/combine, or the grouped matmuls
themselves?

r5 robustness: the one-layer expert bank is CACHED to disk after the first
build (the k-quant fit takes ~50 min on this 1-core host and r4 lost two
runs to relay hiccups after the build), and every timed compile retries
through transient relay errors.

  A. full moe_grouped_mlp           (routing + matmuls + combine)
  B. matmuls+combine, routing fixed (A−B = routing cost)
  C. grouped matmuls only           (B−C = scatter/combine cost)
  D. HBM stream floor               (C/D = kernel efficiency)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

CACHE = os.path.join(os.path.dirname(__file__), "moe_bank1_cache.npz")

import bench as B
import signal

signal.alarm(0)
from mistralrs_tpu.ops.moe_grouped import build_groups, moe_grouped_mlp
from mistralrs_tpu.quant.qtensor import QTensor

cfg = B.mixtral_slice_cfg()
print("mixtral slice:", cfg.num_experts, "experts,",
      cfg.moe_intermediate_size, "moe_inter,", cfg.num_layers, "layers",
      flush=True)

KEYS = ("gate", "up", "down")
META = ("group_size", "packed", "code_bits", "chunks")


def load_bank():
    if os.path.exists(CACHE):
        z = np.load(CACHE, allow_pickle=True)
        bank = {}
        for k in KEYS:
            kw = dict(
                data=jnp.asarray(z[f"{k}_data"]),
                scale=jnp.asarray(z[f"{k}_scale"]),
                bias=(jnp.asarray(z[f"{k}_bias"])
                      if f"{k}_bias" in z.files else None),
            )
            meta = json.loads(str(z[f"{k}_meta"]))
            if meta.get("ggml_type") is not None:
                from mistralrs_tpu.gguf.constants import GGMLType

                meta["ggml_type"] = GGMLType(meta["ggml_type"])
            bank[k] = QTensor(**kw, **meta)
        print("bank1 loaded from cache", flush=True)
        return bank
    weights, _ = B.build_weights(cfg, seed=1)
    lw = weights["layers"]
    import dataclasses

    def first_layer(v):
        return dataclasses.replace(
            v, data=v.data[0], scale=v.scale[0],
            bias=None if v.bias is None else v.bias[0])

    bank = {k: first_layer(v) for k, v in lw["experts"].items()}
    save = {}
    for k, v in bank.items():
        save[f"{k}_data"] = np.asarray(v.data)
        save[f"{k}_scale"] = np.asarray(v.scale)
        if v.bias is not None:
            save[f"{k}_bias"] = np.asarray(v.bias)
        save[f"{k}_meta"] = json.dumps({
            m: getattr(v, m) for m in META
        } | {"ggml_type": int(v.ggml_type) if v.ggml_type is not None
             else None})
        print(f"{k}: data {v.data.shape} scale {v.scale.shape}", flush=True)
    np.savez(CACHE, **save)
    print("bank1 cached", flush=True)
    return bank


bank1 = load_bank()

n, k = 8, cfg.num_experts_per_tok
h = cfg.hidden_size
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((n, h)), jnp.bfloat16)
topi = jnp.asarray(rng.integers(0, cfg.num_experts, (n, k)), jnp.int32)
topw = jnp.asarray(np.abs(rng.standard_normal((n, k))), jnp.float32)
act = jax.nn.silu

from mistralrs_tpu.ops.quant_matmul import quant_matmul_grouped


def timeit(f, iters=50, attempts=4):
    for at in range(attempts):
        try:
            jax.block_until_ready(f())
            jax.block_until_ready(f())
            t0 = time.perf_counter()
            for _ in range(iters):
                o = f()
            jax.block_until_ready(o)
            return (time.perf_counter() - t0) / iters * 1e3
        except Exception as e:  # transient relay/compile hiccups
            print(f"attempt {at}: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            time.sleep(30)
    raise RuntimeError("timing failed after retries")


# weights ride as jit ARGUMENTS — closed-over 5.6 GB constants get
# serialized into the HLO and break the compile relay (the r4/r5 stalls)
bank1 = jax.device_put(bank1)

# A. full path (one layer's MoE MLP)
fa_jit = jax.jit(lambda b: moe_grouped_mlp(x, b, topw, topi, act))
t_full = timeit(lambda: fa_jit(bank1))
print(f"A full moe_grouped_mlp : {t_full:.3f} ms", flush=True)

# B. routing fixed: static groups precomputed OUTSIDE the timed region
tm = 16
st, dest, sw, tile_idx, mp = jax.jit(
    lambda: build_groups(topi, topw, cfg.num_experts, tm))()
st, dest, sw, tile_idx = map(jax.device_put, (st, dest, sw, tile_idx))


@jax.jit
def matmuls_only(b):
    xs = jnp.zeros((int(mp), h), x.dtype).at[dest].set(x[st])
    hidden = act(
        quant_matmul_grouped(xs, b["gate"], tile_idx, tm=tm,
                             out_dtype=xs.dtype)
    ) * quant_matmul_grouped(xs, b["up"], tile_idx, tm=tm,
                             out_dtype=xs.dtype)
    y = quant_matmul_grouped(hidden.astype(x.dtype), b["down"], tile_idx,
                             tm=tm, out_dtype=xs.dtype)
    return jnp.zeros((n, h), y.dtype).at[st].add(y[dest] * sw[:, None].astype(y.dtype))


t_mm = timeit(lambda: matmuls_only(bank1))
print(f"B matmuls+combine (routing precomputed) : {t_mm:.3f} ms "
      f"(routing cost {t_full - t_mm:.3f} ms)", flush=True)


# C. matmul floor: the same 3 grouped matmuls with NO scatter/gather
@jax.jit
def mm_floor(b):
    xs = x[jnp.zeros((int(mp),), jnp.int32)]
    hidden = act(
        quant_matmul_grouped(xs, b["gate"], tile_idx, tm=tm,
                             out_dtype=xs.dtype)
    ) * quant_matmul_grouped(xs, b["up"], tile_idx, tm=tm,
                             out_dtype=xs.dtype)
    return quant_matmul_grouped(hidden.astype(x.dtype), b["down"],
                                tile_idx, tm=tm, out_dtype=xs.dtype)


t_floor = timeit(lambda: mm_floor(bank1))
print(f"C grouped matmuls only (no scatter/gather) : {t_floor:.3f} ms "
      f"(combine cost {t_mm - t_floor:.3f} ms)", flush=True)


# D. byte roofline for one layer's experts
def qbytes(v):
    return v.data.nbytes + v.scale.nbytes + (
        v.bias.nbytes if v.bias is not None else 0)


wb = sum(qbytes(v) for v in bank1.values())
floor_ms = wb / B.V5E_HBM_GBPS * 1e3
print(f"one-layer expert bank bytes: {wb/1e6:.1f} MB -> stream floor "
      f"{floor_ms:.3f} ms", flush=True)
print(f"D HBM stream floor : {floor_ms:.3f} ms "
      f"(kernel efficiency {floor_ms / t_floor:.2f})", flush=True)
print(json.dumps({
    "A_full_ms": round(t_full, 3), "B_mm_combine_ms": round(t_mm, 3),
    "C_mm_only_ms": round(t_floor, 3), "D_floor_ms": round(floor_ms, 3),
    "routing_ms": round(t_full - t_mm, 3),
    "combine_ms": round(t_mm - t_floor, 3),
    "kernel_eff": round(floor_ms / t_floor, 3),
}), flush=True)
