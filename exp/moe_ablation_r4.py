"""MoE grouped-kernel ablation at the bench mixtral-slice decode shape
(VERDICT r3 item 6): where do the ~10 roofline points go — routing
(build_groups sort/segment), the scatter/combine, or the grouped matmuls
themselves?

STATUS r4: harness written + validated up to weight build; the run stalled
in the relay during the end-of-round window (the slice's k-quant fit takes
minutes and the relay degraded late in the session). Next round: run this
first thing — A−B isolates routing, B−C the scatter/combine, C vs D the
kernel's distance from the stream floor."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

import bench as B
import signal

signal.alarm(0)
from mistralrs_tpu.ops.moe_grouped import build_groups, moe_grouped_mlp
from mistralrs_tpu.ops.quant_matmul import quant_matmul_grouped

cfg = B.mixtral_slice_cfg()
print("mixtral slice:", cfg.num_experts, "experts,",
      cfg.moe_intermediate_size, "moe_inter,", cfg.num_layers, "layers",
      flush=True)
weights, wbytes = B.build_weights(cfg, seed=1)
lw = weights["layers"]
experts = {kk: jax.tree_util.tree_map(lambda a: a[0], v)
           for kk, v in lw["experts"].items()} if isinstance(
    lw.get("experts"), dict) else None
# per-layer expert bank (first layer)
import mistralrs_tpu.quant.qtensor as qt

bank = {k: jax.tree_util.tree_map(
    lambda a: a, v) for k, v in lw["experts"].items()}


def first_layer(v):
    import dataclasses
    return dataclasses.replace(
        v, data=v.data[0], scale=v.scale[0],
        bias=None if v.bias is None else v.bias[0])


bank1 = {k: first_layer(v) for k, v in bank.items()}

n, k = 8, cfg.num_experts_per_tok
h = cfg.hidden_size
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((n, h)), jnp.bfloat16)
topi = jnp.asarray(rng.integers(0, cfg.num_experts, (n, k)), jnp.int32)
topw = jnp.asarray(np.abs(rng.standard_normal((n, k))), jnp.float32)
act = jax.nn.silu


def timeit(f, iters=50):
    jax.block_until_ready(f())
    jax.block_until_ready(f())
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f()
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3


# A. full path (one layer's MoE MLP)
fa = jax.jit(lambda: moe_grouped_mlp(x, bank1, topw, topi, act))
t_full = timeit(fa)

# B. routing fixed: static groups precomputed OUTSIDE the timed region —
# isolates build_groups (sort/segment/scatter-index construction)
tm = 16
st, dest, sw, tile_idx, mp = jax.jit(
    lambda: build_groups(topi, topw, cfg.num_experts, tm))()
st, dest, sw, tile_idx = map(jax.device_put, (st, dest, sw, tile_idx))


def matmuls_only():
    xs = jnp.zeros((int(mp), h), x.dtype).at[dest].set(x[st])
    hidden = act(
        quant_matmul_grouped(xs, bank1["gate"], tile_idx, tm=tm,
                             out_dtype=xs.dtype)
    ) * quant_matmul_grouped(xs, bank1["up"], tile_idx, tm=tm,
                             out_dtype=xs.dtype)
    y = quant_matmul_grouped(hidden.astype(x.dtype), bank1["down"], tile_idx,
                             tm=tm, out_dtype=xs.dtype)
    return jnp.zeros((n, h), y.dtype).at[st].add(y[dest] * sw[:, None].astype(y.dtype))


t_mm = timeit(jax.jit(matmuls_only))

# C. matmul floor: the same 3 grouped matmuls with NO scatter/gather
def mm_floor():
    xs = x[jnp.zeros((int(mp),), jnp.int32)]  # any rows, right shape
    hidden = act(
        quant_matmul_grouped(xs, bank1["gate"], tile_idx, tm=tm,
                             out_dtype=xs.dtype)
    ) * quant_matmul_grouped(xs, bank1["up"], tile_idx, tm=tm,
                             out_dtype=xs.dtype)
    return quant_matmul_grouped(hidden.astype(x.dtype), bank1["down"],
                                tile_idx, tm=tm, out_dtype=xs.dtype)


t_floor = timeit(jax.jit(mm_floor))

# D. byte roofline for one layer's experts (all experts' bytes: every
# expert is hit at bs=8·k=2 with E=8 almost surely)
def qbytes(v):
    return v.data.nbytes + v.scale.nbytes + (v.bias.nbytes if v.bias is not None else 0)

wb = sum(qbytes(v) for v in bank1.values())
floor_ms = wb / B.V5E_HBM_GBPS * 1e3
print(f"one-layer expert bank bytes: {wb/1e6:.1f} MB -> stream floor "
      f"{floor_ms:.3f} ms", flush=True)
print(f"A full moe_grouped_mlp : {t_full:.3f} ms", flush=True)
print(f"B matmuls+combine (routing precomputed) : {t_mm:.3f} ms "
      f"(routing cost {t_full - t_mm:.3f} ms)", flush=True)
print(f"C grouped matmuls only (no scatter/gather) : {t_floor:.3f} ms "
      f"(combine cost {t_mm - t_floor:.3f} ms)", flush=True)
print(f"D HBM stream floor : {floor_ms:.3f} ms "
      f"(kernel efficiency {floor_ms / t_floor:.2f})", flush=True)
