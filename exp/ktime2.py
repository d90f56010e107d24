import sys, json, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
OUT = open("/root/repo/exp/ktime2.out", "a")
def emit(**kw):
    print(json.dumps(kw), flush=True); OUT.write(json.dumps(kw)+"\n"); OUT.flush()
import bench
from mistralrs_tpu.generate import _freeze
from mistralrs_tpu.kv.paged import PagedKVCache
from mistralrs_tpu.models.llama import forward_paged
cfg = bench.llama8b_cfg(); weights, _ = bench.build_weights(cfg)
fcfg = _freeze(cfg)
B, BS, W = 8, 16, 168  # novel table width → cache miss
cache = PagedKVCache.create(cfg, 1344, BS, dtype=jnp.bfloat16)
ids = jnp.zeros((B,1), jnp.int32); pos = jnp.zeros((B,1), jnp.int32)
bt = jnp.zeros((B,W), jnp.int32); sm = jnp.zeros((B,), jnp.int32)
kl = jnp.ones((B,), jnp.int32)
for fg in (False,):
    def f(weights, ids, pos, cache, bt, sm, kl, fg=fg):
        return forward_paged(weights, fcfg, ids, pos, cache, bt, sm, kl,
                             block_size=BS, logits_last_only=True, force_gather=fg)
    t0=time.time(); low = jax.jit(f).lower(weights, ids, pos, cache, bt, sm, kl); t1=time.time()
    comp = low.compile(); t2=time.time()
    emit(what=("model_gather_w168" if fg else "model_kernel_w168"),
         lower_s=round(t1-t0,2), compile_s=round(t2-t1,2))
emit(what="done")
