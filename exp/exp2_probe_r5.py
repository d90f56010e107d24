"""Is exp→exp2 (log2e folded into the QK scale) worth anything in the
flash loops? (r5 prefill ablation: flash runs at 0.52 of MXU peak with
softmax VPU work as the tax.) Patch the decode kernel's flash body
in-module and re-time the chained attention."""
import functools, json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp
import bench as B
import signal
signal.alarm(0)
import importlib
pa = importlib.import_module("mistralrs_tpu.ops.paged_attention")

cfg = B.llama8b_cfg()
L, n_kv, hd, n_q = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim, cfg.num_heads
bs, CTX, BS = 8, 1024, 256

def emit(**kw):
    print(json.dumps(kw), flush=True)

def run(tag):
    width = CTX // BS
    S_total = bs * width * BS + BS
    k_pool = jnp.zeros((L, n_kv, S_total, hd), jnp.bfloat16)
    v_pool = jnp.zeros((L, n_kv, S_total, hd), jnp.bfloat16)
    bt = (jnp.arange(bs)[:, None] * width + jnp.arange(width)[None, :]).astype(jnp.int32)
    kv_lens = jnp.full((bs,), CTX - 4, jnp.int32)
    slots = (bt[jnp.arange(bs), (CTX - 5) // BS] * BS + (CTX - 5) % BS).astype(jnp.int32)
    q0 = jnp.ones((bs, n_q, hd), jnp.bfloat16) * 0.01
    kn = jnp.ones((bs, n_kv, hd), jnp.bfloat16) * 0.01

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(2, 3))
    def attn_chain(n_steps, q, k_pool, v_pool):
        def step(carry, _):
            q, kp, vp = carry
            def layer(c, li):
                q, kp, vp = c
                o, kp, vp = pa.paged_decode_attention_fused(
                    q, kp, vp, kn, kn, slots, bt, kv_lens, layer=li,
                    block_size=BS)
                return (o.astype(jnp.bfloat16) * 0.5 + q * 0.5, kp, vp), None
            (q, kp, vp), _ = jax.lax.scan(
                layer, (q, kp, vp), jnp.arange(L, dtype=jnp.int32))
            return (q, kp, vp), None
        (q, kp, vp), _ = jax.lax.scan(step, (q, k_pool, v_pool), None,
                                      length=n_steps)
        return q, kp, vp

    state = [k_pool, v_pool]
    def runner(n):
        q, state[0], state[1] = attn_chain(n, q0, state[0], state[1])
        return q
    times = {}
    for n in (5, 25, 5, 25):
        t0 = time.perf_counter()
        out = runner(n)
        jax.block_until_ready(out)
        times[n] = min(times.get(n, 1e9), time.perf_counter() - t0)
    per = (times[25] - times[5]) / 20 * 1e3
    kv_bytes = L * bs * CTX * n_kv * hd * 2 * 2
    floor = kv_bytes / B.V5E_HBM_GBPS * 1e3
    emit(variant=tag, per_step_ms=round(per, 3), eff=round(floor / per, 3))

run("exp-baseline")

# patch: scale q by log2e and use exp2 in the flash body
src_file = pa.__file__
orig = open(src_file).read()
patched = orig.replace(
    "    q = q_ref[0].astype(jnp.float32) * scale  # [n_kv, group_p, hd]",
    "    q = q_ref[0].astype(jnp.float32) * (scale * 1.4426950408889634)")
assert patched != orig
patched = patched.replace(
    "        alpha = jnp.exp(m - m_new)\n        p = jnp.exp(s - m_new)",
    "        alpha = jnp.exp2(m - m_new)\n        p = jnp.exp2(s - m_new)")
assert "jnp.exp2" in patched
open(src_file, "w").write(patched)
try:
    importlib.reload(pa)
    jax.clear_caches()
    run("exp2-folded")
finally:
    open(src_file, "w").write(orig)
