import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from mistralrs_tpu.engine.engine import Engine
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.parallel import build_mesh
from mistralrs_tpu.engine.adapters import Qwen3NextAdapter
from test_arch_adapters import _tiny_qwen3next

cfg, weights = _tiny_qwen3next()
rng = np.random.default_rng(17)
prompts = [[int(x) for x in rng.integers(1, cfg.vocab_size, n)]
           for n in (5, 11, 3, 7)]


def run(mesh):
    adapter = Qwen3NextAdapter(cfg, weights)
    eng = Engine(cfg, dict(weights), num_blocks=32, block_size=4, max_batch=4,
                 prefill_chunk=8, compute_dtype=jnp.float32, adapter=adapter,
                 mesh=mesh)
    seqs = [eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=6))
            for p in prompts]
    eng.run_to_completion()
    groups = [eng.kv.group_of(s.request_id) if hasattr(eng.kv, "group_of")
              else 0 for s in seqs]
    slots = [s.slot for s in seqs]
    return [s.output_ids for s in seqs], groups, slots


ref, _, _ = run(None)
got, groups, slots = run(build_mesh(tp=1, dp=2))
print("ref  ", ref, flush=True)
print("dp2  ", got, flush=True)
print("groups", groups, "slots", slots, flush=True)
print("match", got == ref, flush=True)

# instrumented rerun: record slot/group at admission
from mistralrs_tpu.engine import scheduler as sched_mod

orig = sched_mod.Scheduler.schedule
log = []


def patched(self, *a, **k):
    out = orig(self, *a, **k)
    for sp in out[0] if isinstance(out, tuple) else []:
        pass
    return out


def run2(mesh):
    adapter = Qwen3NextAdapter(cfg, weights)
    eng = Engine(cfg, dict(weights), num_blocks=32, block_size=4, max_batch=4,
                 prefill_chunk=8, compute_dtype=jnp.float32, adapter=adapter,
                 mesh=mesh)
    seqs = [eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=6))
            for p in prompts]
    info = {}
    import time
    while True:
        fin = eng.step()
        for i, s in enumerate(seqs):
            if s.slot is not None and i not in info:
                info[i] = (s.slot, eng.kv.group_of(s.request_id))
        if all(s.is_finished for s in seqs):
            break
    return [s.output_ids for s in seqs], info


got2, info = run2(build_mesh(tp=1, dp=2))
print("info (seq -> slot, group)", info, flush=True)
print("got2", got2, flush=True)
