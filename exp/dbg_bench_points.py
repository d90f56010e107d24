import json, os, sys, time
sys.path.insert(0, "/root/repo")
import jax
import bench as B
import signal
signal.alarm(0)
from mistralrs_tpu.generate import _freeze
from mistralrs_tpu.models.llama import fuse_projections

which = sys.argv[1]
cfg = B.llama8b_cfg()
fcfg = _freeze(cfg)
w, wb = B.build_weights(cfg, seed=0)
w = fuse_projections(w, cfg)
if which == "spec":
    out = B.measure_speculative_draft(cfg, fcfg, w, 8, 1024, False, gamma=4)
    print(json.dumps(out), flush=True)
elif which == "deep":
    v, r, _ = B.measure_decode(cfg, fcfg, w, wb, 8, 16384, False, kv_quant="int8")
    print(json.dumps({"tok_s": round(v,1), "vs_roofline": round(r,3)}), flush=True)
