"""Run ONLY the decode@8192 int8-KV bench point (repro of the sweep skip)."""
import sys, traceback
sys.path.insert(0, "/root/repo")
from bench import llama8b_cfg, build_weights, measure_decode
import signal
signal.alarm(0)  # bench arms a 180s import-hang alarm; main() disarms it,
# but we call measure_decode directly (8192 compiles take longer)
from mistralrs_tpu.generate import _freeze
import jax

cfg = llama8b_cfg(smoke=False)
fcfg = _freeze(cfg)
weights, weight_bytes = build_weights(cfg)
try:
    v, r, st = measure_decode(cfg, fcfg, weights, weight_bytes, 8, 8192, False,
                              kv_quant="int8")
    print({"tok_s": round(v, 1), "vs_roofline": round(r, 3), "step_ms": round(st * 1e3, 2)})
except Exception:
    traceback.print_exc()
