"""End-to-end prefill MFU: gather path vs prefill kernel."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench as B
import signal
signal.alarm(0)  # bench's import-hang guard stays armed otherwise
from mistralrs_tpu.generate import _freeze

cfg = B.llama8b_cfg()
fcfg = _freeze(cfg)
weights, wb = B.build_weights(cfg)
for d in (2048, 8192):
    tps, mfu, ct = B.measure_prefill(cfg, fcfg, weights, wb, d, smoke=False)
    print(f"depth={d} pf_kernel={'off' if os.environ.get('MRSTPU_NO_PF_KERNEL')=='1' else 'on'} "
          f"tok/s={tps:.1f} MFU={mfu:.3f} chunk={ct*1e3:.1f}ms", flush=True)
