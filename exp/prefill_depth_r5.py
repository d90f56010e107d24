"""Prefill MFU decay with depth (r4 verdict weak #8): separate the
matmul (MXU) cost from the flash-attention past-KV streaming (DMA) cost.

At each depth D, times the 512-token chunk two ways:
  full      the real prefill step with kv context at D (attention spans D)
  shallow   the same chunk with kv context at 512 (matmul cost identical;
            attention minimal)
attn(D) = full − shallow; compared against the KV-stream floor
(B·D·n_kv·hd·2 dtypes) and the attention FLOPs' MXU time. Whichever is
larger is the binding resource; the gap to it is pipeline loss.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import numpy as np

import bench as B
import signal

signal.alarm(0)
from mistralrs_tpu.generate import _freeze
from mistralrs_tpu.models.llama import fuse_projections

cfg = B.llama8b_cfg()
fcfg = _freeze(cfg)
weights, wbytes = B.build_weights(cfg, seed=0)
weights = fuse_projections(weights, cfg)

PT, Bq = 512, 1


def emit(**kw):
    print(json.dumps(kw), flush=True)


_, _, t_shallow = B.measure_prefill(cfg, fcfg, weights, wbytes, PT, False)
emit(depth=PT, chunk_ms=round(t_shallow * 1e3, 2), note="shallow baseline")

for depth in (2048, 8192, 16384):
    try:
        tps, mfu, t_full = B.measure_prefill(
            cfg, fcfg, weights, wbytes, depth, False
        )
    except Exception as e:  # noqa: BLE001
        emit(depth=depth, error=f"{type(e).__name__}: {str(e)[:100]}")
        continue
    attn_ms = (t_full - t_shallow) * 1e3
    kv_bytes = cfg.num_layers * Bq * depth * cfg.num_kv_heads * cfg.head_dim * 2 * 2
    dma_floor_ms = kv_bytes / B.V5E_HBM_GBPS * 1e3
    attn_flops = 4 * PT * depth * cfg.num_heads * cfg.head_dim * cfg.num_layers
    mxu_floor_ms = attn_flops / B.V5E_BF16_FLOPS * 1e3
    bind = "dma" if dma_floor_ms > mxu_floor_ms else "mxu"
    floor = max(dma_floor_ms, mxu_floor_ms)
    emit(depth=depth, chunk_ms=round(t_full * 1e3, 2), mfu=round(mfu, 3),
         attn_ms=round(attn_ms, 2),
         kv_dma_floor_ms=round(dma_floor_ms, 2),
         attn_mxu_floor_ms=round(mxu_floor_ms, 2),
         binding=bind,
         attn_eff=round(floor / attn_ms, 3) if attn_ms > 0 else None)
