#!/bin/sh
for v in cur f32dot bf16mul groupdot; do
  echo "=== variant $v ==="
  MRSTPU_MM_VARIANT=$v MRSTPU_BENCH_SWEEP=0 timeout 1200 python bench.py 2>&1 | grep -v WARNING | tail -1
done
