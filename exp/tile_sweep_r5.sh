#!/bin/bash
# matmul-chain tile sweep: fewer/bigger grid steps vs the 15MB VMEM budget
for cfg in "1024 2048 15" "2048 1024 15" "2048 2048 24" "1024 4096 24" "512 2048 15"; do
  set -- $cfg
  echo "=== TN=$1 TK=$2 VMEM=$3 ==="
  MRSTPU_MM_TN=$1 MRSTPU_MM_TK=$2 MRSTPU_MM_VMEM_MB=$3 \
    timeout 1200 python exp/plane_r5.py A 2>&1 | grep -E "A_f32|Error" | tail -2
done
