#!/usr/bin/env bash
# Full CPU test suite, split across a few pytest processes.
#
# One long-lived process accumulating hundreds of XLA CPU executables
# occasionally segfaults inside backend_compile on this 1-core box
# (observed at random tests; every test passes in isolation). Chunking
# bounds process lifetime and makes the failure point meaningful.
set -u
export JAX_PLATFORMS=cpu
export XLA_FLAGS=--xla_force_host_platform_device_count=8
cd "$(dirname "$0")/.."

mapfile -t FILES < <(ls tests/test_*.py)
n=${#FILES[@]}
chunks=${CHUNKS:-4}
fail=0
for ((i = 0; i < chunks; i++)); do
  group=()
  for ((j = i; j < n; j += chunks)); do
    group+=("${FILES[$j]}")
  done
  echo "=== chunk $((i + 1))/$chunks: ${#group[@]} files ==="
  timeout 1800 python -m pytest "${group[@]}" -q -p no:cacheprovider "$@" || fail=1
done
exit $fail
