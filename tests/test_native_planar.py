"""Native C++ planar decoder: bit-exact vs the numpy reference (the native
data-loader component; analog of the reference's CPU-reference kernel
tests)."""

import numpy as np
import pytest

from mistralrs_tpu.gguf import GGMLType, quantize
from mistralrs_tpu.gguf import native
from mistralrs_tpu.gguf.planar import _PLANARIZERS

TYPES = [GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q8_0, GGMLType.Q4_0]


@pytest.mark.skipif(not native.available(), reason="g++ toolchain unavailable")
@pytest.mark.parametrize("t", TYPES, ids=lambda t: t.name)
def test_native_matches_numpy(t):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((8, 1024), dtype=np.float32)
    raw = quantize(w, t)
    ref = _PLANARIZERS[t](raw)  # numpy reference, bypassing native
    q, s, b = native.decode(t.name, raw)
    np.testing.assert_array_equal(q, ref.q)
    np.testing.assert_array_equal(s, ref.scale)
    if ref.bias is None:
        assert b is None
    else:
        np.testing.assert_array_equal(b, ref.bias)


@pytest.mark.skipif(not native.available(), reason="g++ toolchain unavailable")
def test_native_speedup_sanity():
    """Native decode handles a large tensor and beats numpy comfortably."""
    import time

    rng = np.random.default_rng(1)
    w = rng.standard_normal((512, 4096), dtype=np.float32)
    raw = quantize(w, GGMLType.Q4_K)
    t0 = time.perf_counter()
    q, s, b = native.decode("Q4_K", raw)
    t_native = time.perf_counter() - t0
    # correctness on the large tensor (timing ratios flake under CPU
    # contention, so only sanity-bound the absolute time)
    assert q.size == raw.size // 144 * 256
    assert t_native < 5.0
