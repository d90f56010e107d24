"""ctypes binding for the native GGUF→planar decoder (csrc/planar.cpp) —
the host-side native component of the load pipeline (the analog of the
reference's native repack kernels run at load).

Compiled on first use with g++ (cached next to the source); every decode
falls back to the numpy reference if the toolchain or the .so is missing.
Bit-exactness vs the numpy path is enforced by tests/test_native_planar.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = Path(__file__).resolve().parents[2] / "csrc" / "planar.cpp"


def _so_path() -> Path:
    # Artifact name carries a source digest so a stale or foreign-arch blob
    # can never be dlopen'd; csrc/*.so is gitignored, always built locally.
    import hashlib

    h = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    return _SRC.parent / f"planar-{h}.so"


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("MRSTPU_NO_NATIVE"):
            return None
        try:
            so = _so_path()
            if not so.exists():
                tmp = so.with_suffix(f".tmp{os.getpid()}")
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", str(tmp), str(_SRC)],
                    check=True, capture_output=True, timeout=120,
                )
                os.replace(tmp, so)
            lib = ctypes.CDLL(str(so))
        except (OSError, subprocess.SubprocessError, FileNotFoundError):
            return None
        u8 = ctypes.POINTER(ctypes.c_uint8)
        i8 = ctypes.POINTER(ctypes.c_int8)
        f32 = ctypes.POINTER(ctypes.c_float)
        i64 = ctypes.c_int64
        lib.planar_q4_k.argtypes = [u8, i64, u8, f32, f32]
        lib.planar_q5_k.argtypes = [u8, i64, u8, f32, f32]
        lib.planar_q6_k.argtypes = [u8, i64, i8, f32]
        lib.planar_q8_0.argtypes = [u8, i64, i8, f32]
        lib.planar_q4_0.argtypes = [u8, i64, u8, f32, f32]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def decode(t_name: str, raw: np.ndarray):
    """Native planar decode. Returns (q, scale, bias|None) or None if the
    native library is unavailable or the type unsupported."""
    lib = _load()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, dtype=np.uint8).reshape(-1)
    if t_name == "Q4_K":
        n = raw.size // 144
        q = np.empty(n * 256, np.uint8)
        s = np.empty(n * 8, np.float32)
        b = np.empty(n * 8, np.float32)
        lib.planar_q4_k(_ptr(raw, ctypes.c_uint8), n, _ptr(q, ctypes.c_uint8),
                        _ptr(s, ctypes.c_float), _ptr(b, ctypes.c_float))
        return q, s, b
    if t_name == "Q5_K":
        n = raw.size // 176
        q = np.empty(n * 256, np.uint8)
        s = np.empty(n * 8, np.float32)
        b = np.empty(n * 8, np.float32)
        lib.planar_q5_k(_ptr(raw, ctypes.c_uint8), n, _ptr(q, ctypes.c_uint8),
                        _ptr(s, ctypes.c_float), _ptr(b, ctypes.c_float))
        return q, s, b
    if t_name == "Q6_K":
        n = raw.size // 210
        q = np.empty(n * 256, np.int8)
        s = np.empty(n * 16, np.float32)
        lib.planar_q6_k(_ptr(raw, ctypes.c_uint8), n, _ptr(q, ctypes.c_int8),
                        _ptr(s, ctypes.c_float))
        return q, s, None
    if t_name == "Q8_0":
        n = raw.size // 34
        q = np.empty(n * 32, np.int8)
        s = np.empty(n, np.float32)
        lib.planar_q8_0(_ptr(raw, ctypes.c_uint8), n, _ptr(q, ctypes.c_int8),
                        _ptr(s, ctypes.c_float))
        return q, s, None
    if t_name == "Q4_0":
        n = raw.size // 18
        q = np.empty(n * 32, np.uint8)
        s = np.empty(n, np.float32)
        b = np.empty(n, np.float32)
        lib.planar_q4_0(_ptr(raw, ctypes.c_uint8), n, _ptr(q, ctypes.c_uint8),
                        _ptr(s, ctypes.c_float), _ptr(b, ctypes.c_float))
        return q, s, b
    return None
