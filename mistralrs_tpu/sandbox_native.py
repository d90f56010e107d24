"""ctypes binding for the native OS sandbox (csrc/sandbox.cpp) — seccomp-BPF
network filtering + Landlock filesystem confinement for tool/code execution,
the analog of the reference's `mistralrs-sandbox` crate
(`mistralrs-sandbox/src/lib.rs:316`).

Compiled on first use with g++ (cached next to the source, same scheme as
`gguf/native.py`). Everything soft-degrades: if the toolchain, the .so, or a
kernel facility is missing, `apply(...)` reports what engaged and the rlimit
sandbox in `exec_tools.SandboxPolicy` still applies.

Intended call site is a subprocess ``preexec_fn`` (between fork and exec):
the restrictions are inherited by the exec'd child and all its descendants.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from pathlib import Path
from typing import Optional, Sequence

APPLIED_NO_NEW_PRIVS = 1
APPLIED_LANDLOCK = 2
APPLIED_SECCOMP_NET = 4

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = Path(__file__).resolve().parents[1] / "csrc" / "sandbox.cpp"


def _so_path() -> Path:
    # Cache key includes a source digest: a stale or foreign-architecture
    # blob can never be dlopen'd (committed binaries are also banned —
    # csrc/*.so is gitignored).
    import hashlib

    h = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    return _SRC.parent / f"sandbox-{h}.so"


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("MRSTPU_NO_NATIVE") or sys.platform != "linux":
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
        pp = ctypes.POINTER(ctypes.c_char_p)
        lib.mrs_sandbox_apply.argtypes = [
            ctypes.c_int, pp, ctypes.c_int, pp, ctypes.c_int,
        ]
        lib.mrs_sandbox_apply.restype = ctypes.c_int
        lib.mrs_sandbox_supported.argtypes = []
        lib.mrs_sandbox_supported.restype = ctypes.c_int
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def supported() -> int:
    """Bitmask of mechanisms this kernel offers (0 if the lib is missing)."""
    lib = _load()
    return lib.mrs_sandbox_supported() if lib is not None else 0


def default_ro_paths() -> list[str]:
    """System paths an interpreter needs read/execute access to."""
    cands = ["/usr", "/lib", "/lib64", "/bin", "/sbin", "/etc", "/opt",
             sys.prefix, sys.exec_prefix]
    seen, out = set(), []
    for p in cands:
        if p and p not in seen and os.path.exists(p):
            seen.add(p)
            out.append(p)
    return out


def _char_pp(paths: Sequence[str]):
    arr = (ctypes.c_char_p * max(len(paths), 1))()
    for i, p in enumerate(paths):
        arr[i] = os.fsencode(p)
    return ctypes.cast(arr, ctypes.POINTER(ctypes.c_char_p)), arr


def apply(
    *,
    block_network: bool = True,
    ro_paths: Optional[Sequence[str]] = None,
    rw_paths: Optional[Sequence[str]] = None,
) -> int:
    """Apply the sandbox to the CURRENT process (call from preexec_fn).

    ``ro_paths``/``rw_paths`` engage Landlock: the process may then only read
    beneath ``ro_paths`` and read/write beneath ``rw_paths``. Pass both as
    None to skip filesystem confinement. Returns the applied bitmask, or a
    negative errno if a supported mechanism failed hard.
    """
    lib = _load()
    if lib is None:
        return 0
    fs = ro_paths is not None or rw_paths is not None
    ro = list(ro_paths or (default_ro_paths() if fs else []))
    rw = list(rw_paths or [])
    ro_p, _keep1 = _char_pp(ro)
    rw_p, _keep2 = _char_pp(rw)
    return lib.mrs_sandbox_apply(
        1 if block_network else 0, ro_p, len(ro), rw_p, len(rw)
    )
