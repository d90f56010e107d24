"""Code-execution + shell tools with OS-level sandboxing — the analog of
`mistralrs-code-exec/` (`CodeExecutionManager`, persistent per-session
interpreters, lib.rs:187) and `mistralrs-sandbox/` (resource/namespace
limits, lib.rs:155,316).

Python sessions are persistent subprocess REPLs (state survives across
calls, like the reference's per-session interpreter); the sandbox applies
rlimits (CPU, memory, file size, process count), strips the environment, and
— via the native layer (`sandbox_native.py` / `csrc/sandbox.cpp`) — installs
a seccomp-BPF filter that denies internet-family sockets and, when filesystem
paths are configured, a Landlock ruleset confining reads/writes to them
(the direct analog of `mistralrs-sandbox/src/lib.rs:316`). Each native
mechanism soft-degrades if the kernel or toolchain lacks it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap
import threading
import uuid
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class SandboxPolicy:
    cpu_seconds: Optional[int] = 30
    memory_bytes: Optional[int] = 1 << 31  # 2 GiB
    file_size_bytes: Optional[int] = 1 << 26  # 64 MiB
    max_processes: Optional[int] = 32
    clear_env: bool = True
    workdir: Optional[str] = None
    #: deny AF_INET/AF_INET6/AF_NETLINK/AF_PACKET socket creation (seccomp;
    #: EPERM, not kill). AF_UNIX and pipes keep working.
    block_network: bool = True
    #: Landlock filesystem confinement. Leave BOTH as None to skip (default:
    #: sessions may read/write anywhere rlimits allow). Set either to engage:
    #: fs_ro defaults to the interpreter's system paths, fs_rw to
    #: [workdir or cwd, /tmp].
    fs_ro: Optional[list] = None
    fs_rw: Optional[list] = None

    def preexec(self):
        import resource

        from . import sandbox_native

        # Load (and if needed compile) the native lib in the PARENT: dlopen
        # between fork and exec can deadlock under threads.
        native = sandbox_native.available()
        fs = self.fs_ro is not None or self.fs_rw is not None
        ro = rw = None
        if fs:
            ro = list(self.fs_ro) if self.fs_ro is not None \
                else sandbox_native.default_ro_paths()
            rw = list(self.fs_rw) if self.fs_rw is not None \
                else [self.workdir or os.getcwd(), "/tmp", "/dev/null"]

        def fn():
            if self.cpu_seconds:
                resource.setrlimit(
                    resource.RLIMIT_CPU, (self.cpu_seconds, self.cpu_seconds)
                )
            if self.memory_bytes:
                try:
                    resource.setrlimit(
                        resource.RLIMIT_AS, (self.memory_bytes, self.memory_bytes)
                    )
                except (ValueError, OSError):
                    pass
            if self.file_size_bytes:
                resource.setrlimit(
                    resource.RLIMIT_FSIZE,
                    (self.file_size_bytes, self.file_size_bytes),
                )
            if self.max_processes:
                try:
                    resource.setrlimit(
                        resource.RLIMIT_NPROC,
                        (self.max_processes, self.max_processes),
                    )
                except (ValueError, OSError):
                    pass
            os.setsid()
            if native and (self.block_network or fs):
                rc = sandbox_native.apply(
                    block_network=self.block_network,
                    ro_paths=ro, rw_paths=rw,
                )
                if rc < 0:
                    # Fail CLOSED: a supported mechanism errored (-errno).
                    # Raising here aborts the spawn in the parent rather than
                    # running the tool with a silently-disabled sandbox.
                    raise OSError(
                        -rc, f"native sandbox failed: {os.strerror(-rc)}"
                    )

        return fn

    def env(self) -> dict:
        if not self.clear_env:
            return dict(os.environ)
        keep = ("PATH", "HOME", "LANG", "TMPDIR")
        return {k: os.environ[k] for k in keep if k in os.environ}


_REPL_DRIVER = textwrap.dedent(
    """
    import io, json, sys, traceback, contextlib
    ns = {"__name__": "__main__"}
    for line in sys.stdin:
        try:
            req = json.loads(line)
        except Exception:
            continue
        buf = io.StringIO()
        err = None
        try:
            with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
                code = req["code"]
                try:
                    # expression? show its value like a REPL
                    result = eval(compile(code, "<cell>", "eval"), ns)
                    if result is not None:
                        print(repr(result))
                except SyntaxError:
                    exec(compile(code, "<cell>", "exec"), ns)
        except SystemExit:
            err = "SystemExit"
        except Exception:
            err = traceback.format_exc()
        sys.stdout.write(json.dumps({"id": req["id"], "output": buf.getvalue(),
                                     "error": err}) + "\\n")
        sys.stdout.flush()
    """
)


class PythonSession:
    """One persistent sandboxed Python interpreter."""

    def __init__(self, policy: Optional[SandboxPolicy] = None):
        self.policy = policy or SandboxPolicy()
        self.session_id = uuid.uuid4().hex[:12]
        self.proc = subprocess.Popen(
            [sys.executable, "-I", "-c", _REPL_DRIVER],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True, bufsize=1,
            preexec_fn=self.policy.preexec(),
            env=self.policy.env(),
            cwd=self.policy.workdir,
        )
        self._lock = threading.Lock()

    def execute(self, code: str, timeout: float = 30.0) -> dict:
        """Run code; returns {"output", "error"}. State persists."""
        rid = uuid.uuid4().hex[:8]
        with self._lock:
            if self.proc.poll() is not None:
                return {"output": "", "error": "session terminated"}
            self.proc.stdin.write(json.dumps({"id": rid, "code": code}) + "\n")
            self.proc.stdin.flush()
            timer = threading.Timer(timeout, self._kill)
            timer.start()
            try:
                while True:
                    line = self.proc.stdout.readline()
                    if not line:
                        return {"output": "", "error": "session terminated (timeout or crash)"}
                    try:
                        resp = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if resp.get("id") == rid:
                        return {"output": resp["output"], "error": resp["error"]}
            finally:
                timer.cancel()

    def _kill(self):
        try:
            self.proc.kill()
        except OSError:
            pass

    def close(self):
        self._kill()


class CodeExecutionManager:
    """Session registry (CodeExecutionManager analog, code-exec lib.rs:187)."""

    def __init__(self, policy: Optional[SandboxPolicy] = None):
        self.policy = policy
        self._sessions: dict[str, PythonSession] = {}
        self._lock = threading.Lock()

    def get_or_create(self, session_id: Optional[str] = None) -> PythonSession:
        with self._lock:
            if session_id and session_id in self._sessions:
                return self._sessions[session_id]
            s = PythonSession(self.policy)
            self._sessions[s.session_id] = s
            return s

    def execute(self, code: str, session_id: Optional[str] = None,
                timeout: float = 30.0) -> dict:
        s = self.get_or_create(session_id)
        out = s.execute(code, timeout)
        out["session_id"] = s.session_id
        return out

    def close_all(self):
        with self._lock:
            for s in self._sessions.values():
                s.close()
            self._sessions.clear()

    def tool_callbacks(self) -> dict:
        """Callbacks for the agentic loop: execute_python, run_shell."""

        def execute_python(args: dict) -> str:
            r = self.execute(args.get("code", ""), args.get("session_id"))
            out = r["output"]
            if r["error"]:
                out += "\n" + r["error"]
            return json.dumps({"output": out, "session_id": r["session_id"]})

        def run_shell(args: dict) -> str:
            policy = self.policy or SandboxPolicy()
            try:
                r = subprocess.run(
                    ["/bin/sh", "-c", args.get("command", "")],
                    capture_output=True, text=True, timeout=30,
                    preexec_fn=policy.preexec(), env=policy.env(),
                    cwd=policy.workdir,
                )
                return json.dumps(
                    {"stdout": r.stdout[-20000:], "stderr": r.stderr[-4000:],
                     "returncode": r.returncode}
                )
            except subprocess.TimeoutExpired:
                return json.dumps({"error": "timeout"})

        return {"execute_python": execute_python, "run_shell": run_shell}


class FileStore:
    """In-memory file store for agent-produced files (the analog of
    `mistralrs-core/src/files/store.rs`)."""

    def __init__(self, max_bytes: int = 64 << 20):
        self._files: dict[str, bytes] = {}
        self._lock = threading.Lock()
        self.max_bytes = max_bytes

    def put(self, name: str, data: bytes) -> str:
        with self._lock:
            total = sum(len(v) for v in self._files.values()) + len(data)
            if total > self.max_bytes:
                raise ValueError("file store full")
            self._files[name] = bytes(data)
        return name

    def get(self, name: str) -> Optional[bytes]:
        with self._lock:
            return self._files.get(name)

    def list(self) -> list[dict]:
        with self._lock:
            return [{"name": k, "size": len(v)} for k, v in self._files.items()]

    def delete(self, name: str) -> bool:
        with self._lock:
            return self._files.pop(name, None) is not None
