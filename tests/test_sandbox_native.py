"""Native OS sandbox (csrc/sandbox.cpp via sandbox_native.py): seccomp
network filter + Landlock filesystem confinement — the analog of the
reference's `mistralrs-sandbox` (`mistralrs-sandbox/src/lib.rs:316`).

Each mechanism is probed first and the assertions are gated on what the
kernel actually offers, so the suite stays green in containers where
seccomp/Landlock are unavailable.
"""

import json
import subprocess
import sys
import textwrap

import pytest

from mistralrs_tpu import sandbox_native
from mistralrs_tpu.exec_tools import CodeExecutionManager, SandboxPolicy


def test_lib_builds_and_probes():
    if not sandbox_native.available():
        pytest.skip("native toolchain unavailable")
    got = sandbox_native.supported()
    assert got & sandbox_native.APPLIED_NO_NEW_PRIVS


def _run_child(code: str) -> dict:
    """Run `code` in a fresh interpreter; it must print one JSON line."""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_seccomp_blocks_inet_sockets():
    if not sandbox_native.available():
        pytest.skip("native toolchain unavailable")
    res = _run_child(textwrap.dedent("""
        import json, socket
        from mistralrs_tpu import sandbox_native as sn
        mask = sn.apply(block_network=True)
        inet_err = unix_ok = None
        try:
            socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            inet_err = "allowed"
        except OSError as e:
            inet_err = e.errno
        try:
            s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            s.close()
            unix_ok = True
        except OSError:
            unix_ok = False
        print(json.dumps({"mask": mask, "inet": inet_err, "unix": unix_ok}))
    """))
    if not res["mask"] & sandbox_native.APPLIED_SECCOMP_NET:
        pytest.skip("kernel refused seccomp filters")
    assert res["inet"] != "allowed" and res["inet"] is not None
    assert res["unix"] is True  # local IPC must survive


def test_landlock_confines_writes(tmp_path):
    if not sandbox_native.available():
        pytest.skip("native toolchain unavailable")
    if not sandbox_native.supported() & sandbox_native.APPLIED_LANDLOCK:
        pytest.skip("kernel without Landlock")
    allowed = tmp_path / "rw"
    allowed.mkdir()
    denied = tmp_path / "ro"
    denied.mkdir()
    res = _run_child(textwrap.dedent(f"""
        import json
        from mistralrs_tpu import sandbox_native as sn
        mask = sn.apply(block_network=False, rw_paths=[{str(allowed)!r}])
        ok = bad = read_ok = None
        try:
            open({str(allowed)!r} + "/f.txt", "w").write("x")
            ok = True
        except OSError:
            ok = False
        try:
            open({str(denied)!r} + "/f.txt", "w").write("x")
            bad = "allowed"
        except OSError as e:
            bad = e.errno
        try:
            open("/etc/hostname").close()
            read_ok = True
        except OSError:
            read_ok = False
        print(json.dumps({{"mask": mask, "ok": ok, "bad": bad,
                           "read_ok": read_ok}}))
    """))
    assert res["mask"] & sandbox_native.APPLIED_LANDLOCK
    assert res["ok"] is True
    assert res["bad"] != "allowed"
    assert res["read_ok"] is True  # system paths stay readable


def test_landlock_tolerates_file_rw_paths(tmp_path):
    """A non-directory in rw_paths (the default list includes /dev/null) must
    not fail Landlock: the kernel rejects directory-only access bits on file
    rules with EINVAL, so the binding masks them to file-compatible bits."""
    if not sandbox_native.available():
        pytest.skip("native toolchain unavailable")
    if not sandbox_native.supported() & sandbox_native.APPLIED_LANDLOCK:
        pytest.skip("kernel without Landlock")
    allowed = tmp_path / "rw"
    allowed.mkdir()
    res = _run_child(textwrap.dedent(f"""
        import json
        from mistralrs_tpu import sandbox_native as sn
        mask = sn.apply(block_network=False,
                        rw_paths=[{str(allowed)!r}, "/dev/null"])
        devnull_ok = dir_ok = None
        try:
            open("/dev/null", "w").write("x")
            devnull_ok = True
        except OSError:
            devnull_ok = False
        try:
            open({str(allowed)!r} + "/f.txt", "w").write("x")
            dir_ok = True
        except OSError:
            dir_ok = False
        print(json.dumps({{"mask": mask, "devnull_ok": devnull_ok,
                           "dir_ok": dir_ok}}))
    """))
    assert res["mask"] >= 0, "apply() hard-failed on a file rule"
    assert res["mask"] & sandbox_native.APPLIED_LANDLOCK
    assert res["devnull_ok"] is True
    assert res["dir_ok"] is True


def test_network_block_survives_fs_confinement(tmp_path):
    """Regression: configuring fs_ro/fs_rw used to hard-fail Landlock (file in
    the rw list) BEFORE the seccomp filter installed, silently disabling the
    whole sandbox. The net filter now installs first and file rules are
    masked, so the policy must still block sockets."""
    if not sandbox_native.available():
        pytest.skip("native toolchain unavailable")
    probe = _run_child(textwrap.dedent("""
        import json
        from mistralrs_tpu import sandbox_native as sn
        print(json.dumps({"mask": sn.apply(block_network=True)}))
    """))
    if not probe["mask"] & sandbox_native.APPLIED_SECCOMP_NET:
        pytest.skip("kernel refused seccomp filters")
    mgr = CodeExecutionManager(
        SandboxPolicy(block_network=True, workdir=str(tmp_path),
                      fs_rw=[str(tmp_path), "/tmp", "/dev/null"])
    )
    try:
        out = json.loads(mgr.tool_callbacks()["run_shell"]({
            "command": f"{sys.executable} -c 'import socket; socket.socket()'"
                       " && echo OPEN || echo BLOCKED"
        }))
    finally:
        mgr.close_all()
    assert "BLOCKED" in out["stdout"]


def test_shell_session_applies_network_block(tmp_path):
    if not sandbox_native.available():
        pytest.skip("native toolchain unavailable")
    probe = _run_child(textwrap.dedent("""
        import json
        from mistralrs_tpu import sandbox_native as sn
        print(json.dumps({"mask": sn.apply(block_network=True)}))
    """))
    if not probe["mask"] & sandbox_native.APPLIED_SECCOMP_NET:
        pytest.skip("kernel refused seccomp filters")
    mgr = CodeExecutionManager(
        SandboxPolicy(block_network=True, workdir=str(tmp_path))
    )
    try:
        out = json.loads(mgr.tool_callbacks()["run_shell"]({
            "command": f"{sys.executable} -c 'import socket; socket.socket()'"
                       " && echo OPEN || echo BLOCKED"
        }))
    finally:
        mgr.close_all()
    assert "BLOCKED" in out["stdout"]
