"""Code-exec sessions, sandbox limits, file store (analog of the reference's
code-exec/sandbox test coverage)."""

import json

from mistralrs_tpu.exec_tools import (
    CodeExecutionManager,
    FileStore,
    PythonSession,
    SandboxPolicy,
)


def test_persistent_session_state():
    s = PythonSession()
    try:
        r1 = s.execute("x = 40")
        assert r1["error"] is None
        r2 = s.execute("x + 2")
        assert r2["output"].strip() == "42"
    finally:
        s.close()


def test_errors_are_captured():
    s = PythonSession()
    try:
        r = s.execute("1/0")
        assert r["error"] and "ZeroDivisionError" in r["error"]
    finally:
        s.close()


def test_manager_sessions_isolated():
    m = CodeExecutionManager()
    try:
        r1 = m.execute("y = 1")
        r2 = m.execute("y", session_id=None)  # new session
        assert r2["error"] and "NameError" in r2["error"]
        r3 = m.execute("y", session_id=r1["session_id"])
        assert r3["output"].strip() == "1"
    finally:
        m.close_all()


def test_tool_callbacks():
    m = CodeExecutionManager()
    try:
        cbs = m.tool_callbacks()
        out = json.loads(cbs["execute_python"]({"code": "print('hi')"}))
        assert out["output"].strip() == "hi"
        sh = json.loads(cbs["run_shell"]({"command": "echo shell-ok"}))
        assert sh["stdout"].strip() == "shell-ok"
        assert sh["returncode"] == 0
    finally:
        m.close_all()


def test_sandbox_env_cleared():
    import os

    os.environ["SECRET_TOKEN_XYZ"] = "leak"
    try:
        s = PythonSession(SandboxPolicy(clear_env=True))
        r = s.execute("import os; os.environ.get('SECRET_TOKEN_XYZ')")
        assert "leak" not in r["output"]
        s.close()
    finally:
        del os.environ["SECRET_TOKEN_XYZ"]


def test_file_store():
    fs = FileStore(max_bytes=1024)
    fs.put("a.txt", b"hello")
    assert fs.get("a.txt") == b"hello"
    assert fs.list() == [{"name": "a.txt", "size": 5}]
    assert fs.delete("a.txt")
    assert fs.get("a.txt") is None
    try:
        fs.put("big", b"x" * 2048)
        raise AssertionError("should have rejected oversized file")
    except ValueError:
        pass
