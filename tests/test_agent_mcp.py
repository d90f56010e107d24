"""Agentic loop + MCP client (stdio server fixture), analog of the
reference's mcp/ and engine/agentic_loop coverage."""

import json
import sys
import textwrap

import pytest

from mistralrs_tpu.agent import run_agent_loop
from mistralrs_tpu.mcp import McpClient, McpClientConfig, McpServerConfig

MCP_SERVER = textwrap.dedent(
    """
    import json, sys
    TOOLS = [{"name": "add", "description": "add two ints",
              "inputSchema": {"type": "object",
                              "properties": {"a": {"type": "integer"},
                                             "b": {"type": "integer"}}}}]
    for line in sys.stdin:
        try:
            msg = json.loads(line)
        except Exception:
            continue
        mid = msg.get("id")
        m = msg.get("method")
        if mid is None:
            continue  # notification
        if m == "initialize":
            out = {"protocolVersion": "2024-11-05", "capabilities": {},
                   "serverInfo": {"name": "toy", "version": "0"}}
        elif m == "tools/list":
            out = {"tools": TOOLS}
        elif m == "tools/call":
            p = msg["params"]["arguments"]
            out = {"content": [{"type": "text",
                                "text": str(p["a"] + p["b"])}]}
        else:
            out = {}
        sys.stdout.write(json.dumps({"jsonrpc": "2.0", "id": mid,
                                     "result": out}) + "\\n")
        sys.stdout.flush()
    """
)


def test_mcp_process_transport(tmp_path):
    srv = tmp_path / "server.py"
    srv.write_text(MCP_SERVER)
    client = McpClient(
        McpClientConfig(servers=[
            McpServerConfig(name="toy", transport="process",
                            command=[sys.executable, str(srv)]),
        ])
    )
    client.connect()
    try:
        assert "add" in client.tools
        assert client.tools["add"].to_openai()["function"]["name"] == "add"
        assert client.call_tool("add", {"a": 2, "b": 40}) == "42"
        cbs = client.tool_callbacks()
        assert cbs["add"]({"a": 1, "b": 1}) == "2"
    finally:
        client.close()


def test_agent_loop_scripted_model():
    """The loop dispatches calls and feeds results until the model answers."""
    rounds = []

    def fake_chat(messages, tools):
        rounds.append(list(messages))
        if len(rounds) == 1:
            return '{"name": "get_time", "parameters": {}}'
        # second round: model sees the tool result
        tool_msgs = [m for m in messages if m.get("role") == "tool"]
        assert tool_msgs and tool_msgs[-1]["content"] == "12:00"
        return "It is noon."

    result = run_agent_loop(
        fake_chat,
        [{"role": "user", "content": "What time is it?"}],
        {"get_time": lambda args: "12:00"},
        parser_family="llama",
    )
    assert result.final_text == "It is noon."
    assert result.rounds == 2
    assert [c.name for c in result.tool_calls_made] == ["get_time"]


def test_agent_loop_tool_error_fed_back():
    def fake_chat(messages, tools):
        if not any(m.get("role") == "tool" for m in messages):
            return '{"name": "boom", "parameters": {}}'
        tool_msg = [m for m in messages if m.get("role") == "tool"][-1]
        assert "error" in json.loads(tool_msg["content"])
        return "The tool failed."

    def boom(args):
        raise RuntimeError("kaput")

    result = run_agent_loop(
        fake_chat,
        [{"role": "user", "content": "go"}],
        {"boom": boom},
        parser_family="llama",
    )
    assert result.final_text == "The tool failed."


def test_agent_loop_round_budget():
    def always_call(messages, tools):
        return '{"name": "noop", "parameters": {}}'

    result = run_agent_loop(
        always_call,
        [{"role": "user", "content": "loop"}],
        {"noop": lambda a: "ok"},
        parser_family="llama",
        max_rounds=3,
    )
    assert result.rounds == 3
    assert len(result.tool_calls_made) == 3


def test_agent_session_store():
    from mistralrs_tpu.agent import AgentSessionStore

    store = AgentSessionStore()
    msgs = [
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": None,
         "tool_calls": [{"id": "c1", "type": "function",
                         "function": {"name": "t", "arguments": "{}"}}]},
        {"role": "tool", "tool_call_id": "c1", "name": "t", "content": "ok"},
        {"role": "assistant", "content": "done"},
        {"role": "user", "content": "more"},
        {"role": "assistant", "content": "sure"},
    ]
    store.save("s1", msgs)
    assert store.get("s1") == msgs
    assert store.list_ids() == ["s1"]

    # content-based matching: client resends user-visible history + new turn
    client_view = [
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "done"},
        {"role": "user", "content": "more"},
        {"role": "assistant", "content": "sure"},
        {"role": "user", "content": "next question"},
    ]
    assert store.find_by_messages(client_view) == "s1"

    # fork keeps only the first N user turns (with their tool messages)
    store.fork("s1", "s2", 1)
    forked = store.get("s2")
    assert [m["role"] for m in forked] == ["user", "assistant", "tool", "assistant"]

    # approvals
    assert not store.approved("s1")
    store.approve("s1")
    assert store.approved("s1")
    assert store.delete("s1") and store.get("s1") is None


def test_builtin_tools_and_approval_gating(tmp_path):
    import json as _json

    from mistralrs_tpu.agent import (
        AgentSessionStore,
        builtin_tool_callbacks,
        gate_side_effects,
    )
    from mistralrs_tpu.exec_tools import CodeExecutionManager

    (tmp_path / "a.txt").write_text("hello")
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "b.txt").write_text("world")
    mgr = CodeExecutionManager()
    tools = builtin_tool_callbacks(workdir=str(tmp_path), exec_manager=mgr)

    assert tools["read_file"]({"path": "a.txt"}) == "hello"
    listing = _json.loads(tools["list_files"]({"path": "."}))
    assert "a.txt" in listing and "sub/b.txt" in listing
    # path escape rejected
    try:
        tools["read_file"]({"path": "../etc/passwd"})
        assert False, "escape allowed"
    except ValueError:
        pass

    store = AgentSessionStore()
    gated = gate_side_effects(tools, approved=lambda: store.approved("sx"))
    out = _json.loads(gated["write_file"]({"path": "c.txt", "content": "x"}))
    assert "error" in out and "approval" in out["error"]
    assert _json.loads(gated["execute_python"]({"code": "print(1)"})).get("error")
    store.approve("sx")
    out = _json.loads(gated["write_file"]({"path": "c.txt", "content": "x"}))
    assert out == {"written": "c.txt"}
    r = _json.loads(gated["execute_python"]({"code": "print(40+2)"}))
    assert "42" in r.get("output", "")
    mgr.close_all()


async def test_websocket_mcp_transport(aiohttp_server):
    """WebSocket MCP server (JSON-RPC over WS) → tool discovery + call
    (the analog of the reference's tokio-tungstenite transport,
    mistralrs-mcp/src/transport.rs:466)."""
    from aiohttp import web

    from mistralrs_tpu.mcp import McpClient, McpClientConfig, McpServerConfig

    async def ws_handler(request):
        assert request.headers.get("Authorization") == "Bearer sekrit"
        ws = web.WebSocketResponse()
        await ws.prepare(request)
        async for msg in ws:
            req = json.loads(msg.data)
            method = req.get("method")
            if "id" not in req:
                continue  # notification
            if method == "initialize":
                result = {"protocolVersion": "2024-11-05"}
            elif method == "tools/list":
                result = {"tools": [{
                    "name": "add",
                    "description": "adds",
                    "inputSchema": {"type": "object"},
                }]}
            elif method == "tools/call":
                a = req["params"]["arguments"]
                result = {"content": [{"type": "text",
                                       "text": str(a["x"] + a["y"])}]}
            else:
                result = {}
            await ws.send_json({"jsonrpc": "2.0", "id": req["id"],
                                "result": result})
        return ws

    app = web.Application()
    app.router.add_get("/mcp", ws_handler)
    server = await aiohttp_server(app)
    url = f"ws://127.0.0.1:{server.port}/mcp"

    import asyncio

    def sync_part():
        client = McpClient(McpClientConfig(servers=[
            McpServerConfig(name="wss", transport="websocket", url=url,
                            bearer_token="sekrit", tool_prefix="ws_"),
        ]))
        client.connect()
        assert "ws_add" in client.tools
        out = client.call_tool("ws_add", {"x": 2, "y": 40})
        client.close()
        return out

    out = await asyncio.get_event_loop().run_in_executor(None, sync_part)
    assert out == "42"
