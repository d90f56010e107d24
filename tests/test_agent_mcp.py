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
