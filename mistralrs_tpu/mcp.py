"""MCP (Model Context Protocol) client — the analog of `mistralrs-mcp/`
(`McpClientConfig` multi-server config, transports in `transport.rs:125,466,
763`, tool discovery → engine tool callbacks).

Transports: Process (JSON-RPC over stdio), HTTP (JSON-RPC POST), and
WebSocket (JSON-RPC over an aiohttp WS connection).
Synchronous API (the engine's tool dispatch is host-side code); each call is
a request/response exchange.
"""

from __future__ import annotations

import json
import subprocess
import threading
import uuid
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

PROTOCOL_VERSION = "2024-11-05"


@dataclass
class McpServerConfig:
    name: str
    transport: str  # "process" | "http" | "websocket"
    command: Optional[list[str]] = None  # process
    url: Optional[str] = None  # http / websocket (ws:// or wss://)
    bearer_token: Optional[str] = None
    tool_prefix: Optional[str] = None


@dataclass
class McpClientConfig:
    servers: list[McpServerConfig] = field(default_factory=list)


class _ProcessTransport:
    def __init__(self, command: list[str]):
        self.proc = subprocess.Popen(
            command, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True, bufsize=1,
        )
        self._lock = threading.Lock()

    def request(self, method: str, params: Optional[dict] = None) -> Any:
        rid = uuid.uuid4().hex[:8]
        msg = {"jsonrpc": "2.0", "id": rid, "method": method, "params": params or {}}
        with self._lock:
            self.proc.stdin.write(json.dumps(msg) + "\n")
            self.proc.stdin.flush()
            while True:
                line = self.proc.stdout.readline()
                if not line:
                    raise ConnectionError("MCP server closed its stdout")
                try:
                    resp = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if resp.get("id") == rid:
                    if "error" in resp:
                        raise RuntimeError(f"MCP error: {resp['error']}")
                    return resp.get("result")

    def notify(self, method: str, params: Optional[dict] = None) -> None:
        msg = {"jsonrpc": "2.0", "method": method, "params": params or {}}
        with self._lock:
            self.proc.stdin.write(json.dumps(msg) + "\n")
            self.proc.stdin.flush()

    def close(self):
        try:
            self.proc.terminate()
        except OSError:
            pass


class _HttpTransport:
    def __init__(self, url: str, bearer_token: Optional[str] = None):
        self.url = url
        self.headers = {"Content-Type": "application/json"}
        if bearer_token:
            self.headers["Authorization"] = f"Bearer {bearer_token}"

    def request(self, method: str, params: Optional[dict] = None) -> Any:
        import urllib.request

        msg = {
            "jsonrpc": "2.0", "id": uuid.uuid4().hex[:8],
            "method": method, "params": params or {},
        }
        req = urllib.request.Request(
            self.url, data=json.dumps(msg).encode(), headers=self.headers
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            resp = json.loads(r.read())
        if "error" in resp:
            raise RuntimeError(f"MCP error: {resp['error']}")
        return resp.get("result")

    def notify(self, method: str, params: Optional[dict] = None) -> None:
        try:
            self.request(method, params)
        except Exception:  # noqa: BLE001
            pass

    def close(self):
        pass


class _WebSocketTransport:
    """JSON-RPC over a WebSocket (the analog of the reference's
    tokio-tungstenite transport, `mistralrs-mcp/src/transport.rs:466`).
    aiohttp's WS client runs on a dedicated event-loop thread behind the
    same synchronous request/notify facade as the other transports."""

    def __init__(self, url: str, bearer_token: Optional[str] = None,
                 timeout: float = 30.0):
        import asyncio

        import aiohttp

        self.timeout = timeout
        self._loop = asyncio.new_event_loop()
        self._thread = threading.Thread(target=self._loop.run_forever, daemon=True)
        self._thread.start()
        headers = {}
        if bearer_token:
            headers["Authorization"] = f"Bearer {bearer_token}"

        async def _connect():
            self._session = aiohttp.ClientSession()
            self._ws = await self._session.ws_connect(url, headers=headers)

        asyncio.run_coroutine_threadsafe(_connect(), self._loop).result(timeout)
        self._lock = threading.Lock()

    def _roundtrip(self, coro):
        import asyncio

        return asyncio.run_coroutine_threadsafe(coro, self._loop).result(
            self.timeout
        )

    def request(self, method: str, params: Optional[dict] = None) -> Any:
        rid = uuid.uuid4().hex[:8]
        msg = {"jsonrpc": "2.0", "id": rid, "method": method,
               "params": params or {}}

        async def _rt():
            await self._ws.send_json(msg)
            while True:
                resp = await self._ws.receive_json()
                if resp.get("id") == rid:
                    return resp

        with self._lock:  # one in-flight request per connection
            resp = self._roundtrip(_rt())
        if "error" in resp:
            raise RuntimeError(f"MCP error: {resp['error']}")
        return resp.get("result")

    def notify(self, method: str, params: Optional[dict] = None) -> None:
        msg = {"jsonrpc": "2.0", "method": method, "params": params or {}}
        with self._lock:
            self._roundtrip(self._ws.send_json(msg))

    def close(self):
        async def _close():
            await self._ws.close()
            await self._session.close()

        try:
            self._roundtrip(_close())
        except Exception:  # noqa: BLE001
            pass
        self._loop.call_soon_threadsafe(self._loop.stop)


@dataclass
class McpTool:
    server: str
    name: str
    qualified_name: str
    description: str
    input_schema: dict

    def to_openai(self) -> dict:
        return {
            "type": "function",
            "function": {
                "name": self.qualified_name,
                "description": self.description,
                "parameters": self.input_schema,
            },
        }


class McpClient:
    """Connects to the configured servers, discovers tools, dispatches calls."""

    def __init__(self, config: McpClientConfig):
        self.config = config
        self._transports: dict[str, Any] = {}
        self.tools: dict[str, McpTool] = {}

    def connect(self) -> None:
        for srv in self.config.servers:
            if srv.transport == "process":
                t = _ProcessTransport(srv.command)
            elif srv.transport == "http":
                t = _HttpTransport(srv.url, srv.bearer_token)
            elif srv.transport == "websocket":
                t = _WebSocketTransport(srv.url, srv.bearer_token)
            else:
                raise ValueError(f"unknown MCP transport {srv.transport!r}")
            t.request(
                "initialize",
                {
                    "protocolVersion": PROTOCOL_VERSION,
                    "capabilities": {},
                    "clientInfo": {"name": "mistralrs_tpu", "version": "0.1"},
                },
            )
            t.notify("notifications/initialized")
            self._transports[srv.name] = t
            result = t.request("tools/list")
            prefix = srv.tool_prefix or ""
            for tool in result.get("tools", []):
                qname = prefix + tool["name"]
                self.tools[qname] = McpTool(
                    server=srv.name,
                    name=tool["name"],
                    qualified_name=qname,
                    description=tool.get("description", ""),
                    input_schema=tool.get("inputSchema", {"type": "object"}),
                )

    def call_tool(self, qualified_name: str, arguments: dict) -> str:
        tool = self.tools.get(qualified_name)
        if tool is None:
            raise KeyError(f"unknown MCP tool {qualified_name!r}")
        t = self._transports[tool.server]
        result = t.request(
            "tools/call", {"name": tool.name, "arguments": arguments}
        )
        parts = []
        for item in result.get("content", []):
            if item.get("type") == "text":
                parts.append(item.get("text", ""))
            else:
                parts.append(json.dumps(item))
        return "\n".join(parts)

    def tool_callbacks(self) -> dict[str, Callable[[dict], str]]:
        """name → callable map for the agentic loop."""
        return {
            name: (lambda args, n=name: self.call_tool(n, args))
            for name in self.tools
        }

    def openai_tools(self) -> list[dict]:
        return [t.to_openai() for t in self.tools.values()]

    def close(self):
        for t in self._transports.values():
            t.close()
