"""MCP *server* mode — expose a loaded model as an MCP tool server (the
analog of `mistralrs-server-core/src/mcp_server.rs`).

Speaks JSON-RPC over stdio (the transport every MCP host supports): offers a
``chat`` tool (messages → completion) and a ``tokenize`` tool.
"""

from __future__ import annotations

import json
import sys
from typing import Any, Optional

PROTOCOL_VERSION = "2024-11-05"

CHAT_TOOL = {
    "name": "chat",
    "description": "Generate a chat completion with the loaded model.",
    "inputSchema": {
        "type": "object",
        "properties": {
            "messages": {
                "type": "array",
                "items": {
                    "type": "object",
                    "properties": {
                        "role": {"type": "string"},
                        "content": {"type": "string"},
                    },
                    "required": ["role", "content"],
                },
            },
            "max_tokens": {"type": "integer", "default": 512},
            "temperature": {"type": "number", "default": 0.7},
        },
        "required": ["messages"],
    },
}

TOKENIZE_TOOL = {
    "name": "tokenize",
    "description": "Tokenize text with the model tokenizer.",
    "inputSchema": {
        "type": "object",
        "properties": {"text": {"type": "string"}},
        "required": ["text"],
    },
}


class McpModelServer:
    """Serves one ModelInstance over stdio JSON-RPC."""

    def __init__(self, instance, name: str = "mistralrs_tpu"):
        self.instance = instance
        self.name = name

    def _handle(self, method: str, params: dict) -> Optional[dict]:
        if method == "initialize":
            return {
                "protocolVersion": PROTOCOL_VERSION,
                "capabilities": {"tools": {}},
                "serverInfo": {"name": self.name, "version": "0.1"},
            }
        if method == "tools/list":
            return {"tools": [CHAT_TOOL, TOKENIZE_TOOL]}
        if method == "tools/call":
            name = params.get("name")
            args = params.get("arguments", {})
            if name == "chat":
                text = self._chat(args)
            elif name == "tokenize":
                ids = self.instance.tokenizer.encode(args["text"])
                text = json.dumps(ids)
            else:
                raise KeyError(f"unknown tool {name!r}")
            return {"content": [{"type": "text", "text": text}]}
        if method == "ping":
            return {}
        raise KeyError(f"unknown method {method!r}")

    def _chat(self, args: dict) -> str:
        from ..engine.sampler import SamplingParams

        inst = self.instance
        prompt = inst.chat_template.render(
            args["messages"], add_generation_prompt=True
        )
        ids = inst.tokenizer.encode(prompt)
        seq = inst.engine.add_request(
            ids,
            SamplingParams(
                temperature=float(args.get("temperature", 0.7)),
                max_tokens=int(args.get("max_tokens", 512)),
            ),
        )
        inst.engine.run_to_completion()
        return inst.tokenizer.decode(seq.generated_ids)

    def serve_streams(self, rfile, wfile) -> None:
        """Blocking JSON-RPC loop over the given text streams."""
        for line in rfile:
            try:
                msg = json.loads(line)
            except json.JSONDecodeError:
                continue
            mid = msg.get("id")
            if mid is None:  # notification
                continue
            try:
                result = self._handle(msg.get("method", ""), msg.get("params") or {})
                resp: dict[str, Any] = {"jsonrpc": "2.0", "id": mid, "result": result}
            except Exception as e:  # noqa: BLE001
                resp = {
                    "jsonrpc": "2.0", "id": mid,
                    "error": {"code": -32000, "message": str(e)},
                }
            wfile.write(json.dumps(resp) + "\n")
            wfile.flush()

    def serve_stdio(self) -> None:
        self.serve_streams(sys.stdin, sys.stdout)
