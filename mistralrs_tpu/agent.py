"""Agentic tool-execution loop (the analog of
`mistralrs-core/src/engine/agentic_loop.rs` + `tool_dispatch.rs`):
multi-round chat → parse tool calls → dispatch to callbacks → feed results
back → repeat until the model answers or the round budget runs out.

Decoupled from the engine through a ``chat_fn(messages, tools) -> str``
callable so it drives the local Engine, a remote OpenAI endpoint, or a test
stub identically.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Callable, Mapping, Optional, Sequence

from .tools import ToolCall, parse_tool_calls

ToolCallback = Callable[[dict], str]
ChatFn = Callable[[list[dict], Optional[list[dict]]], str]


@dataclass
class AgentResult:
    final_text: str
    messages: list[dict]
    rounds: int
    tool_calls_made: list[ToolCall] = field(default_factory=list)


def run_agent_loop(
    chat_fn: ChatFn,
    messages: Sequence[Mapping[str, Any]],
    tool_callbacks: Mapping[str, ToolCallback],
    *,
    tools_json: Optional[Sequence[dict]] = None,
    parser_family: str = "auto",
    max_rounds: int = 8,
    on_tool_call: Optional[Callable[[ToolCall, str], None]] = None,
) -> AgentResult:
    """Drive the tool loop. ``tools_json`` defaults to schemas synthesized
    from the callback names (no parameter info)."""
    history = [dict(m) for m in messages]
    if tools_json is None:
        tools_json = [
            {
                "type": "function",
                "function": {"name": name, "parameters": {"type": "object"}},
            }
            for name in tool_callbacks
        ]
    calls_made: list[ToolCall] = []
    for round_i in range(max_rounds):
        text = chat_fn(history, list(tools_json))
        calls = [
            c for c in parse_tool_calls(text, parser_family)
            if c.name in tool_callbacks
        ]
        if not calls:
            history.append({"role": "assistant", "content": text})
            return AgentResult(text, history, round_i + 1, calls_made)
        history.append(
            {
                "role": "assistant",
                "content": None,
                "tool_calls": [c.to_openai() for c in calls],
            }
        )
        for call in calls:
            calls_made.append(call)
            try:
                result = tool_callbacks[call.name](call.arguments)
            except Exception as e:  # noqa: BLE001 — feed errors to the model
                result = json.dumps({"error": str(e)})
            if on_tool_call is not None:
                on_tool_call(call, result)
            history.append(
                {
                    "role": "tool",
                    "tool_call_id": call.id,
                    "name": call.name,
                    "content": result,
                }
            )
    return AgentResult("", history, max_rounds, calls_made)


def engine_chat_fn(instance, sampling_params=None) -> ChatFn:
    """Build a chat_fn over a serving ModelInstance (registry.py)."""
    from .engine.sampler import SamplingParams

    params = sampling_params or SamplingParams(temperature=0.2, max_tokens=512)

    def chat(messages: list[dict], tools: Optional[list[dict]]) -> str:
        prompt = instance.chat_template.render(
            messages, add_generation_prompt=True, tools=tools
        )
        ids = instance.tokenizer.encode(prompt)
        seq = instance.engine.add_request(ids, params)
        instance.engine.run_to_completion()
        return instance.tokenizer.decode(seq.generated_ids)

    return chat


# -- session serialization (the analog of SerializedSession export/import,
# mistralrs-pyo3/src/lib.rs:2095-2114) -------------------------------------


def export_session(result_or_messages, path: str, metadata: Optional[dict] = None):
    """Save an agent conversation (AgentResult or message list) to JSON."""
    messages = (
        result_or_messages.messages
        if isinstance(result_or_messages, AgentResult)
        else list(result_or_messages)
    )
    payload = {"version": 1, "messages": messages, "metadata": metadata or {}}
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)


def import_session(path: str) -> tuple[list[dict], dict]:
    """Load a saved session → (messages, metadata)."""
    with open(path) as f:
        payload = json.load(f)
    if payload.get("version", 1) > 1:
        raise ValueError("session version newer than supported")
    return payload["messages"], payload.get("metadata", {})


# -- session store (the analog of AgenticSessionStore,
# mistralrs-core/src/engine/agentic_session.rs) -----------------------------


class AgentSessionStore:
    """In-memory agent conversation store: TTL + LRU eviction, action
    approvals, content-based matching for clients that don't send a
    session id, fork, and JSON export/import."""

    MAX_SESSIONS = 128
    TTL_S = 30 * 60

    def __init__(self):
        import time

        self._now = time.monotonic
        self._sessions: dict[str, dict] = {}  # id → {messages, t}
        self._approved: dict[str, float] = {}

    # -- lifecycle --
    def save(self, session_id: str, messages: list[dict]) -> None:
        self._evict()
        self._sessions[session_id] = {
            "messages": [dict(m) for m in messages], "t": self._now(),
        }

    def get(self, session_id: str) -> Optional[list[dict]]:
        e = self._sessions.get(session_id)
        if e is None or self._now() - e["t"] > self.TTL_S:
            self._sessions.pop(session_id, None)
            return None
        e["t"] = self._now()
        return [dict(m) for m in e["messages"]]

    def delete(self, session_id: str) -> bool:
        return self._sessions.pop(session_id, None) is not None

    def list_ids(self) -> list[str]:
        return sorted(self._sessions)

    def fork(self, src: str, dest: str, num_turns: int) -> None:
        """Copy the first `num_turns` user-visible turns of `src` to `dest`
        (tool messages riding along with their assistant turn)."""
        msgs = self.get(src)
        if msgs is None:
            raise KeyError(src)
        out: list[dict] = []
        users = 0
        for m in msgs:
            if m.get("role") == "user":
                if users == num_turns:
                    break
                users += 1
            out.append(m)
        self.save(dest, out)

    # -- approvals (side-effecting builtin tools are gated per session) --
    def approve(self, session_id: str) -> None:
        self._approved[session_id] = self._now()

    def approved(self, session_id: str) -> bool:
        t = self._approved.get(session_id)
        if t is None:
            return False
        if self._now() - t > self.TTL_S:
            del self._approved[session_id]
            return False
        return True

    # -- content matching (clients without a session id send the whole
    # history back; match on the longest saved prefix of user-visible
    # messages, agentic_session.rs find_by_messages) --
    def find_by_messages(self, messages: list[dict]) -> Optional[str]:
        def visible(ms):
            return [
                (m.get("role"), str(m.get("content")))
                for m in ms
                if m.get("role") in ("user", "assistant") and m.get("content")
            ]

        want = visible(messages)
        best, best_len = None, 0
        for sid, e in self._sessions.items():
            have = visible(e["messages"])
            if len(have) <= len(want) and want[: len(have)] == have:
                if len(have) > best_len:
                    best, best_len = sid, len(have)
        return best

    def _evict(self):
        now = self._now()
        dead = [k for k, e in self._sessions.items() if now - e["t"] > self.TTL_S]
        for k in dead:
            del self._sessions[k]
        while len(self._sessions) >= self.MAX_SESSIONS:
            oldest = min(self._sessions, key=lambda k: self._sessions[k]["t"])
            del self._sessions[oldest]


# -- builtin tools (the analog of the reference's code-exec / file /
# search builtins dispatched by the agentic loop) ---------------------------

SIDE_EFFECT_TOOLS = {"execute_python", "write_file", "shell"}


def builtin_tool_callbacks(
    *,
    file_store=None,
    exec_manager=None,
    searcher=None,
    workdir: Optional[str] = None,
) -> dict[str, ToolCallback]:
    """Assemble the builtin tool set: file read/list/write (FileStore or a
    sandboxed workdir), python code execution (CodeExecutionManager), and
    web search. Pass the pieces you want enabled."""
    import os

    tools: dict[str, ToolCallback] = {}

    if workdir is not None:
        root = os.path.realpath(workdir)

        def _safe(rel: str) -> str:
            p = os.path.realpath(os.path.join(root, rel))
            if not p.startswith(root + os.sep) and p != root:
                raise ValueError(f"path escapes the workdir: {rel!r}")
            return p

        def read_file(args: dict) -> str:
            with open(_safe(str(args.get("path", ""))), "r") as f:
                return f.read()[: int(args.get("max_bytes", 65536))]

        def list_files(args: dict) -> str:
            base = _safe(str(args.get("path", ".")))
            out = []
            for dirpath, _dirs, files in os.walk(base):
                rel = os.path.relpath(dirpath, root)
                for fn in files:
                    out.append(os.path.join(rel, fn).removeprefix("./"))
            return json.dumps(sorted(out)[:500])

        def write_file(args: dict) -> str:
            p = _safe(str(args["path"]))
            os.makedirs(os.path.dirname(p) or root, exist_ok=True)
            with open(p, "w") as f:
                f.write(str(args.get("content", "")))
            return json.dumps({"written": args["path"]})

        tools["read_file"] = read_file
        tools["list_files"] = list_files
        tools["write_file"] = write_file
    elif file_store is not None:
        def _fs_read(a: dict) -> str:
            data = file_store.get(str(a.get("path", "")))
            if data is None:
                return json.dumps({"error": "no such file"})
            return data.decode("utf-8", errors="replace")

        tools["read_file"] = _fs_read
        tools["list_files"] = lambda a: json.dumps(file_store.list())
        tools["write_file"] = lambda a: json.dumps({
            "written": file_store.put(
                str(a["path"]), str(a.get("content", "")).encode()
            )
        })

    if exec_manager is not None:
        def execute_python(args: dict) -> str:
            r = exec_manager.execute(
                str(args.get("code", "")), session_id=args.get("session_id")
            )
            return json.dumps(r)

        tools["execute_python"] = execute_python

    if searcher is not None:
        def web_search(args: dict) -> str:
            results = searcher.search(
                str(args.get("query", "")), n_results=int(args.get("n", 5))
            )
            return json.dumps([
                {"title": r.title, "url": r.url, "snippet": r.snippet}
                for r in results
            ])

        tools["web_search"] = web_search

    return tools


def gate_side_effects(
    callbacks: Mapping[str, ToolCallback],
    approved: Callable[[], bool],
) -> dict[str, ToolCallback]:
    """Wrap side-effecting builtins so they refuse until the session is
    approved (the reference's approve_agent_actions gating)."""
    out: dict[str, ToolCallback] = {}
    for name, fn in callbacks.items():
        if name in SIDE_EFFECT_TOOLS:
            def gated(args, _fn=fn, _name=name):
                if not approved():
                    return json.dumps({
                        "error": f"tool {_name!r} requires approval; approve "
                        "the session first (POST /v1/agent/sessions/{id}/approve)",
                    })
                return _fn(args)

            out[name] = gated
        else:
            out[name] = fn
    return out
