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
