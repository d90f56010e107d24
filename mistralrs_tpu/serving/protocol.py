"""OpenAI + Anthropic wire types (the analog of the reference's request/
response serde in `mistralrs-server-core/src/{chat_completion,anthropic}.rs`).
"""

from __future__ import annotations

import time
import uuid
from typing import Any, Literal, Optional, Union

from pydantic import BaseModel, Field


class ChatMessage(BaseModel):
    role: str
    content: Optional[Union[str, list[dict[str, Any]]]] = None
    name: Optional[str] = None
    tool_calls: Optional[list[dict[str, Any]]] = None
    tool_call_id: Optional[str] = None

    def text_content(self) -> str:
        if self.content is None:
            return ""
        if isinstance(self.content, str):
            return self.content
        parts = []
        for p in self.content:
            if p.get("type") == "text":
                parts.append(p.get("text", ""))
        return "".join(parts)


class ChatCompletionRequest(BaseModel):
    model: str = "default"
    messages: list[ChatMessage]
    temperature: Optional[float] = None
    top_p: Optional[float] = None
    top_k: Optional[int] = None
    min_p: Optional[float] = None
    n: int = 1
    stream: bool = False
    stop: Optional[Union[str, list[str]]] = None
    max_tokens: Optional[int] = None
    max_completion_tokens: Optional[int] = None
    presence_penalty: Optional[float] = None
    frequency_penalty: Optional[float] = None
    repetition_penalty: Optional[float] = None
    logit_bias: Optional[dict[str, float]] = None
    logprobs: Optional[bool] = None
    top_logprobs: Optional[int] = None
    seed: Optional[int] = None
    tools: Optional[list[dict[str, Any]]] = None
    tool_choice: Optional[Union[str, dict[str, Any]]] = None
    response_format: Optional[dict[str, Any]] = None
    # reference extension (`mistralrs-server-core` Grammar): constrained
    # decoding — {"type": "regex"|"json_schema"|"choice", "value": ...}
    grammar: Optional[dict[str, Any]] = None
    # per-request LoRA adapter selection from the loaded bank
    adapters: Optional[list[str]] = None
    # DRY repetition penalty (reference sampler extension)
    dry_multiplier: Optional[float] = None
    dry_base: Optional[float] = None
    dry_allowed_length: Optional[int] = None
    dry_sequence_breakers: Optional[list[int]] = None
    user: Optional[str] = None


class CompletionRequest(BaseModel):
    model: str = "default"
    prompt: Union[str, list[str], list[int]]
    temperature: Optional[float] = None
    top_p: Optional[float] = None
    top_k: Optional[int] = None
    n: int = 1
    stream: bool = False
    stop: Optional[Union[str, list[str]]] = None
    max_tokens: Optional[int] = 16
    presence_penalty: Optional[float] = None
    frequency_penalty: Optional[float] = None
    seed: Optional[int] = None
    echo: bool = False


class AnthropicMessagesRequest(BaseModel):
    model: str = "default"
    messages: list[dict[str, Any]]
    system: Optional[Union[str, list[dict[str, Any]]]] = None
    max_tokens: int = 1024
    temperature: Optional[float] = None
    top_p: Optional[float] = None
    top_k: Optional[int] = None
    stop_sequences: Optional[list[str]] = None
    stream: bool = False
    metadata: Optional[dict[str, Any]] = None


def now() -> int:
    return int(time.time())


def gen_id(prefix: str) -> str:
    return f"{prefix}-{uuid.uuid4().hex[:24]}"


def chat_completion_response(
    model: str, text: str, finish_reason: str, usage: dict[str, int],
    logprobs: Optional[dict] = None,
) -> dict:
    return {
        "id": gen_id("chatcmpl"),
        "object": "chat.completion",
        "created": now(),
        "model": model,
        "choices": [
            {
                "index": 0,
                "message": {"role": "assistant", "content": text},
                "finish_reason": finish_reason,
                "logprobs": logprobs,
            }
        ],
        "usage": usage,
    }


def chat_chunk(model: str, rid: str, delta: dict, finish_reason=None) -> dict:
    return {
        "id": rid,
        "object": "chat.completion.chunk",
        "created": now(),
        "model": model,
        "choices": [{"index": 0, "delta": delta, "finish_reason": finish_reason}],
    }


def completion_response(
    model: str, text: str, finish_reason: str, usage: dict[str, int]
) -> dict:
    return {
        "id": gen_id("cmpl"),
        "object": "text_completion",
        "created": now(),
        "model": model,
        "choices": [
            {"index": 0, "text": text, "finish_reason": finish_reason, "logprobs": None}
        ],
        "usage": usage,
    }


def anthropic_response(model: str, text: str, stop_reason: str, usage: dict) -> dict:
    return {
        "id": gen_id("msg"),
        "type": "message",
        "role": "assistant",
        "model": model,
        "content": [{"type": "text", "text": text}],
        "stop_reason": stop_reason,
        "stop_sequence": None,
        "usage": usage,
    }
