"""Tool-calling + reasoning output parsing (the analog of
`mistralrs-core/src/tools/` and `src/reasoning_parsers/`)."""

from .parsers import ToolCall, ToolCallingMatcher, parse_tool_calls
from .reasoning import ReasoningParser, split_reasoning

__all__ = [
    "ToolCall",
    "ToolCallingMatcher",
    "parse_tool_calls",
    "ReasoningParser",
    "split_reasoning",
]
