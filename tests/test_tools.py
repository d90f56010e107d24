"""Tool-call parser + reasoning splitter tests (analog of the reference's
tools/parsers test coverage)."""

from mistralrs_tpu.tools import (
    ReasoningParser,
    parse_tool_calls,
    split_reasoning,
)
from mistralrs_tpu.tools.parsers import ToolCallingMatcher


def test_llama_style():
    out = parse_tool_calls(
        '{"name": "get_weather", "parameters": {"city": "Paris"}}', "llama"
    )
    assert len(out) == 1
    assert out[0].name == "get_weather"
    assert out[0].arguments == {"city": "Paris"}


def test_llama_multiple_semicolon():
    text = '{"name": "a", "parameters": {}}; {"name": "b", "parameters": {"x": 1}}'
    out = parse_tool_calls(text, "llama")
    assert [c.name for c in out] == ["a", "b"]


def test_mistral_style():
    text = '[TOOL_CALLS][{"name": "search", "arguments": {"q": "tpu"}}]'
    out = parse_tool_calls(text, "mistral")
    assert len(out) == 1 and out[0].name == "search"
    assert out[0].arguments == {"q": "tpu"}


def test_qwen_hermes_style():
    text = (
        "I'll check.\n<tool_call>\n"
        '{"name": "lookup", "arguments": {"id": 7}}\n'
        "</tool_call>"
    )
    out = parse_tool_calls(text, "qwen")
    assert len(out) == 1 and out[0].arguments == {"id": 7}


def test_gemma_fenced():
    text = '```json\n{"name": "calc", "arguments": {"e": "1+1"}}\n```'
    out = parse_tool_calls(text, "gemma")
    assert len(out) == 1 and out[0].name == "calc"


def test_auto_detection_and_no_false_positive():
    assert parse_tool_calls("Just a normal sentence.") == []
    assert parse_tool_calls('The answer is {"x": 1}. Hope that helps') == []
    out = parse_tool_calls('<tool_call>{"name": "f", "arguments": {}}</tool_call>')
    assert len(out) == 1


def test_openai_shape():
    (call,) = parse_tool_calls('{"name": "f", "arguments": {"a": 2}}', "llama")
    d = call.to_openai()
    assert d["type"] == "function"
    assert d["function"]["name"] == "f"
    assert d["id"].startswith("call_")


def test_matcher_streaming_gate():
    m = ToolCallingMatcher()
    assert m.prefix_could_be_tool("<tool_")
    assert m.prefix_could_be_tool('{"name"')
    assert not m.prefix_could_be_tool("Hello there")


def test_split_reasoning():
    r, c = split_reasoning("<think>step 1\nstep 2</think>\nAnswer: 42")
    assert r == "step 1\nstep 2"
    assert c == "Answer: 42"
    r, c = split_reasoning("no tags here")
    assert r is None and c == "no tags here"
    r, c = split_reasoning("<think>endless thought")
    assert r == "endless thought" and c == ""
    # close-tag-only (deepseek-r1 distill style)
    r, c = split_reasoning("implicit thought</think>final")
    assert r == "implicit thought" and c == "final"


def test_streaming_reasoning_parser():
    p = ReasoningParser()
    deltas = ["<thi", "nk>rea", "soning</th", "ink>ans", "wer"]
    r_all = c_all = ""
    for d in deltas:
        r, c = p.push(d)
        r_all += r
        c_all += c
    r, c = p.flush()
    r_all += r
    c_all += c
    assert r_all == "reasoning"
    assert c_all == "answer"


def test_streaming_no_reasoning():
    p = ReasoningParser()
    r1, c1 = p.push("hello ")
    r2, c2 = p.push("world")
    r3, c3 = p.flush()
    assert r1 + r2 + r3 == ""
    assert c1 + c2 + c3 == "hello world"


def test_supported_models_doc_in_sync():
    """Docs-as-test (Makefile docs-check analog): the committed table must
    match the generator."""
    from pathlib import Path

    from mistralrs_tpu.model_metadata import render_supported_models_markdown

    committed = Path("docs/supported_models.md").read_text()
    assert committed == render_supported_models_markdown()


def test_parse_hunyuan():
    from mistralrs_tpu.tools.parsers import parse_tool_calls

    text = ('ok <tool_calls>[{"name": "get_weather", "arguments": '
            '{"city": "Paris"}}, {"name": "now", "arguments": {}}]</tool_calls>')
    calls = parse_tool_calls(text, "hunyuan")
    assert [c.name for c in calls] == ["get_weather", "now"]
    assert calls[0].arguments == {"city": "Paris"}
    assert parse_tool_calls(text, "auto")[0].name == "get_weather"


def test_parse_liquid_pythonic():
    from mistralrs_tpu.tools.parsers import parse_tool_calls

    text = ('<|tool_call_start|>[get_weather(location="Paris", days=3, '
            'metric=True)]<|tool_call_end|>')
    calls = parse_tool_calls(text, "lfm2")
    assert calls[0].name == "get_weather"
    assert calls[0].arguments == {"location": "Paris", "days": 3, "metric": True}
    assert parse_tool_calls(text, "auto")[0].name == "get_weather"


def test_parse_gemma4_strict():
    from mistralrs_tpu.tools.parsers import parse_tool_calls

    text = ('<|tool_call>call:get_weather{location:<|"|>New York, NY<|"|>,'
            'days:3,wet:true}<tool_call|>')
    calls = parse_tool_calls(text, "gemma4")
    assert calls[0].name == "get_weather"
    assert calls[0].arguments == {
        "location": "New York, NY", "days": 3, "wet": True,
    }


def test_parse_harmony_gpt_oss():
    from mistralrs_tpu.tools.parsers import parse_tool_calls

    text = ('<|channel|>commentary to=functions.get_weather '
            '<|constrain|>json<|message|>{"city": "Oslo"}<|call|>')
    calls = parse_tool_calls(text, "gpt_oss")
    assert calls[0].name == "get_weather"
    assert calls[0].arguments == {"city": "Oslo"}
    assert parse_tool_calls(text, "auto")[0].name == "get_weather"
