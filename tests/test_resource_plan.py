"""Resource plan + CLI reference docgen."""

from mistralrs_tpu.models import ModelConfig
from mistralrs_tpu.resource_plan import plan_paged_kv


def _cfg(layers, kv_heads):
    return ModelConfig(
        arch="llama", vocab_size=1000, hidden_size=512, intermediate_size=1024,
        num_layers=layers, num_heads=8, num_kv_heads=kv_heads, head_dim=64,
    )


def test_fair_context_split():
    big = _cfg(32, 8)     # 4x the KV cost of small
    small = _cfg(8, 8)
    plan = plan_paged_kv(
        [("big", big, 4 << 30), ("small", small, 1 << 30)],
        hbm_bytes=16 << 30, block_size=16,
    )
    by_id = {e.model_id: e for e in plan}
    # fair CONTEXT: both models get the same token budget
    assert by_id["big"].context_tokens == by_id["small"].context_tokens
    assert by_id["big"].context_tokens > 0


def test_overcommit_rejected():
    import pytest

    with pytest.raises(ValueError):
        plan_paged_kv([("m", _cfg(8, 8), 20 << 30)], hbm_bytes=16 << 30)


def test_cli_reference_generates():
    from mistralrs_tpu.model_metadata import render_cli_reference_markdown

    doc = render_cli_reference_markdown()
    for cmd in ("run", "serve", "quantize", "tune"):
        assert f"## `{cmd}`" in doc
