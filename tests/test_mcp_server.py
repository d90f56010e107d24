"""MCP server mode: the model exposed as an MCP tool server over streams."""

import io
import json

import jax.numpy as jnp

from mistralrs_tpu.chat_template import resolve_chat_template
from mistralrs_tpu.engine.engine import Engine
from mistralrs_tpu.models import ModelConfig, init_random_weights
from mistralrs_tpu.serving.mcp_server import McpModelServer
from mistralrs_tpu.serving.registry import ModelInstance
from test_server import make_byte_tokenizer


def _instance():
    cfg = ModelConfig(
        arch="llama", vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        max_position_embeddings=512,
    )
    eng = Engine(cfg, init_random_weights(cfg, seed=9), num_blocks=32,
                 block_size=16, max_batch=2, backend="xla",
                 compute_dtype=jnp.float32)
    return ModelInstance(
        model_id="m", engine=eng, tokenizer=make_byte_tokenizer(),
        chat_template=resolve_chat_template(arch="qwen2"),
    )


def _rpc(lines):
    inp = io.StringIO("".join(json.dumps(m) + "\n" for m in lines))
    out = io.StringIO()
    McpModelServer(_instance()).serve_streams(inp, out)
    return [json.loads(l) for l in out.getvalue().splitlines()]


def test_initialize_list_and_chat():
    resps = _rpc([
        {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}},
        {"jsonrpc": "2.0", "id": 2, "method": "tools/list"},
        {"jsonrpc": "2.0", "id": 3, "method": "tools/call",
         "params": {"name": "chat", "arguments": {
             "messages": [{"role": "user", "content": "hi"}],
             "max_tokens": 4, "temperature": 0.0}}},
        {"jsonrpc": "2.0", "id": 4, "method": "tools/call",
         "params": {"name": "tokenize", "arguments": {"text": "ab"}}},
        {"jsonrpc": "2.0", "id": 5, "method": "nope"},
    ])
    assert resps[0]["result"]["serverInfo"]["name"] == "mistralrs_tpu"
    names = [t["name"] for t in resps[1]["result"]["tools"]]
    assert names == ["chat", "tokenize"]
    assert isinstance(resps[2]["result"]["content"][0]["text"], str)
    assert json.loads(resps[3]["result"]["content"][0]["text"])
    assert "error" in resps[4]


def test_session_export_import(tmp_path):
    from mistralrs_tpu.agent import export_session, import_session

    msgs = [{"role": "user", "content": "hi"},
            {"role": "assistant", "content": "hello"}]
    p = tmp_path / "s.json"
    export_session(msgs, str(p), metadata={"model": "m"})
    loaded, md = import_session(str(p))
    assert loaded == msgs and md == {"model": "m"}
