"""HTTP server integration: OpenAI + Anthropic routes over a tiny model
(the analog of the reference's server-core handler tests)."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

pytest.importorskip("aiohttp")

from mistralrs_tpu.chat_template import resolve_chat_template
from mistralrs_tpu.engine.engine import Engine
from mistralrs_tpu.models import ModelConfig, init_random_weights
from mistralrs_tpu.serving.server import ServerState, build_app
from mistralrs_tpu.tokenizer import TokenizerWrapper


def make_byte_tokenizer(vocab_size=256) -> TokenizerWrapper:
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers

    alphabet = pre_tokenizers.ByteLevel.alphabet()
    vocab = {ch: i for i, ch in enumerate(sorted(alphabet))}
    tok = Tokenizer(models.BPE(vocab, []))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    return TokenizerWrapper(tok, bos_id=None, eos_ids=())


CFG = ModelConfig(
    arch="llama", vocab_size=256, hidden_size=64, intermediate_size=128,
    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
    max_position_embeddings=512,
)


WEIGHTS = init_random_weights(CFG, seed=3)


@pytest.fixture()
def server_state():
    eng = Engine(
        CFG, WEIGHTS, num_blocks=64, block_size=16, max_batch=4,
        backend="xla", compute_dtype=jnp.float32,
    )
    tok = make_byte_tokenizer()
    ct = resolve_chat_template(arch="qwen2")  # chatml fallback
    state = ServerState(eng, tok, ct, model_id="tiny-test")
    state.start()
    yield state
    state.shutdown()


@pytest.fixture()
async def client(aiohttp_client, server_state):
    return await aiohttp_client(build_app(server_state))


async def test_health_and_models(client):
    r = await client.get("/health")
    assert r.status == 200
    r = await client.get("/v1/models")
    data = await r.json()
    assert data["data"][0]["id"] == "tiny-test"


async def test_chat_completion_blocking(client):
    r = await client.post(
        "/v1/chat/completions",
        json={
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 5,
            "temperature": 0.0,
        },
    )
    assert r.status == 200
    data = await r.json()
    assert data["object"] == "chat.completion"
    assert data["usage"]["completion_tokens"] > 0
    assert isinstance(data["choices"][0]["message"]["content"], str)


async def test_chat_completion_streaming(client):
    r = await client.post(
        "/v1/chat/completions",
        json={
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 5,
            "temperature": 0.0,
            "stream": True,
        },
    )
    assert r.status == 200
    body = await r.text()
    events = [l for l in body.split("\n\n") if l.startswith("data: ")]
    assert events[-1] == "data: [DONE]"
    payloads = [json.loads(e[6:]) for e in events[:-1]]
    assert payloads[0]["choices"][0]["delta"].get("role") == "assistant"
    assert payloads[-1]["choices"][0]["finish_reason"] in ("stop", "length")


async def test_completions(client):
    r = await client.post(
        "/v1/completions",
        json={"prompt": "abc", "max_tokens": 4, "temperature": 0.0},
    )
    assert r.status == 200
    data = await r.json()
    assert data["object"] == "text_completion"
    assert data["usage"]["completion_tokens"] > 0


async def test_anthropic_messages(client):
    r = await client.post(
        "/v1/messages",
        json={
            "model": "tiny-test",
            "max_tokens": 5,
            "messages": [{"role": "user", "content": "hello"}],
        },
    )
    assert r.status == 200
    data = await r.json()
    assert data["type"] == "message"
    assert data["content"][0]["type"] == "text"
    assert data["usage"]["output_tokens"] > 0


async def test_metrics(client):
    await client.get("/health")
    r = await client.get("/metrics")
    text = await r.text()
    assert "http_requests_total" in text
    assert "engine_generated_tokens" in text


async def test_invalid_request_422(client):
    r = await client.post("/v1/chat/completions", json={"messages": "nope"})
    assert r.status == 422


async def test_embeddings(client):
    r = await client.post("/v1/embeddings", json={"input": ["hello", "world"]})
    assert r.status == 200
    data = await r.json()
    assert len(data["data"]) == 2
    assert len(data["data"][0]["embedding"]) == CFG.hidden_size


async def test_model_management_routes(client, server_state):
    import tempfile

    from mistralrs_tpu.convert import convert_hf_to_gguf
    from mistralrs_tpu.models.config import ModelConfig as MC

    rng = np.random.default_rng(0)
    H, I, V, L = 64, 128, 256, 2
    cfg = MC(arch="llama", vocab_size=V, hidden_size=H, intermediate_size=I,
             num_layers=L, num_heads=4, num_kv_heads=2, head_dim=16)
    sd = {"model.embed_tokens.weight": rng.standard_normal((V, H)).astype(np.float32),
          "model.norm.weight": np.ones(H, np.float32),
          "lm_head.weight": rng.standard_normal((V, H)).astype(np.float32)}
    for i in range(L):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        for nm, shp in [("self_attn.q_proj", (64, H)), ("self_attn.k_proj", (32, H)),
                        ("self_attn.v_proj", (32, H)), ("self_attn.o_proj", (H, 64)),
                        ("mlp.gate_proj", (I, H)), ("mlp.up_proj", (I, H)),
                        ("mlp.down_proj", (H, I))]:
            sd[p + nm + ".weight"] = rng.standard_normal(shp).astype(np.float32) * 0.05
    path = tempfile.mktemp(suffix=".gguf")
    convert_hf_to_gguf(sd, cfg, path)

    r = await client.post(
        "/v1/models/load",
        json={"model_id": "second", "path": path,
              "engine_options": {"num_blocks": 16, "max_batch": 2,
                                 "backend": "xla"}},
    )
    assert r.status == 200, await r.text()
    r = await client.get("/v1/models")
    ids = [m["id"] for m in (await r.json())["data"]]
    assert set(ids) == {"tiny-test", "second"}
    r = await client.post("/v1/models/reload", json={"model_id": "second"})
    assert r.status == 200
    r = await client.post("/v1/models/unload", json={"model_id": "second"})
    assert r.status == 200
    r = await client.get("/v1/models")
    ids = [m["id"] for m in (await r.json())["data"]]
    assert ids == ["tiny-test"]
    r = await client.get("/v1/system/info")
    assert (await r.json())["backend"] == "cpu"


async def test_logprobs(client):
    r = await client.post(
        "/v1/chat/completions",
        json={"messages": [{"role": "user", "content": "hi"}],
              "max_tokens": 3, "temperature": 0.0,
              "logprobs": True, "top_logprobs": 3},
    )
    data = await r.json()
    content = data["choices"][0]["logprobs"]["content"]
    assert len(content) == 3
    assert len(content[0]["top_logprobs"]) == 3
    assert content[0]["logprob"] <= 0


async def test_responses_api(client):
    r = await client.post(
        "/v1/responses",
        json={"input": "hi", "max_output_tokens": 4, "temperature": 0.0},
    )
    assert r.status == 200
    data = await r.json()
    rid = data["id"]
    assert data["status"] == "completed"
    assert data["output"][0]["content"][0]["type"] == "output_text"
    r = await client.get(f"/v1/responses/{rid}")
    assert r.status == 200
    r = await client.delete(f"/v1/responses/{rid}")
    assert r.status == 200
    r = await client.get(f"/v1/responses/{rid}")
    assert r.status == 404


async def test_web_ui(client):
    r = await client.get("/")
    assert r.status == 200
    assert "text/html" in r.headers["Content-Type"]
    html = await r.text()
    assert "/v1/chat/completions" in html and "stream: true" in html


# ---------------------------------------------------------------------------
# non-text generation + LoRA management routes (route_registry.rs:27-107)
# ---------------------------------------------------------------------------


async def test_images_generations_route(aiohttp_client, server_state):
    class StubFlux:
        def encode_prompt(self, prompt):
            return np.zeros((1, 4, 8), np.float32), np.zeros((1, 8), np.float32)

        def generate(self, txt, pooled, *, height, width, num_steps, seed):
            rng = np.random.default_rng(seed)
            return rng.integers(0, 255, (1, height, width, 3), dtype=np.uint8)

    server_state.flux = StubFlux()
    client = await aiohttp_client(build_app(server_state))
    r = await client.post(
        "/v1/images/generations",
        json={"prompt": "a cat", "size": "32x32", "n": 2, "steps": 1},
    )
    assert r.status == 200
    data = await r.json()
    assert len(data["data"]) == 2
    import base64

    png = base64.b64decode(data["data"][0]["b64_json"])
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


async def test_images_route_no_model(aiohttp_client, server_state):
    client = await aiohttp_client(build_app(server_state))
    r = await client.post("/v1/images/generations", json={"prompt": "x"})
    assert r.status == 400


async def test_audio_speech_route(aiohttp_client, server_state):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import dataclasses

    from mistralrs_tpu.audio import DacDecoderConfig, dac_params_from_state_dict
    from mistralrs_tpu.models.dia import DiaConfig, dia_weights_from_state_dict

    hf_cfg = transformers.DiaConfig(
        encoder_config=transformers.DiaEncoderConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, intermediate_size=64, head_dim=8,
            vocab_size=64, max_position_embeddings=64),
        decoder_config=transformers.DiaDecoderConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, intermediate_size=64, head_dim=8,
            vocab_size=40, num_channels=3, cross_hidden_size=32,
            cross_num_attention_heads=4, cross_num_key_value_heads=2,
            cross_head_dim=8, max_position_embeddings=32),
        delay_pattern=[0, 1, 2],
    )
    torch.manual_seed(90)
    dia_model = transformers.DiaForConditionalGeneration(hf_cfg).eval()
    cfg = DiaConfig.from_hf(hf_cfg.to_dict())
    # tiny vocab: remap the special ids into range
    cfg = dataclasses.replace(
        cfg, eos_token_id=36, pad_token_id=37, bos_token_id=38
    )
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in dia_model.state_dict().items()}
    params = dia_weights_from_state_dict(sd, cfg)

    dac_cfg_hf = transformers.DacConfig(
        encoder_hidden_size=16, decoder_hidden_size=32, hidden_size=24,
        n_codebooks=3, codebook_size=32, codebook_dim=4,
        upsampling_ratios=[4, 2], downsampling_ratios=[2, 4],
        sampling_rate=16000,
    )
    torch.manual_seed(91)
    dac_model = transformers.DacModel(dac_cfg_hf).eval()
    dac_cfg = DacDecoderConfig.from_hf(dac_cfg_hf.to_dict())
    dac_params = dac_params_from_state_dict(
        {k: v.detach().numpy().astype(np.float32)
         for k, v in dac_model.state_dict().items()},
        dac_cfg,
    )
    server_state.speech = {
        "params": params, "cfg": cfg, "dac_params": dac_params,
        "dac_cfg": dac_cfg, "sample_rate": 16000,
    }
    client = await aiohttp_client(build_app(server_state))
    r = await client.post(
        "/v1/audio/speech", json={"input": "[S1] hi", "max_tokens": 8}
    )
    assert r.status == 200
    wav = await r.read()
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"


async def test_lora_routes(aiohttp_client, server_state, tmp_path):
    from safetensors.numpy import save_file

    # tiny PEFT-style adapter targeting wq on layer 0
    d = tmp_path / "adapter"
    d.mkdir()
    (d / "adapter_config.json").write_text(
        json.dumps({"r": 2, "lora_alpha": 4.0})
    )
    H = CFG.hidden_size
    save_file(
        {
            "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight":
                np.ones((2, H), np.float32) * 0.01,
            "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight":
                np.ones((CFG.num_heads * CFG.head_dim, 2), np.float32) * 0.01,
        },
        str(d / "adapter_model.safetensors"),
    )
    client = await aiohttp_client(build_app(server_state))
    r = await client.get("/v1/lora")
    assert (await r.json())["data"][0]["attached_targets"] == []
    r = await client.post("/v1/lora/load", json={"path": str(d)})
    assert r.status == 200, await r.text()
    r = await client.get("/v1/lora")
    data = await r.json()
    assert data["data"][0]["attached_targets"], data
    # generation still works with the adapter attached
    r = await client.post(
        "/v1/chat/completions",
        json={"messages": [{"role": "user", "content": "hi"}],
              "max_tokens": 4, "temperature": 0},
    )
    assert r.status == 200
    r = await client.post("/v1/lora/unload", json={})
    assert r.status == 200
    r = await client.get("/v1/lora")
    assert (await r.json())["data"][0]["attached_targets"] == []


async def test_agent_session_routes(client, server_state):
    server_state.agent_sessions.save(
        "s1", [{"role": "user", "content": "hi"},
               {"role": "assistant", "content": "yo"}]
    )
    r = await client.get("/v1/agent/sessions")
    assert (await r.json())["data"] == ["s1"]
    r = await client.get("/v1/agent/sessions/s1")
    assert len((await r.json())["messages"]) == 2
    r = await client.post("/v1/agent/sessions/s1/approve")
    assert (await r.json())["approved"]
    assert server_state.agent_sessions.approved("s1")
    r = await client.post("/v1/agent/sessions/s1/fork",
                          json={"dest": "s2", "num_turns": 1})
    assert (await r.json())["forked"] == "s2"
    r = await client.delete("/v1/agent/sessions/s1")
    assert (await r.json())["deleted"]
    r = await client.get("/v1/agent/sessions/zzz")
    assert r.status == 404


async def test_files_routes(client):
    import base64

    payload = base64.b64encode(b"hello files").decode()
    r = await client.post(
        "/v1/files", json={"filename": "a.txt", "content_b64": payload}
    )
    assert r.status == 200
    fid = (await r.json())["id"]
    r = await client.get("/v1/files")
    assert any(f["id"] == fid for f in (await r.json())["data"])
    r = await client.get(f"/v1/files/{fid}")
    assert (await r.json())["bytes"] == len(b"hello files")
    r = await client.get(f"/v1/files/{fid}/content")
    assert await r.read() == b"hello files"
    r = await client.delete(f"/v1/files/{fid}")
    assert (await r.json())["deleted"]
    r = await client.get(f"/v1/files/{fid}")
    assert r.status == 404
    r = await client.post("/v1/files", json={"filename": "x"})
    assert r.status == 422


async def test_system_doctor_route(client):
    r = await client.get("/v1/system/doctor")
    body = await r.json()
    assert body["device_ok"] and body["models"] == ["tiny-test"]


async def test_re_isq_route(client):
    # default instance has no reloadable source → 409
    r = await client.post("/re_isq", json={"isq": "q4k"})
    assert r.status == 409
    r = await client.post("/re_isq", json={"isq": "q4k", "model": "zzz"})
    assert r.status == 404


async def test_calibration_routes(client):
    import asyncio as aio

    r = await client.get("/v1/calibration/status")
    assert (await r.json())["status"] == "idle"
    r = await client.post("/v1/calibration/start", json={"texts": []})
    assert r.status == 422
    r = await client.post(
        "/v1/calibration/start", json={"texts": ["hello world, calibrate me"]}
    )
    assert r.status == 200
    for _ in range(200):
        r = await client.get("/v1/calibration/status")
        body = await r.json()
        if body["status"] in ("done", "error"):
            break
        await aio.sleep(0.1)
    assert body["status"] == "done", body
    assert body["tokens"] > 0
    # apply fails (no reloadable source) but the imatrix was collected
    r = await client.post("/v1/calibration/apply", json={"isq": "q4k"})
    assert r.status == 404


async def test_webui_served_with_parity_surfaces(client):
    """The built-in web UI is served at / and carries the reference app's
    parity surfaces: streaming chat wiring, message-branch editing
    (branch save/switch + per-message edit), reasoning display
    (<think> splitting + reasoning_content deltas), and the /v1/files
    browser (mistralrs-cli/webui analog)."""
    resp = await client.get("/")
    assert resp.status == 200
    html = await resp.text()
    assert "text/html" in resp.headers["Content-Type"]
    # streaming chat
    assert "/v1/chat/completions" in html and "stream: true" in html
    # branch editing machinery
    for hook in ("saveBranch", "switchBranch", "editMessage", "branchPos"):
        assert hook in html, hook
    # reasoning display
    for hook in ("splitThink", "reasoning_content", "<think>",
                 "details", "reasoning"):
        assert hook in html, hook
    # file browsing against the live routes
    assert "/v1/files" in html and "filelist" in html
    # the files routes the UI talks to actually exist
    fr = await client.get("/v1/files")
    assert fr.status == 200
