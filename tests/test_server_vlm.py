"""Image inputs through the HTTP server: OpenAI `image_url` content parts →
VLM adapter → engine prompt-embeds path (the analog of the reference's
vision inputs processors behind the chat route)."""

import base64
import io

import numpy as np
import pytest

import jax.numpy as jnp

pytest.importorskip("aiohttp")
torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
PIL = pytest.importorskip("PIL")

from mistralrs_tpu.chat_template import resolve_chat_template
from mistralrs_tpu.engine.engine import Engine
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.models.llava import (
    LlavaConfig,
    llava_weights_from_state_dict,
)
from mistralrs_tpu.serving.server import ServerState, build_app
from mistralrs_tpu.serving.vlm import decode_image_url, llava_adapter
from mistralrs_tpu.tokenizer import TokenizerWrapper


def _tokenizer_with_image_token():
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers

    alphabet = pre_tokenizers.ByteLevel.alphabet()
    vocab = {ch: i for i, ch in enumerate(sorted(alphabet))}
    tok = Tokenizer(models.BPE(vocab, []))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    tok.add_special_tokens(["<image>"])  # id 256
    return TokenizerWrapper(tok, bos_id=None, eos_ids=())


def _tiny_llava():
    vision_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=24, patch_size=8,
    )
    text_cfg = transformers.LlamaConfig(
        vocab_size=320, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    )
    hf_cfg = transformers.LlavaConfig(
        vision_config=vision_cfg, text_config=text_cfg,
        image_token_index=256, vision_feature_layer=-2,
        vision_feature_select_strategy="default", image_seq_length=9,
    )
    torch.manual_seed(7)
    model = transformers.LlavaForConditionalGeneration(hf_cfg).eval()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    cfg = LlavaConfig.from_hf(hf_cfg.to_dict())
    return cfg, llava_weights_from_state_dict(sd, cfg, dtype=jnp.float32)


CFG, WEIGHTS = _tiny_llava()


def _png_data_uri(arr: np.ndarray) -> str:
    buf = io.BytesIO()
    PIL.Image.fromarray(arr).save(buf, format="PNG")
    return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()


@pytest.fixture()
def vlm_state():
    eng = Engine(
        CFG.text, WEIGHTS["text"], num_blocks=64, block_size=16, max_batch=4,
        backend="xla", compute_dtype=jnp.float32,
    )
    tok = _tokenizer_with_image_token()
    ct = resolve_chat_template(arch="qwen2")  # chatml fallback
    adapter = llava_adapter(WEIGHTS, CFG, compute_dtype=jnp.float32)
    state = ServerState(eng, tok, ct, model_id="tiny-llava", vlm=adapter)
    state.start()
    yield state
    state.shutdown()


@pytest.fixture()
async def client(aiohttp_client, vlm_state):
    return await aiohttp_client(build_app(vlm_state))


async def test_image_chat_matches_library_path(client, vlm_state):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (24, 24, 3), np.uint8)
    r = await client.post(
        "/v1/chat/completions",
        json={
            "messages": [{
                "role": "user",
                "content": [
                    {"type": "text", "text": "what is this? "},
                    {"type": "image_url",
                     "image_url": {"url": _png_data_uri(img)}},
                ],
            }],
            "max_tokens": 6,
            "temperature": 0.0,
        },
    )
    assert r.status == 200, await r.text()
    data = await r.json()
    served = data["choices"][0]["message"]["content"]

    # library-path reference: same template + adapter + a fresh engine
    inst = vlm_state.registry.get()
    adapter = inst.vlm
    media = adapter.process([img])
    msgs = [{
        "role": "user",
        "content": "what is this? " + adapter.expand(media.counts[0]),
    }]
    prompt = inst.chat_template.render(msgs, add_generation_prompt=True,
                                       tools=None)
    pids = inst.tokenizer.encode(prompt)
    assert pids.count(256) == 9  # placeholder expansion survived tokenization
    mm = adapter.prepare(pids, media)
    eng = Engine(
        CFG.text, WEIGHTS["text"], num_blocks=64, block_size=16, max_batch=4,
        backend="xla", compute_dtype=jnp.float32,
    )
    seq = eng.add_request(
        pids, SamplingParams(temperature=0.0, max_tokens=6), **mm
    )
    eng.run_to_completion()
    assert served == inst.tokenizer.decode(seq.generated_ids)


async def test_image_to_text_model_rejected(aiohttp_client):
    from mistralrs_tpu.models import ModelConfig, init_random_weights

    cfg = ModelConfig(
        arch="llama", vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        max_position_embeddings=512,
    )
    eng = Engine(
        cfg, init_random_weights(cfg, seed=3), num_blocks=32, block_size=16,
        max_batch=2, backend="xla", compute_dtype=jnp.float32,
    )
    tok = _tokenizer_with_image_token()
    state = ServerState(eng, tok, resolve_chat_template(arch="qwen2"),
                        model_id="text-only")
    state.start()
    c = await aiohttp_client(build_app(state))
    r = await c.post(
        "/v1/chat/completions",
        json={
            "messages": [{
                "role": "user",
                "content": [
                    {"type": "image_url", "image_url": {"url": "data:,x"}},
                ],
            }],
            "max_tokens": 2,
        },
    )
    assert r.status == 400
    state.shutdown()


async def test_remote_url_rejected(client):
    r = await client.post(
        "/v1/chat/completions",
        json={
            "messages": [{
                "role": "user",
                "content": [
                    {"type": "image_url",
                     "image_url": {"url": "https://example.com/x.png"}},
                ],
            }],
            "max_tokens": 2,
        },
    )
    assert r.status == 400
    body = await r.json()
    assert "zero-egress" in body["error"]["message"]


def test_decode_image_url_roundtrip():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (10, 12, 3), np.uint8)
    got = decode_image_url(_png_data_uri(img))
    np.testing.assert_array_equal(got, img)


def test_qwen2vl_patchify_matches_hf_processor():
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor,
    )

    from mistralrs_tpu.serving.vlm import qwen2vl_patchify

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (57, 41, 3), np.uint8)  # forces smart_resize
    proc = Qwen2VLImageProcessor(
        patch_size=4, merge_size=2, temporal_patch_size=2,
        size={"shortest_edge": 56 * 56, "longest_edge": 14 * 14 * 4 * 1280},
    )
    out = proc(images=[PIL.Image.fromarray(img)], return_tensors="np")
    ref, ref_grid = out["pixel_values"], tuple(out["image_grid_thw"][0].tolist())
    got, grid = qwen2vl_patchify(img, patch=4, merge=2, tps=2)
    assert grid == ref_grid
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)  # PIL resize paths differ slightly


def test_load_pipeline_builds_vlm_adapter(tmp_path):
    """A llava checkpoint dir loads as a text Pipeline + VlmAdapter."""
    import json

    from safetensors.numpy import save_file

    from mistralrs_tpu.pipeline import load_pipeline

    torch.manual_seed(7)
    vision_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=24, patch_size=8,
    )
    text_cfg = transformers.LlamaConfig(
        vocab_size=320, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    )
    hf_cfg = transformers.LlavaConfig(
        vision_config=vision_cfg, text_config=text_cfg,
        image_token_index=256, vision_feature_layer=-2,
        vision_feature_select_strategy="default", image_seq_length=9,
    )
    model = transformers.LlavaForConditionalGeneration(hf_cfg).eval()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    d = tmp_path / "llava-tiny"
    d.mkdir()
    save_file(sd, str(d / "model.safetensors"))
    cfg_d = hf_cfg.to_dict()
    cfg_d["model_type"] = "llava"
    (d / "config.json").write_text(json.dumps(cfg_d))

    pipe = load_pipeline(str(d), dtype=jnp.float32)
    assert pipe.vlm is not None and pipe.vlm.family == "llava"
    assert pipe.cfg.arch == "llama"  # text decoder config
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (24, 24, 3), np.uint8)
    media = pipe.vlm.process([img])
    assert media.counts == [9]
    mm = pipe.vlm.prepare([1, 2] + [256] * 9 + [3], media)
    assert mm["prompt_embeds"].shape == (12, 48)
