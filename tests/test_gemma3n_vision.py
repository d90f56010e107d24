"""Gemma 3n IMAGE serving: native MobileNetV5 tower + vision multimodal
embedder → soft tokens at the placeholder positions → engine prompt-embeds
path → /v1/chat/completions (the last missing modality of the family;
reference `vision_models/gemma3n/{vision.rs,mod.rs:225}`)."""

import base64
import io
import json
import sys

import numpy as np
import pytest

import jax.numpy as jnp

pytest.importorskip("aiohttp")
torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
PIL = pytest.importorskip("PIL")

sys.path.insert(0, "tests")
from test_gemma3n import _tiny  # noqa: E402
from test_mobilenetv5 import DEF, _synthetic_sd  # noqa: E402

from mistralrs_tpu.chat_template import ChatTemplate  # noqa: E402
from mistralrs_tpu.engine.engine import Engine  # noqa: E402
from mistralrs_tpu.engine.sampler import SamplingParams  # noqa: E402
from mistralrs_tpu.pipeline import make_adapter  # noqa: E402
from mistralrs_tpu.serving.server import ServerState, build_app  # noqa: E402
from mistralrs_tpu.serving.vlm import gemma3n_image_adapter  # noqa: E402
from mistralrs_tpu.vision.mobilenetv5 import (  # noqa: E402
    gemma3n_vision_embedder_from_state_dict,
    mobilenetv5_weights_from_state_dict,
)

IMG_ID = 150  # in-vocab placeholder id for the tiny model
MSFA_OUT = 20


def _vision_parts(text_hidden: int):
    vsd = _synthetic_sd(DEF, msfa_out=MSFA_OUT, seed=7)
    rng = np.random.default_rng(8)
    esd = {
        "model.embed_vision.soft_embedding_norm.weight":
            np.ones(MSFA_OUT, np.float32),
        "model.embed_vision.embedding_projection.weight":
            (rng.standard_normal((text_hidden, MSFA_OUT)) * 0.1).astype(np.float32),
        "model.embed_vision.embedding.weight":
            (rng.standard_normal((4, MSFA_OUT))).astype(np.float32),
        "model.embed_vision.hard_embedding_norm.weight":
            np.ones(MSFA_OUT, np.float32),
    }
    vision_weights = mobilenetv5_weights_from_state_dict(vsd, block_def=DEF)
    embedder = gemma3n_vision_embedder_from_state_dict(esd)
    return vsd, esd, vision_weights, embedder


def _adapter_and_engine():
    hf_cfg, model, cfg, weights = _tiny(num_kv_shared_layers=0, vocab_pl=160)
    _, _, vision_weights, embedder = _vision_parts(cfg.hidden_size)
    vlm = gemma3n_image_adapter(
        weights, cfg, vision_weights, embedder,
        image_token_id=IMG_ID, image_size=32, block_def=DEF, out_res=(2, 2),
        compute_dtype=jnp.float32,
    )
    adapter = make_adapter(cfg, weights, compute_dtype=jnp.float32)
    eng = Engine(cfg, weights, adapter=adapter, num_blocks=32, block_size=16,
                 max_batch=2, backend="xla", compute_dtype=jnp.float32)
    return cfg, weights, vlm, eng


def test_image_soft_tokens_change_decode():
    """Soft image rows at placeholder positions: engine output differs from
    the text-only prompt, and identical images give identical outputs
    (determinism through the encoder cache)."""
    cfg, weights, vlm, eng = _adapter_and_engine()
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    media = vlm.process([img])
    assert media.counts == [4]  # out_res (2, 2)
    ids = [3, 7] + [IMG_ID] * 4 + [9, 22]
    kw = vlm.prepare(ids, media)
    assert kw["prompt_embeds"].shape == (len(ids), cfg.hidden_size)

    def run(embeds):
        adapter = make_adapter(cfg, weights, compute_dtype=jnp.float32)
        e = Engine(cfg, weights, adapter=adapter, num_blocks=32, block_size=16,
                   max_batch=2, backend="xla", compute_dtype=jnp.float32)
        seq = e.add_request(ids, SamplingParams(temperature=0.0, max_tokens=5),
                            prompt_embeds=embeds)
        e.run_to_completion()
        return seq.output_ids

    with_img = run(kw["prompt_embeds"])
    text_only = run(None)
    assert with_img != text_only
    assert run(vlm.prepare(ids, vlm.process([img]))["prompt_embeds"]) == with_img


def _png_data_uri(arr):
    buf = io.BytesIO()
    PIL.Image.fromarray(arr).save(buf, format="PNG")
    return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()


def _tokenizer():
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers

    from mistralrs_tpu.tokenizer import TokenizerWrapper

    alphabet = pre_tokenizers.ByteLevel.alphabet()
    vocab = {ch: i for i, ch in enumerate(sorted(alphabet))}
    tok = Tokenizer(models.BPE(vocab, []))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    tok.add_special_tokens(["<image_soft_token>"])  # id 256 (out of the
    # tiny model vocab — embedding lookups clamp, placeholders are replaced)
    return TokenizerWrapper(tok, bos_id=None, eos_ids=())


async def test_image_chat_route(aiohttp_client):
    """/v1/chat/completions with an image_url part serves through the
    gemma3n adapter (engine + tower + embedder end-to-end)."""
    cfg, weights, vlm, eng = _adapter_and_engine()
    # the adapter must match the tokenizer's placeholder id (256 here):
    tok = _tokenizer()
    soft_id = tok.encode("<image_soft_token>")[-1]
    _, _, vision_weights, embedder = _vision_parts(cfg.hidden_size)
    vlm = gemma3n_image_adapter(
        weights, cfg, vision_weights, embedder,
        image_token_id=soft_id, image_size=32, block_def=DEF, out_res=(2, 2),
        compute_dtype=jnp.float32,
    )
    ct = ChatTemplate(
        "{% for m in messages %}{{ m['content'] }}{% endfor %}"
    )
    state = ServerState(eng, tok, ct, model_id="tiny-g3n", vlm=vlm)
    state.start()
    try:
        client = await aiohttp_client(build_app(state))
        img = np.random.default_rng(1).integers(
            0, 255, (32, 32, 3), dtype=np.uint8
        )
        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": [
                {"type": "image_url", "image_url": {"url": _png_data_uri(img)}},
                {"type": "text", "text": "hi"},
            ]}],
            "max_tokens": 4, "temperature": 0,
        })
        assert r.status == 200, await r.text()
        data = await r.json()
        assert data["usage"]["completion_tokens"] == 4
    finally:
        state.shutdown()


def test_load_pipeline_builds_gemma3n_vision(tmp_path, monkeypatch):
    """An on-disk gemma3n checkpoint with vision-tower keys loads with a
    VlmAdapter attached (pipeline wiring)."""
    from safetensors.numpy import save_file

    import mistralrs_tpu.vision.mobilenetv5 as mnv5
    from mistralrs_tpu.pipeline import load_pipeline

    monkeypatch.setattr(mnv5, "gemma3n_mobilenet_def", lambda: DEF)
    hf_cfg, model, cfg, weights = _tiny(num_kv_shared_layers=0, vocab_pl=160)
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    if not any(k.startswith("model.") for k in sd):
        sd = {"model." + k if not k.startswith("lm_head") else k: v
              for k, v in sd.items()}
    vsd, esd, _, _ = _vision_parts(cfg.hidden_size)
    sd.update({k: np.asarray(v, np.float32) for k, v in vsd.items()})
    sd.update(esd)
    mdir = tmp_path / "g3n"
    mdir.mkdir()
    save_file(sd, str(mdir / "model.safetensors"))
    cfg_json = hf_cfg.to_dict()
    cfg_json["model_type"] = "gemma3n"
    cfg_json["image_token_id"] = IMG_ID
    cfg_json["vision_config"] = {"image_size": 32}
    (mdir / "config.json").write_text(json.dumps(cfg_json))
    pipe = load_pipeline(str(mdir))
    assert pipe.vlm is not None
    assert pipe.vlm.family == "gemma3n"
