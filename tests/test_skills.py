"""Skill store + /v1/skills routes + shell-tool mounting (the analog of
mistralrs-server-core/src/skills.rs and agentic_loop.rs shell skills)."""

import numpy as np
import pytest

import jax.numpy as jnp

pytest.importorskip("aiohttp")

from mistralrs_tpu.skills import SkillStore, zip_skill


def _zip(name="My Tool", extra=None):
    files = {
        "skill.json": '{"name": "%s", "description": "does things"}' % name,
        "SKILL.md": "# %s\nRun scripts/run.py\n" % name,
        "scripts/run.py": "print('ran skill')\n",
    }
    files.update(extra or {})
    return zip_skill(files)


def test_upload_list_versions_delete(tmp_path):
    store = SkillStore(str(tmp_path))
    obj = store.upload(_zip())
    assert obj["object"] == "skill" and obj["latest_version"] == 1
    assert obj["name"] == "My Tool" and obj["description"] == "does things"
    # same name → new version
    obj2 = store.upload(_zip(extra={"scripts/v2.py": "pass\n"}))
    assert obj2["id"] == obj["id"] and obj2["latest_version"] == 2
    vs = store.versions(obj["id"])
    assert [v["version"] for v in vs] == [1, 2]
    assert (store.content_dir(obj["id"]) / "scripts/v2.py").exists()
    assert not (store.content_dir(obj["id"], 1) / "scripts/v2.py").exists()
    assert store.delete(obj["id"])
    assert store.list() == []


def test_rejects_traversal_and_missing_skill_md(tmp_path):
    store = SkillStore(str(tmp_path))
    with pytest.raises(ValueError, match="unsafe path"):
        store.upload(zip_skill({"../evil.txt": "x", "SKILL.md": "# a"}))
    with pytest.raises(ValueError, match="SKILL.md"):
        store.upload(zip_skill({"skill.json": '{"name": "x"}'}))


def test_strips_shared_top_dir(tmp_path):
    store = SkillStore(str(tmp_path))
    obj = store.upload(zip_skill({
        "mytool/skill.json": '{"name": "t"}',
        "mytool/SKILL.md": "# t",
    }))
    assert (store.content_dir(obj["id"]) / "SKILL.md").exists()


def test_mount_into_workdir_and_message(tmp_path):
    store = SkillStore(str(tmp_path / "store"))
    obj = store.upload(_zip())
    wd = tmp_path / "session"
    wd.mkdir()
    msg = store.mount([obj["id"]], str(wd))
    assert (wd / "skills/My-Tool/SKILL.md").exists()
    assert (wd / "skills/My-Tool/scripts/run.py").exists()
    assert "cat skills/My-Tool/SKILL.md" in msg
    assert "My Tool: does things" in msg
    # the mounted script actually runs from the session workdir (the shell
    # tool's cwd), end to end
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "skills/My-Tool/scripts/run.py"],
        cwd=str(wd), capture_output=True, text=True, timeout=30,
    )
    assert out.stdout.strip() == "ran skill"


@pytest.fixture()
async def client(aiohttp_client):
    from mistralrs_tpu.chat_template import ChatTemplate
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.models.config import ModelConfig
    from mistralrs_tpu.models.hf_loader import weights_from_state_dict
    from mistralrs_tpu.serving.server import ServerState, build_app
    from mistralrs_tpu.tokenizer import TokenizerWrapper

    cfg = ModelConfig(
        arch="llama", vocab_size=128, hidden_size=32, intermediate_size=64,
        num_layers=1, num_heads=2, num_kv_heads=1, head_dim=16,
    )
    rng = np.random.default_rng(0)
    r = lambda *s: (rng.standard_normal(s) * 0.05).astype(np.float32)
    sd = {"model.embed_tokens.weight": r(128, 32),
          "model.norm.weight": np.ones(32, np.float32),
          "lm_head.weight": r(128, 32),
          "model.layers.0.input_layernorm.weight": np.ones(32, np.float32),
          "model.layers.0.post_attention_layernorm.weight": np.ones(32, np.float32),
          "model.layers.0.self_attn.q_proj.weight": r(32, 32),
          "model.layers.0.self_attn.k_proj.weight": r(16, 32),
          "model.layers.0.self_attn.v_proj.weight": r(16, 32),
          "model.layers.0.self_attn.o_proj.weight": r(32, 32),
          "model.layers.0.mlp.gate_proj.weight": r(64, 32),
          "model.layers.0.mlp.up_proj.weight": r(64, 32),
          "model.layers.0.mlp.down_proj.weight": r(32, 64)}
    w = weights_from_state_dict(sd, cfg, dtype=jnp.float32)
    eng = Engine(cfg, w, num_blocks=16, block_size=16, max_batch=2,
                 backend="xla", compute_dtype=jnp.float32)
    from tokenizers import Tokenizer, models, pre_tokenizers

    alphabet = sorted(pre_tokenizers.ByteLevel.alphabet())
    tok = Tokenizer(models.BPE({c: i for i, c in enumerate(alphabet)}, []))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    state = ServerState(eng, TokenizerWrapper(tok, bos_id=None, eos_ids=()),
                        ChatTemplate("{{ messages }}"), model_id="t")
    state.start()
    yield await aiohttp_client(build_app(state))
    state.shutdown()


async def test_skills_routes(client):
    import base64

    r = await client.post("/v1/skills", json={
        "name": "web-helper",
        "files": {
            "SKILL.md": "# web-helper\nuse it\n",
            "skill.json": '{"name": "web-helper", "description": "helps"}',
            "bin/tool": {"b64": base64.b64encode(b"\x00\x01").decode()},
        },
    })
    assert r.status == 200, await r.text()
    obj = await r.json()
    assert obj["name"] == "web-helper" and obj["latest_version"] == 1

    r = await client.get("/v1/skills")
    data = await r.json()
    assert [s["id"] for s in data["data"]] == [obj["id"]]

    r = await client.get(f"/v1/skills/{obj['id']}/versions")
    assert (await r.json())["data"][0]["version"] == 1

    # raw zip upload of a second version
    r = await client.post(
        "/v1/skills", data=_zip("web-helper"),
        headers={"Content-Type": "application/zip"},
    )
    assert (await r.json())["latest_version"] == 2

    r = await client.delete(f"/v1/skills/{obj['id']}")
    assert (await r.json())["deleted"]
    r = await client.get(f"/v1/skills/{obj['id']}")
    assert r.status == 404

    r = await client.post("/v1/skills", json={"files": {"a.txt": "x"}})
    assert r.status == 422
