"""CLI multi-chip serving: `serve --tp N --dp M` builds a mesh-sharded
engine (the analog of the reference's `begin_tensor_parallel_session`
wired into every load, mistralrs-core/src/distributed.rs:431), and the
ModelInstance/LockstepDriver integration replicates requests so worker
ranks step in lockstep."""

import argparse
import threading

import numpy as np
import pytest

import jax

from mistralrs_tpu import cli as cli_mod
from mistralrs_tpu.convert import convert_hf_to_gguf
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.models.config import ModelConfig

CFG = ModelConfig(
    arch="llama", vocab_size=512, hidden_size=128, intermediate_size=256,
    num_layers=2, num_heads=8, num_kv_heads=4, head_dim=16,
    max_position_embeddings=512,
)


def _tiny_gguf(tmp_path, seed=0):
    rng = np.random.default_rng(seed)
    H, I, V = CFG.hidden_size, CFG.intermediate_size, CFG.vocab_size

    def r(*s):
        return rng.standard_normal(s, dtype=np.float32) * 0.05

    sd = {
        "model.embed_tokens.weight": r(V, H),
        "model.norm.weight": np.ones(H, np.float32),
        "lm_head.weight": r(V, H),
    }
    for i in range(CFG.num_layers):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "self_attn.q_proj.weight"] = r(CFG.q_dim, H)
        sd[p + "self_attn.k_proj.weight"] = r(CFG.kv_dim, H)
        sd[p + "self_attn.v_proj.weight"] = r(CFG.kv_dim, H)
        sd[p + "self_attn.o_proj.weight"] = r(H, CFG.q_dim)
        sd[p + "mlp.gate_proj.weight"] = r(I, H)
        sd[p + "mlp.up_proj.weight"] = r(I, H)
        sd[p + "mlp.down_proj.weight"] = r(H, I)
    path = str(tmp_path / "tiny.gguf")
    convert_hf_to_gguf(sd, CFG, path)
    return path


def _serve_args(model, **over):
    """Namespace matching the `serve` subparser defaults."""
    d = dict(
        model=model, config=None, isq=None, from_uqff=None, max_seq_len=None,
        kv_quant=None, max_batch=4, num_kv_blocks=64, block_size=16,
        chat_template=None, draft_model=None, gamma=4, tp=1, dp=1,
        coordinator=None, num_hosts=1, host_id=None, replicator_port=19777,
        host="127.0.0.1", port=0,
    )
    d.update(over)
    return argparse.Namespace(**d)


def _need(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} virtual devices")


PROMPTS = [[1, 5, 9, 200, 7], [2, 4, 6, 8, 10, 12, 14], [100, 101]]


def _complete(eng, prompts=PROMPTS, max_tokens=8):
    seqs = [eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=max_tokens))
            for p in prompts]
    eng.run_to_completion()
    return [s.output_ids for s in seqs]


def test_cli_tp_dp_engine_matches_single_chip(tmp_path):
    _need(4)
    path = _tiny_gguf(tmp_path)
    _, ref_eng = cli_mod._build_engine(_serve_args(path))
    assert ref_eng.mesh is None
    ref = _complete(ref_eng)

    _, eng = cli_mod._build_engine(_serve_args(path, tp=2, dp=2))
    assert eng.mesh is not None
    assert eng.dp == 2
    assert _complete(eng) == ref


def test_cli_tp_step_down(tmp_path, capsys):
    """tp=3 does not divide 8 heads → auto step-down to 2 with a warning
    (resolve_tensor_parallelism analog, distributed.rs:149)."""
    _need(2)
    path = _tiny_gguf(tmp_path)
    _, eng = cli_mod._build_engine(_serve_args(path, tp=3))
    assert eng.mesh is not None
    assert int(eng.mesh.shape["model"]) == 2
    assert "stepping down" in capsys.readouterr().err


def test_cli_max_batch_rounds_to_dp(tmp_path, capsys):
    _need(4)
    path = _tiny_gguf(tmp_path)
    _, eng = cli_mod._build_engine(_serve_args(path, dp=4, max_batch=6))
    assert eng.max_batch == 8
    assert "rounding --max-batch" in capsys.readouterr().err


def test_lockstep_driver_through_model_instance(tmp_path):
    """Two engines on one box joined by the RequestReplicator: host 0 drives
    through ModelInstance(driver=...), the worker runs run_worker(); outputs
    must match on both ranks (schedule determinism)."""
    from mistralrs_tpu.chat_template import ChatTemplate
    from mistralrs_tpu.parallel.multihost import (
        LockstepDriver, RequestReplicator, default_decode_request,
    )
    from mistralrs_tpu.serving.registry import ModelInstance

    path = _tiny_gguf(tmp_path)
    _, eng0 = cli_mod._build_engine(_serve_args(path))
    _, eng1 = cli_mod._build_engine(_serve_args(path))

    import socket as _socket

    _s = _socket.socket()
    _s.bind(("127.0.0.1", 0))
    port = _s.getsockname()[1]
    _s.close()
    rep0 = RequestReplicator(0, 2, port=port)
    rep1 = RequestReplicator(1, 2, port=port)
    t = threading.Thread(target=rep0.start_server, daemon=True)
    t.start()
    rep1.connect(timeout=30.0)
    t.join(timeout=30.0)

    driver = LockstepDriver(rep0, eng0)
    worker = LockstepDriver(rep1, eng1, default_decode_request)
    worker_out: list = []
    wt = threading.Thread(target=lambda: worker_out.extend(worker.run_worker()),
                          daemon=True)
    wt.start()

    inst = ModelInstance(
        model_id="m", engine=eng0, tokenizer=None,
        chat_template=ChatTemplate("{{ messages }}"), driver=driver,
    )
    inst.start()
    got = {}
    done = threading.Event()

    def on_tokens(toks, fin):
        got.setdefault("toks", []).extend(toks)
        if fin:
            done.set()

    seq = inst.submit([3, 1, 4, 1, 5], SamplingParams(temperature=0.0, max_tokens=8),
                      on_tokens)
    assert done.wait(timeout=120.0)
    inst.shutdown()
    driver.shutdown()
    wt.join(timeout=60.0)
    assert len(seq.output_ids) == 8
    by_id = {s.request_id: s.output_ids for s in worker_out}
    assert by_id.get(seq.request_id) == seq.output_ids
    rep0.close()
    rep1.close()


def test_multimodal_rides_the_driver_wire(tmp_path):
    """Media tensors replicate to workers (round-4 exclusion lifted): the
    broadcast request carries the base64-encoded payload and the local
    engine still receives the raw kwargs."""
    from mistralrs_tpu.chat_template import ChatTemplate
    from mistralrs_tpu.parallel.multihost import decode_payload
    from mistralrs_tpu.serving.registry import ModelInstance

    path = _tiny_gguf(tmp_path)
    _, eng = cli_mod._build_engine(_serve_args(path))

    class FakeDriver:
        def __init__(self):
            self.requests = []

        def submit(self, request, prompt_ids, params, **local_kwargs):
            self.requests.append(request)
            return eng.add_request(prompt_ids, params, **local_kwargs)

    drv = FakeDriver()
    inst = ModelInstance(model_id="m", engine=eng, tokenizer=None,
                         chat_template=ChatTemplate("{{ messages }}"),
                         driver=drv)
    H = eng.cfg.hidden_size
    embeds = np.arange(2 * H, dtype=np.float32).reshape(2, H)
    inst.submit([1, 2], SamplingParams(max_tokens=2), None,
                prompt_embeds=embeds)
    req = drv.requests[0]
    assert "mm" in req and "prompt_embeds" in req["mm"]
    decoded = decode_payload(req["mm"]["prompt_embeds"])
    np.testing.assert_array_equal(decoded, embeds)
    import json

    json.dumps(req)  # the wire format is JSON-clean


def test_params_wire_roundtrip():
    from mistralrs_tpu.parallel.multihost import decode_params, encode_params

    p = SamplingParams(
        temperature=0.5, top_k=7, top_p=0.9, min_p=0.02,
        frequency_penalty=0.1, presence_penalty=0.2, repetition_penalty=1.1,
        seed=42, logit_bias={3: -1.0}, max_tokens=17,
        stop_token_ids=(2,), stop_strings=("end",), n_logprobs=0,
        dry_multiplier=0.5, dry_sequence_breaker_ids=(9,),
    )
    import json

    wire = json.loads(json.dumps(encode_params(p)))
    assert decode_params(wire) == p
