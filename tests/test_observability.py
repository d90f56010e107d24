"""Engine observability: per-step timing lines + interval logger output."""
import numpy as np
import pytest

import jax.numpy as jnp

from mistralrs_tpu.engine.engine import Engine
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.models.config import ModelConfig
from mistralrs_tpu.models.hf_loader import weights_from_state_dict

CFG = ModelConfig(
    arch="llama", vocab_size=128, hidden_size=64, intermediate_size=128,
    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
)


def _weights(seed=0):
    rng = np.random.default_rng(seed)
    H, I, V = CFG.hidden_size, CFG.intermediate_size, CFG.vocab_size
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.05
    sd = {"model.embed_tokens.weight": r(V, H),
          "model.norm.weight": np.ones(H, np.float32),
          "lm_head.weight": r(V, H)}
    for i in range(CFG.num_layers):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        sd[p + "self_attn.q_proj.weight"] = r(64, H)
        sd[p + "self_attn.k_proj.weight"] = r(32, H)
        sd[p + "self_attn.v_proj.weight"] = r(32, H)
        sd[p + "self_attn.o_proj.weight"] = r(H, 64)
        sd[p + "mlp.gate_proj.weight"] = r(I, H)
        sd[p + "mlp.up_proj.weight"] = r(I, H)
        sd[p + "mlp.down_proj.weight"] = r(H, I)
    return weights_from_state_dict(sd, CFG, dtype=jnp.float32)


def test_step_timing_lines(monkeypatch, capsys):
    monkeypatch.setenv("MRSTPU_STEP_TIMING", "1")
    eng = Engine(CFG, _weights(), num_blocks=32, block_size=16, max_batch=2,
                 backend="xla", compute_dtype=jnp.float32)
    eng.add_request([1, 2, 3, 4], SamplingParams(temperature=0.0, max_tokens=4))
    eng.run_to_completion()
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith("[step ")]
    assert len(lines) >= 4
    assert "decode bs=" in lines[-1] and "schedule" in lines[-1]


def test_interval_logger_line(monkeypatch, capsys):
    import time

    from mistralrs_tpu.chat_template import ChatTemplate
    from mistralrs_tpu.serving.registry import ModelInstance

    monkeypatch.setenv("MRSTPU_LOG_INTERVAL", "0.2")
    eng = Engine(CFG, _weights(), num_blocks=32, block_size=16, max_batch=2,
                 backend="xla", compute_dtype=jnp.float32)
    inst = ModelInstance(model_id="obs", engine=eng, tokenizer=None,
                         chat_template=ChatTemplate("{{ messages }}"))
    inst.start()
    import threading

    done = threading.Event()
    inst.submit([1, 2, 3, 4], SamplingParams(temperature=0.0, max_tokens=30),
                lambda toks, fin: done.set() if fin else None)
    assert done.wait(60)
    deadline = time.monotonic() + 10
    line = None
    while time.monotonic() < deadline:
        outlines = [l for l in capsys.readouterr().out.splitlines()
                    if l.startswith("[obs]")]
        if outlines:
            line = outlines[-1]
            break
        time.sleep(0.1)
    inst.shutdown()
    assert line is not None
    assert "tok/s decode" in line and "prefix-hit" in line and "ms/step" in line
