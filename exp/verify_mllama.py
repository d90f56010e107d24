"""Drive mllama through the public library surface: image encode → prefill →
greedy decode loop; compare full generation to HF generate."""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, torch, jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
from test_mllama import _tiny_mllama
from mistralrs_tpu.models.mllama import (
    MllamaCache, encode_images, mllama_forward, prepare_cross_attention_mask)

hf_cfg, model, cfg, weights = _tiny_mllama()
rng = np.random.default_rng(5)
px = rng.standard_normal((1, 1, 2, 3, 16, 16)).astype(np.float32)
ar_ids = np.array([[2]], np.int64); ar_mask = np.array([[[1, 1]]], np.int64)
ids = [136, 3, 17, 9, 22]
N = 8
with torch.no_grad():
    hf_out = model.generate(
        input_ids=torch.tensor([ids]), pixel_values=torch.tensor(px),
        aspect_ratio_ids=torch.tensor(ar_ids), aspect_ratio_mask=torch.tensor(ar_mask),
        cross_attention_mask=torch.tensor(np.ones((1, len(ids), 1, 2), np.int64)),
        max_new_tokens=N, do_sample=False)[0, len(ids):].tolist()

states = encode_images(weights, cfg, jnp.asarray(px), jnp.asarray(ar_ids), jnp.asarray(ar_mask))
t = len(ids)
xmask = np.ones((1, t, 1, 2), np.int64)
bias, fr = prepare_cross_attention_mask(xmask, cfg.vision.num_patches)
cache = MllamaCache.create(cfg, 1, t + N + 1)
logits, cache = mllama_forward(
    weights, cfg, jnp.asarray([ids], jnp.int32),
    jnp.arange(t)[None].astype(jnp.int32), cache, jnp.zeros((1,), jnp.int32),
    cross_states=states, cross_bias=jnp.asarray(bias), full_row=jnp.asarray(fr))
out = [int(jnp.argmax(logits[0, -1]))]
bias1, fr1 = prepare_cross_attention_mask(np.ones((1, 1, 1, 2), np.int64), cfg.vision.num_patches)
for i in range(N - 1):
    pos = t + i
    logits, cache = mllama_forward(
        weights, cfg, jnp.asarray([[out[-1]]], jnp.int32),
        jnp.asarray([[pos]], jnp.int32), cache, jnp.full((1,), pos, jnp.int32),
        cross_bias=jnp.asarray(bias1), full_row=jnp.asarray(fr1))
    out.append(int(jnp.argmax(logits[0, -1])))
print("ours:", out)
print("hf:  ", hf_out)
assert out == hf_out
print("OK mllama generate parity")
