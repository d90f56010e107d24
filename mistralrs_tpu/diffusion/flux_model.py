"""FLUX rectified-flow DiT — the analog of the reference's FLUX transformer
(`mistralrs-core/src/diffusion_models/flux/model.rs` 753 lines: double-stream
+ single-stream blocks, 3-axis rope, adaLN modulation; `sampling.rs`: latent
packing, shifted sigmoid schedule, Euler denoise loop).

TPU design: the whole denoise step is one jittable function over stacked
block parameters (`lax.scan` over the 19 double + 38 single blocks — one
trace regardless of depth); timesteps drive a host-side Python loop (the
step count is user-chosen, a handful of iterations).

Weight layout follows the BFL checkpoint names (``double_blocks.N.img_mod
.lin.weight`` …) so released flux-dev/flux-schnell safetensors load
directly (`load_flux_params`).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

HIDDEN = 3072
MLP_RATIO = 4
AXES_DIM = (16, 56, 56)
THETA = 10000.0


@dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64
    pooled_projection_dim: int = 768  # CLIP pooled
    joint_attention_dim: int = 4096  # T5 hidden
    num_attention_heads: int = 24
    num_layers: int = 19  # double-stream
    num_single_layers: int = 38
    guidance_embeds: bool = True  # flux-dev; schnell = False
    hidden_size: int = HIDDEN
    axes_dim: tuple[int, ...] = AXES_DIM  # rope split over (batch, h, w) ids

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


# --------------------------------------------------------------------------
# positional / timestep embeddings
# --------------------------------------------------------------------------


def _axis_rope(pos: jax.Array, dim: int) -> tuple[jax.Array, jax.Array]:
    """pos [B, L] → (cos, sin) [B, L, dim//2] for one id axis."""
    inv = 1.0 / (THETA ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    ang = pos.astype(jnp.float32)[..., None] * inv
    return jnp.cos(ang), jnp.sin(ang)


def rope_from_ids(
    ids: jax.Array, axes_dim: tuple[int, ...] = AXES_DIM
) -> tuple[jax.Array, jax.Array]:
    """ids [B, L, 3] → (cos, sin) [B, L, head_dim//2] over the 3 axes
    (`EmbedNd`: per-axis tables concatenated along the pair dim)."""
    cs, ss = [], []
    for a, d in enumerate(axes_dim):
        c, s = _axis_rope(ids[..., a], d)
        cs.append(c)
        ss.append(s)
    return jnp.concatenate(cs, -1), jnp.concatenate(ss, -1)


def _apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Pair-interleaved rotation (x viewed as [.., d/2, 2]); x [B, H, L, d],
    cos/sin [B, L, d/2]."""
    b, h, l, d = x.shape
    xp = x.reshape(b, h, l, d // 2, 2)
    x0, x1 = xp[..., 0], xp[..., 1]
    c = cos[:, None]
    s = sin[:, None]
    out = jnp.stack([x0 * c - x1 * s, x0 * s + x1 * c], axis=-1)
    return out.reshape(b, h, l, d)


def timestep_embedding(t: jax.Array, dim: int = 256) -> jax.Array:
    """t [B] in [0,1] → sinusoidal embedding [B, dim] (t scaled by 1000,
    cos-first like the reference)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = (t.astype(jnp.float32) * 1000.0)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


# --------------------------------------------------------------------------
# building blocks
# --------------------------------------------------------------------------


def _linear(p, x):
    y = x @ p["weight"].T
    if "bias" in p:
        y = y + p["bias"]
    return y


def _layer_norm(x, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _rms(x, w, eps=1e-6):
    x32 = x.astype(jnp.float32)
    n = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (n * w).astype(x.dtype)


def _mlp_embed(p, x):
    return _linear(p["out_layer"], jax.nn.silu(_linear(p["in_layer"], x)))


def _modulation(p, vec, n: int):
    """silu(vec) @ lin → n chunks of (shift, scale, gate) triples."""
    y = _linear(p["lin"], jax.nn.silu(vec))[:, None]  # [B, 1, n*3*H]
    return jnp.split(y, 3 * n, axis=-1)


def _attention(q, k, v, cos, sin):
    """q/k/v [B, H, L, hd] with rope on q,k → [B, L, H*hd]."""
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(jnp.float32))
    b, h, l, d = out.shape
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(b, l, h * d).astype(v.dtype)


def _qkv_split(p, x, n_heads):
    qkv = _linear(p["qkv"], x)
    b, l, _ = qkv.shape
    qkv = qkv.reshape(b, l, 3, n_heads, -1)
    q = jnp.transpose(qkv[:, :, 0], (0, 2, 1, 3))
    k = jnp.transpose(qkv[:, :, 1], (0, 2, 1, 3))
    v = jnp.transpose(qkv[:, :, 2], (0, 2, 1, 3))
    q = _rms(q, p["norm"]["query_norm"]["scale"])
    k = _rms(k, p["norm"]["key_norm"]["scale"])
    return q, k, v


def _double_block(cfg: FluxConfig, p, img, txt, vec, cos, sin):
    im_sh1, im_sc1, im_g1, im_sh2, im_sc2, im_g2 = _modulation(p["img_mod"], vec, 2)
    tx_sh1, tx_sc1, tx_g1, tx_sh2, tx_sc2, tx_g2 = _modulation(p["txt_mod"], vec, 2)

    img_mod = _layer_norm(img) * (1 + im_sc1) + im_sh1
    iq, ik, iv = _qkv_split(p["img_attn"], img_mod, cfg.num_attention_heads)
    txt_mod = _layer_norm(txt) * (1 + tx_sc1) + tx_sh1
    tq, tk, tv = _qkv_split(p["txt_attn"], txt_mod, cfg.num_attention_heads)

    q = jnp.concatenate([tq, iq], axis=2)
    k = jnp.concatenate([tk, ik], axis=2)
    v = jnp.concatenate([tv, iv], axis=2)
    attn = _attention(q, k, v, cos, sin)
    t_len = txt.shape[1]
    txt_attn, img_attn = attn[:, :t_len], attn[:, t_len:]

    img = img + im_g1 * _linear(p["img_attn"]["proj"], img_attn)
    img_h = _layer_norm(img) * (1 + im_sc2) + im_sh2
    img_h = _linear(p["img_mlp"]["2"],
                    jax.nn.gelu(_linear(p["img_mlp"]["0"], img_h)))
    img = img + im_g2 * img_h

    txt = txt + tx_g1 * _linear(p["txt_attn"]["proj"], txt_attn)
    txt_h = _layer_norm(txt) * (1 + tx_sc2) + tx_sh2
    txt_h = _linear(p["txt_mlp"]["2"],
                    jax.nn.gelu(_linear(p["txt_mlp"]["0"], txt_h)))
    txt = txt + tx_g2 * txt_h
    return img, txt


def _single_block(cfg: FluxConfig, p, x, vec, cos, sin):
    h_sz = cfg.hidden_size
    mlp_sz = h_sz * MLP_RATIO
    sh, sc, gate = _modulation(p["modulation"], vec, 1)
    x_mod = _layer_norm(x) * (1 + sc) + sh
    y = _linear(p["linear1"], x_mod)
    qkv, mlp = y[..., : 3 * h_sz], y[..., 3 * h_sz :]
    b, l, _ = qkv.shape
    qkv = qkv.reshape(b, l, 3, cfg.num_attention_heads, -1)
    q = jnp.transpose(qkv[:, :, 0], (0, 2, 1, 3))
    k = jnp.transpose(qkv[:, :, 1], (0, 2, 1, 3))
    v = jnp.transpose(qkv[:, :, 2], (0, 2, 1, 3))
    q = _rms(q, p["norm"]["query_norm"]["scale"])
    k = _rms(k, p["norm"]["key_norm"]["scale"])
    attn = _attention(q, k, v, cos, sin)
    out = _linear(p["linear2"],
                  jnp.concatenate([attn, jax.nn.gelu(mlp)], axis=-1))
    return x + gate * out


# --------------------------------------------------------------------------
# full model
# --------------------------------------------------------------------------


def flux_forward(
    params: dict,
    cfg: FluxConfig,
    img: jax.Array,  # [B, L_img, in_channels] packed latents
    img_ids: jax.Array,  # [B, L_img, 3]
    txt: jax.Array,  # [B, L_txt, joint_attention_dim] (T5)
    txt_ids: jax.Array,  # [B, L_txt, 3]
    timesteps: jax.Array,  # [B]
    y: jax.Array,  # [B, pooled_projection_dim] (CLIP pooled)
    guidance: Optional[jax.Array] = None,  # [B]
) -> jax.Array:
    ids = jnp.concatenate([txt_ids, img_ids], axis=1)
    cos, sin = rope_from_ids(ids, cfg.axes_dim)

    txt = _linear(params["txt_in"], txt)
    img = _linear(params["img_in"], img)
    vec = _mlp_embed(params["time_in"], timestep_embedding(timesteps))
    if cfg.guidance_embeds and guidance is not None:
        vec = vec + _mlp_embed(params["guidance_in"], timestep_embedding(guidance))
    vec = vec + _mlp_embed(params["vector_in"], y)

    def dbl(carry, p):
        im, tx = carry
        im, tx = _double_block(cfg, p, im, tx, vec, cos, sin)
        return (im, tx), None

    (img, txt), _ = jax.lax.scan(dbl, (img, txt), params["double_blocks"])

    x = jnp.concatenate([txt, img], axis=1)

    def sgl(x, p):
        return _single_block(cfg, p, x, vec, cos, sin), None

    x, _ = jax.lax.scan(sgl, x, params["single_blocks"])
    img = x[:, txt.shape[1] :]

    fl = params["final_layer"]
    sh, sc = jnp.split(
        _linear(fl["adaLN_modulation"], jax.nn.silu(vec))[:, None], 2, axis=-1
    )
    img = _layer_norm(img) * (1 + sc) + sh
    return _linear(fl["linear"], img)


# --------------------------------------------------------------------------
# sampling (rectified flow; `sampling.rs`)
# --------------------------------------------------------------------------


def get_noise(key, num_samples: int, height: int, width: int) -> jax.Array:
    """[B, 16, 2*ceil(h/16), 2*ceil(w/16)] standard normal latents."""
    h = -(-height // 16) * 2
    w = -(-width // 16) * 2
    return jax.random.normal(key, (num_samples, 16, h, w), jnp.float32)


def pack_latents(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[B, C, H, W] → (packed [B, H/2*W/2, C*4], ids [B, H/2*W/2, 3])."""
    b, c, h, w = img.shape
    x = img.reshape(b, c, h // 2, 2, w // 2, 2)
    x = jnp.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(b, h // 2 * w // 2, c * 4)
    ids = jnp.stack(
        [
            jnp.zeros((h // 2, w // 2), jnp.float32),
            jnp.broadcast_to(jnp.arange(h // 2, dtype=jnp.float32)[:, None],
                             (h // 2, w // 2)),
            jnp.broadcast_to(jnp.arange(w // 2, dtype=jnp.float32)[None],
                             (h // 2, w // 2)),
        ],
        axis=-1,
    ).reshape(1, -1, 3)
    return x, jnp.broadcast_to(ids, (b, ids.shape[1], 3))


def unpack_latents(x: jax.Array, height: int, width: int) -> jax.Array:
    """Inverse of pack: [B, L, C*4] → [B, C, 2*ceil(h/16), 2*ceil(w/16)]."""
    b, _, cp = x.shape
    h = -(-height // 16)
    w = -(-width // 16)
    x = x.reshape(b, h, w, cp // 4, 2, 2)
    x = jnp.transpose(x, (0, 3, 1, 4, 2, 5))
    return x.reshape(b, cp // 4, h * 2, w * 2)


def _time_shift(mu: float, sigma: float, t: np.ndarray) -> np.ndarray:
    e = math.exp(mu)
    return e / (e + (1.0 / t - 1.0) ** sigma)


def get_schedule(
    num_steps: int, image_seq_len: Optional[int] = None,
    base_shift: float = 0.5, max_shift: float = 1.15,
) -> list[float]:
    """Descending timesteps 1→0; with a sequence length, apply the
    resolution-dependent sigmoid shift (flux-dev)."""
    ts = np.linspace(1.0, 0.0, num_steps + 1)
    if image_seq_len is None:
        return [float(t) for t in ts]
    m = (max_shift - base_shift) / (4096.0 - 256.0)
    mu = m * image_seq_len + (base_shift - m * 256.0)
    with np.errstate(divide="ignore"):
        shifted = np.where(ts > 0, _time_shift(mu, 1.0, np.maximum(ts, 1e-9)), 0.0)
    return [float(t) for t in shifted]


def denoise(
    params: dict,
    cfg: FluxConfig,
    img: jax.Array,
    img_ids: jax.Array,
    txt: jax.Array,
    txt_ids: jax.Array,
    vec: jax.Array,
    timesteps: list[float],
    guidance: Optional[float] = None,
) -> jax.Array:
    """Euler rectified-flow integration: img += (t_prev − t_curr)·v(img, t)."""
    b = img.shape[0]
    g = None
    if guidance is not None and cfg.guidance_embeds:
        g = jnp.full((b,), guidance, jnp.float32)
    step = jax.jit(flux_forward, static_argnames=("cfg",))
    for t_curr, t_prev in zip(timesteps[:-1], timesteps[1:]):
        t_vec = jnp.full((b,), t_curr, jnp.float32)
        pred = step(params, cfg, img, img_ids, txt, txt_ids, t_vec, vec, g)
        img = img + pred * (t_prev - t_curr)
    return img


# --------------------------------------------------------------------------
# parameters
# --------------------------------------------------------------------------


def load_flux_params(sd: Mapping[str, np.ndarray], cfg: FluxConfig,
                     dtype=jnp.bfloat16) -> dict:
    """Build the stacked-block param pytree from a BFL-format state dict."""

    def g(name):
        return jnp.asarray(np.asarray(sd[name], np.float32), dtype)

    def lin(name):
        p = {"weight": g(name + ".weight")}
        if name + ".bias" in sd:
            p["bias"] = g(name + ".bias")
        return p

    def attn(pre):
        return {
            "qkv": lin(pre + ".qkv"),
            "proj": lin(pre + ".proj"),
            "norm": {
                "query_norm": {"scale": g(pre + ".norm.query_norm.scale")},
                "key_norm": {"scale": g(pre + ".norm.key_norm.scale")},
            },
        }

    def dbl(i):
        pre = f"double_blocks.{i}."
        return {
            "img_mod": {"lin": lin(pre + "img_mod.lin")},
            "txt_mod": {"lin": lin(pre + "txt_mod.lin")},
            "img_attn": attn(pre + "img_attn"),
            "txt_attn": attn(pre + "txt_attn"),
            "img_mlp": {"0": lin(pre + "img_mlp.0"), "2": lin(pre + "img_mlp.2")},
            "txt_mlp": {"0": lin(pre + "txt_mlp.0"), "2": lin(pre + "txt_mlp.2")},
        }

    def sgl(i):
        pre = f"single_blocks.{i}."
        return {
            "linear1": lin(pre + "linear1"),
            "linear2": lin(pre + "linear2"),
            "modulation": {"lin": lin(pre + "modulation.lin")},
            "norm": {
                "query_norm": {"scale": g(pre + "norm.query_norm.scale")},
                "key_norm": {"scale": g(pre + "norm.key_norm.scale")},
            },
        }

    stack = lambda xs: jax.tree_util.tree_map(lambda *a: jnp.stack(a), *xs)
    params = {
        "img_in": lin("img_in"),
        "txt_in": lin("txt_in"),
        "time_in": {"in_layer": lin("time_in.in_layer"),
                    "out_layer": lin("time_in.out_layer")},
        "vector_in": {"in_layer": lin("vector_in.in_layer"),
                      "out_layer": lin("vector_in.out_layer")},
        "double_blocks": stack([dbl(i) for i in range(cfg.num_layers)]),
        "single_blocks": stack([sgl(i) for i in range(cfg.num_single_layers)]),
        "final_layer": {
            "norm_final": {},
            "linear": lin("final_layer.linear"),
            "adaLN_modulation": lin("final_layer.adaLN_modulation.1"),
        },
    }
    if cfg.guidance_embeds:
        params["guidance_in"] = {
            "in_layer": lin("guidance_in.in_layer"),
            "out_layer": lin("guidance_in.out_layer"),
        }
    return params


def init_flux_params(cfg: FluxConfig, seed: int = 0, dtype=jnp.float32,
                     scale: float = 0.02) -> dict:
    """Random params with the BFL names/shapes (testing)."""
    rng = np.random.default_rng(seed)
    h = cfg.hidden_size
    mlp = h * MLP_RATIO
    hd = cfg.head_dim
    sd: dict[str, np.ndarray] = {}

    def lin(name, o, i, bias=True):
        sd[name + ".weight"] = rng.standard_normal((o, i), np.float32) * scale
        if bias:
            sd[name + ".bias"] = rng.standard_normal((o,), np.float32) * scale

    lin("img_in", h, cfg.in_channels)
    lin("txt_in", h, cfg.joint_attention_dim)
    for emb, i in (("time_in", 256), ("vector_in", cfg.pooled_projection_dim)):
        lin(emb + ".in_layer", h, i)
        lin(emb + ".out_layer", h, h)
    if cfg.guidance_embeds:
        lin("guidance_in.in_layer", h, 256)
        lin("guidance_in.out_layer", h, h)
    for i in range(cfg.num_layers):
        pre = f"double_blocks.{i}."
        lin(pre + "img_mod.lin", 6 * h, h)
        lin(pre + "txt_mod.lin", 6 * h, h)
        for a in ("img_attn", "txt_attn"):
            lin(pre + a + ".qkv", 3 * h, h)
            lin(pre + a + ".proj", h, h)
            sd[pre + a + ".norm.query_norm.scale"] = np.ones(hd, np.float32)
            sd[pre + a + ".norm.key_norm.scale"] = np.ones(hd, np.float32)
        for m in ("img_mlp", "txt_mlp"):
            lin(pre + m + ".0", mlp, h)
            lin(pre + m + ".2", h, mlp)
    for i in range(cfg.num_single_layers):
        pre = f"single_blocks.{i}."
        lin(pre + "linear1", 3 * h + mlp, h)
        lin(pre + "linear2", h, h + mlp)
        lin(pre + "modulation.lin", 3 * h, h)
        sd[pre + "norm.query_norm.scale"] = np.ones(hd, np.float32)
        sd[pre + "norm.key_norm.scale"] = np.ones(hd, np.float32)
    lin("final_layer.linear", cfg.in_channels, h)
    lin("final_layer.adaLN_modulation.1", 2 * h, h)
    return load_flux_params(sd, cfg, dtype=dtype)
