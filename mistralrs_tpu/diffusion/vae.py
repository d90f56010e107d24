"""FLUX autoencoder (SD-style VAE) — the analog of the reference's
`diffusion_models/flux/autoencoder.rs`: GroupNorm+swish ResNet blocks, a
single-head mid attention block, nearest-neighbor upsampling. NCHW layout,
`lax.conv_general_dilated` for the convs (XLA maps these onto the MXU).

Weight names follow the BFL ``ae.safetensors`` layout
(``decoder.up.N.block.M.conv1.weight`` …)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class AutoencoderConfig:
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 16
    scaling_factor: float = 0.3611
    shift_factor: float = 0.1159
    norm_num_groups: int = 32


def _conv2d(p, x, stride=1, padding=1):
    y = jax.lax.conv_general_dilated(
        x, p["weight"], (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + p["bias"][None, :, None, None]


def _group_norm(p, x, groups, eps=1e-6):
    b, c, h, w = x.shape
    xg = x.reshape(b, groups, c // groups, h, w).astype(jnp.float32)
    mu = xg.mean((2, 3, 4), keepdims=True)
    var = xg.var((2, 3, 4), keepdims=True)
    xg = (xg - mu) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(b, c, h, w).astype(x.dtype)
    return x * p["weight"][None, :, None, None] + p["bias"][None, :, None, None]


def _resnet(p, x, groups):
    h = jax.nn.silu(_group_norm(p["norm1"], x, groups))
    h = _conv2d(p["conv1"], h)
    h = jax.nn.silu(_group_norm(p["norm2"], h, groups))
    h = _conv2d(p["conv2"], h)
    if "nin_shortcut" in p:
        x = _conv2d(p["nin_shortcut"], x, padding=0)
    return x + h


def _attn(p, x, groups):
    b, c, hh, ww = x.shape
    n = _group_norm(p["norm"], x, groups)
    q = _conv2d(p["q"], n, padding=0).reshape(b, c, hh * ww)
    k = _conv2d(p["k"], n, padding=0).reshape(b, c, hh * ww)
    v = _conv2d(p["v"], n, padding=0).reshape(b, c, hh * ww)
    logits = jnp.einsum("bcq,bck->bqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (c ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bqk,bck->bcq", probs, v.astype(jnp.float32))
    out = out.reshape(b, c, hh, ww).astype(x.dtype)
    return x + _conv2d(p["proj_out"], out, padding=0)


def vae_decode(params: dict, cfg: AutoencoderConfig, z: jax.Array) -> jax.Array:
    """Latents [B, latent_channels, h, w] → image [B, out_channels, 8h, 8w]
    in [-1, 1]."""
    g = cfg.norm_num_groups
    z = z / cfg.scaling_factor + cfg.shift_factor
    h = _conv2d(params["conv_in"], z)
    h = _resnet(params["mid"]["block_1"], h, g)
    h = _attn(params["mid"]["attn_1"], h, g)
    h = _resnet(params["mid"]["block_2"], h, g)
    n_levels = len(cfg.block_out_channels)
    for lvl in reversed(range(n_levels)):
        up = params["up"][str(lvl)]
        for i in range(cfg.layers_per_block + 1):
            h = _resnet(up["block"][str(i)], h, g)
        if lvl != 0:
            b, c, hh, ww = h.shape
            h = jax.image.resize(h, (b, c, hh * 2, ww * 2), "nearest")
            h = _conv2d(up["upsample"]["conv"], h)
    h = jax.nn.silu(_group_norm(params["norm_out"], h, g))
    return _conv2d(params["conv_out"], h)


def vae_encode(params: dict, cfg: AutoencoderConfig, x: jax.Array,
               noise_key=None) -> jax.Array:
    """Image [B, in, H, W] in [-1,1] → latents (mean, or sampled when a key
    is given) scaled for the DiT."""
    g = cfg.norm_num_groups
    h = _conv2d(params["conv_in"], x)
    n_levels = len(cfg.block_out_channels)
    for lvl in range(n_levels):
        dn = params["down"][str(lvl)]
        for i in range(cfg.layers_per_block):
            h = _resnet(dn["block"][str(i)], h, g)
        if lvl != n_levels - 1:
            h = jnp.pad(h, ((0, 0), (0, 0), (0, 1), (0, 1)))
            h = _conv2d(dn["downsample"]["conv"], h, stride=2, padding=0)
    h = _resnet(params["mid"]["block_1"], h, g)
    h = _attn(params["mid"]["attn_1"], h, g)
    h = _resnet(params["mid"]["block_2"], h, g)
    h = jax.nn.silu(_group_norm(params["norm_out"], h, g))
    moments = _conv2d(params["conv_out"], h)
    mean, logvar = jnp.split(moments, 2, axis=1)
    if noise_key is not None:
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        mean = mean + std * jax.random.normal(noise_key, mean.shape, mean.dtype)
    return (mean - cfg.shift_factor) * cfg.scaling_factor


# --------------------------------------------------------------------------
# parameters
# --------------------------------------------------------------------------


def load_vae_params(sd: Mapping[str, np.ndarray], cfg: AutoencoderConfig,
                    prefix: str = "decoder.", dtype=jnp.float32) -> dict:
    """Nested param dict mirroring the BFL tensor names under ``prefix``
    (``decoder.`` or ``encoder.``)."""
    tree: dict = {}
    for name, arr in sd.items():
        if not name.startswith(prefix):
            continue
        parts = name[len(prefix):].split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(np.asarray(arr, np.float32), dtype)
    return tree


def init_vae_params(cfg: AutoencoderConfig, seed: int = 0,
                    decoder: bool = True, scale: float = 0.05) -> dict:
    """Random decoder/encoder params with BFL names (testing)."""
    rng = np.random.default_rng(seed)
    sd: dict[str, np.ndarray] = {}
    pre = "decoder." if decoder else "encoder."

    def conv(name, o, i, k=3):
        sd[pre + name + ".weight"] = rng.standard_normal((o, i, k, k), np.float32) * scale
        sd[pre + name + ".bias"] = np.zeros((o,), np.float32)

    def norm(name, c):
        sd[pre + name + ".weight"] = np.ones((c,), np.float32)
        sd[pre + name + ".bias"] = np.zeros((c,), np.float32)

    def resnet(name, i, o):
        norm(name + ".norm1", i)
        conv(name + ".conv1", o, i)
        norm(name + ".norm2", o)
        conv(name + ".conv2", o, o)
        if i != o:
            conv(name + ".nin_shortcut", o, i, k=1)

    def attn(name, c):
        norm(name + ".norm", c)
        for q in ("q", "k", "v", "proj_out"):
            conv(name + "." + q, c, c, k=1)

    chans = list(cfg.block_out_channels)
    top = chans[-1]
    if decoder:
        conv("conv_in", top, cfg.latent_channels)
        resnet("mid.block_1", top, top)
        attn("mid.attn_1", top)
        resnet("mid.block_2", top, top)
        block_in = top
        for lvl in reversed(range(len(chans))):
            out = chans[lvl]
            for i in range(cfg.layers_per_block + 1):
                resnet(f"up.{lvl}.block.{i}", block_in, out)
                block_in = out
            if lvl != 0:
                conv(f"up.{lvl}.upsample.conv", out, out)
        norm("norm_out", chans[0])
        conv("conv_out", cfg.out_channels, chans[0])
    else:
        conv("conv_in", chans[0], cfg.in_channels)
        block_in = chans[0]
        for lvl, out in enumerate(chans):
            for i in range(cfg.layers_per_block):
                resnet(f"down.{lvl}.block.{i}", block_in, out)
                block_in = out
            if lvl != len(chans) - 1:
                conv(f"down.{lvl}.downsample.conv", block_in, block_in)
        resnet("mid.block_1", block_in, block_in)
        attn("mid.attn_1", block_in)
        resnet("mid.block_2", block_in, block_in)
        norm("norm_out", block_in)
        conv("conv_out", 2 * cfg.latent_channels, block_in)
    return load_vae_params(sd, cfg, prefix=pre)
