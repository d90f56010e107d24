"""DAC (Descript audio codec) decoder — the vocoder that turns Dia's audio
codebook tokens into a waveform (the analog of the reference's
`speech_models/dia/dac.rs`). Logit-parity-tested against HF `DacModel`.

codes [B, n_codebooks, T] → per-codebook embeddings → 1x1 out-projections
summed → snake-activated conv stack with transposed-conv upsampling → tanh
waveform [B, 1, T * prod(upsampling_ratios)].
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class DacDecoderConfig:
    hidden_size: int = 1024  # latent dim
    decoder_hidden_size: int = 1536
    upsampling_ratios: tuple[int, ...] = (8, 8, 4, 2)
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8
    sampling_rate: int = 44100

    @classmethod
    def from_hf(cls, d: Mapping) -> "DacDecoderConfig":
        return cls(
            hidden_size=d["hidden_size"],
            decoder_hidden_size=d["decoder_hidden_size"],
            upsampling_ratios=tuple(d["upsampling_ratios"]),
            n_codebooks=d["n_codebooks"],
            codebook_size=d["codebook_size"],
            codebook_dim=d["codebook_dim"],
            sampling_rate=d.get("sampling_rate", 44100),
        )


def _snake(x, alpha):
    """x + sin²(αx)/α — the periodic Snake activation (NCW layout)."""
    return x + jnp.sin(alpha * x) ** 2 / (alpha + 1e-9)


def _conv1d(p, x, stride=1, padding=0, dilation=1):
    y = jax.lax.conv_general_dilated(
        x, p["weight"], (stride,), [(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y + p["bias"][None, :, None]


def _conv_transpose1d(p, x, stride, padding):
    """torch ConvTranspose1d semantics: weight [in, out, k]."""
    k = p["weight"].shape[-1]
    w = jnp.flip(p["weight"], axis=-1).transpose(1, 0, 2)  # → [out, in, k]
    y = jax.lax.conv_general_dilated(
        x, w, (1,), [(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y + p["bias"][None, :, None]


def dac_decode_codes(params: dict, cfg: DacDecoderConfig,
                     codes: jax.Array) -> jax.Array:
    """codes [B, n_codebooks, T] int32 → waveform [B, samples] in [-1, 1]."""
    # RVQ reconstruction: per-codebook embedding + 1x1 out_proj, summed
    z = 0.0
    for i in range(cfg.n_codebooks):
        q = params["quantizers"][i]
        lat = q["codebook"][codes[:, i]]  # [B, T, codebook_dim]
        lat = jnp.swapaxes(lat, 1, 2)  # NCW
        z = z + _conv1d(q["out_proj"], lat)

    d = params["decoder"]
    h = _conv1d(d["conv1"], z, padding=3)
    for bi, stride in enumerate(cfg.upsampling_ratios):
        blk = d["block"][bi]
        h = _snake(h, blk["snake1_alpha"])
        h = _conv_transpose1d(blk["conv_t1"], h, stride, math.ceil(stride / 2))
        for r in ("res_unit1", "res_unit2", "res_unit3"):
            ru = blk[r]
            dil = {"res_unit1": 1, "res_unit2": 3, "res_unit3": 9}[r]
            pad = ((7 - 1) * dil) // 2
            y = _conv1d(ru["conv1"], _snake(h, ru["snake1_alpha"]),
                        padding=pad, dilation=dil)
            y = _conv1d(ru["conv2"], _snake(y, ru["snake2_alpha"]))
            h = h + y
    h = _snake(h, d["snake1_alpha"])
    h = _conv1d(d["conv2"], h, padding=3)
    return jnp.tanh(h)[:, 0]


def dac_params_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: DacDecoderConfig, dtype=jnp.float32
) -> dict:
    def g(n):
        return jnp.asarray(np.asarray(sd[n], np.float32), dtype)

    def conv(pre):
        return {"weight": g(pre + ".weight"), "bias": g(pre + ".bias")}

    quantizers = []
    for i in range(cfg.n_codebooks):
        pre = f"quantizer.quantizers.{i}."
        quantizers.append({
            "codebook": g(pre + "codebook.weight"),
            "out_proj": conv(pre + "out_proj"),
        })
    blocks = []
    for bi in range(len(cfg.upsampling_ratios)):
        pre = f"decoder.block.{bi}."
        blk = {
            "snake1_alpha": g(pre + "snake1.alpha").reshape(1, -1, 1),
            "conv_t1": conv(pre + "conv_t1"),
        }
        for r in ("res_unit1", "res_unit2", "res_unit3"):
            blk[r] = {
                "snake1_alpha": g(pre + r + ".snake1.alpha").reshape(1, -1, 1),
                "conv1": conv(pre + r + ".conv1"),
                "snake2_alpha": g(pre + r + ".snake2.alpha").reshape(1, -1, 1),
                "conv2": conv(pre + r + ".conv2"),
            }
        blocks.append(blk)
    return {
        "quantizers": quantizers,
        "decoder": {
            "conv1": conv("decoder.conv1"),
            "block": blocks,
            "snake1_alpha": g("decoder.snake1.alpha").reshape(1, -1, 1),
            "conv2": conv("decoder.conv2"),
        },
    }
