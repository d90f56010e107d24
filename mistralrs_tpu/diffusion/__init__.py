"""Diffusion models — the analog of the reference's
`mistralrs-core/src/diffusion_models/` (FLUX rectified-flow transformer,
its VAE, and the T5/CLIP text encoders that condition it)."""

from .flux_model import (  # noqa: F401
    FluxConfig,
    denoise,
    flux_forward,
    get_noise,
    get_schedule,
    init_flux_params,
    pack_latents,
    unpack_latents,
)
from .vae import AutoencoderConfig, vae_decode, vae_encode  # noqa: F401
