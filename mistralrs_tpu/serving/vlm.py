"""Server-side vision-language plumbing — the analog of the reference's
per-family vision `InputsProcessor`s (`mistralrs-core/src/vision_models/*/
inputs_processor.rs`) + `mistralrs-vision` preprocessing, feeding the
engine's prompt-embeds path.

An adapter per family turns OpenAI `image_url` content parts into
1) the placeholder expansion spliced into the chat text (one literal
   image-token string repeated per merged vision token), and
2) `Engine.add_request` kwargs (`prompt_embeds`, qwen2-vl
   `mrope_positions`) built via the model's `prepare_multimodal_prompt`.

Zero-egress deployment: images arrive as `data:` URIs (base64) — http(s)
URLs are rejected at the route.
"""

from __future__ import annotations

import base64
import io
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import numpy as np

from ..multimodal import EncoderCache
from ..vision.transforms import CLIP_MEAN, CLIP_STD, preprocess_image


def decode_image_url(url: str) -> np.ndarray:
    """`data:image/...;base64,<payload>` (or bare base64) → HWC uint8 RGB."""
    if url.startswith("http://") or url.startswith("https://"):
        raise ValueError(
            "remote image URLs are not fetched (zero-egress deployment); "
            "send images as data: URIs"
        )
    payload = url.split(",", 1)[1] if url.startswith("data:") else url
    raw = base64.b64decode(payload)
    try:
        from PIL import Image

        img = Image.open(io.BytesIO(raw)).convert("RGB")
        return np.asarray(img, np.uint8)
    except ImportError:  # PIL-free fallback: raw .npy payloads
        arr = np.load(io.BytesIO(raw), allow_pickle=False)
        return np.asarray(arr, np.uint8)


@dataclass
class ProcessedMedia:
    pixels: Any  # family-specific stacked array
    counts: list[int]  # merged vision tokens per image
    extras: dict = field(default_factory=dict)  # e.g. {"grid_thw": (t,h,w)}


@dataclass
class VlmAdapter:
    """Family-specific bridge from decoded media to engine kwargs."""

    family: str
    image_token: str  # literal placeholder string in chat text
    process: Callable[[list], ProcessedMedia]
    prepare: Callable[[list[int], ProcessedMedia], dict]
    # placeholder expansion for one image (default: token string × count)
    expansion: Optional[Callable[[int], str]] = None
    # video support (qwen-VL families): placeholder token + expansion for
    # one video span (reference serves `video_url` parts through the same
    # processors, server-core/src/video.rs + qwen2vl/inputs_processor.rs)
    video_token: Optional[str] = None
    video_expansion: Optional[Callable[[int], str]] = None
    # audio placeholder for mixed-modality families (phi4mm); audio-only
    # families (voxtral) use image_token as the audio placeholder
    audio_token: Optional[str] = None

    @property
    def supports_video(self) -> bool:
        return self.video_token is not None

    def expand(self, count: int) -> str:
        if self.expansion is not None:
            return self.expansion(count)
        return self.image_token * count

    def expand_media(self, kind: str, count: int) -> str:
        if kind == "video":
            if self.video_expansion is not None:
                return self.video_expansion(count)
            if self.video_token is None:
                raise ValueError(
                    f"{self.family} serving does not accept video input"
                )
            return self.video_token * count
        if kind == "audio" and self.audio_token is not None:
            return self.audio_token * count
        return self.expand(count)


def llava_adapter(
    weights: dict, cfg, *, image_token: str = "<image>",
    encoder_cache: Optional[EncoderCache] = None, compute_dtype=None,
) -> VlmAdapter:
    from ..models.llava import prepare_multimodal_prompt

    import jax.numpy as jnp

    dtype = compute_dtype or jnp.bfloat16
    size = cfg.vision.image_size
    n_tok = (size // cfg.vision.patch_size) ** 2
    if not cfg.drop_cls_token and cfg.vision.use_class_token:
        n_tok += 1
    cache = encoder_cache or EncoderCache()

    def process(images):
        px = np.stack([preprocess_image(im, size=size) for im in images])
        return ProcessedMedia(px, [n_tok] * len(images))

    def prepare(prompt_ids, media):
        _, embeds, _ = prepare_multimodal_prompt(
            weights, cfg, prompt_ids, media.pixels,
            encoder_cache=cache, compute_dtype=dtype,
        )
        return {"prompt_embeds": embeds}

    return VlmAdapter("llava", image_token, process, prepare)


def idefics3_adapter(
    weights: dict, cfg, *, image_token: str = "<image>",
    encoder_cache: Optional[EncoderCache] = None, compute_dtype=None,
) -> VlmAdapter:
    """Single-tile path (no image splitting yet — one resized global tile
    per image, the reference's `do_image_splitting=false` mode)."""
    from ..models.idefics3 import prepare_multimodal_prompt

    import jax.numpy as jnp

    dtype = compute_dtype or jnp.bfloat16
    size = cfg.vision.image_size
    n_tok = (size // cfg.vision.patch_size) ** 2 // cfg.scale_factor**2
    cache = encoder_cache or EncoderCache()

    def process(images):
        px = np.stack([
            preprocess_image(im, size=size, mean=(0.5,) * 3, std=(0.5,) * 3)
            for im in images
        ])
        return ProcessedMedia(px, [n_tok] * len(images))

    def prepare(prompt_ids, media):
        _, embeds, _ = prepare_multimodal_prompt(
            weights, cfg, prompt_ids, media.pixels,
            encoder_cache=cache, compute_dtype=dtype,
        )
        return {"prompt_embeds": embeds}

    return VlmAdapter("idefics3", image_token, process, prepare)


def gemma3_adapter(
    weights: dict, cfg, *, image_token: str = "<image_soft_token>",
    boi: str = "<start_of_image>", eoi: str = "<end_of_image>",
    encoder_cache: Optional[EncoderCache] = None, compute_dtype=None,
) -> VlmAdapter:
    from ..models.gemma3_vl import prepare_multimodal_prompt

    import jax.numpy as jnp

    dtype = compute_dtype or jnp.bfloat16
    size = cfg.vision.image_size
    n_tok = cfg.mm_tokens_per_image
    cache = encoder_cache or EncoderCache()

    def process(images):
        px = np.stack([
            preprocess_image(im, size=size, mean=(0.5,) * 3, std=(0.5,) * 3,
                             resample="bilinear")
            for im in images
        ])
        return ProcessedMedia(px, [n_tok] * len(images))

    def prepare(prompt_ids, media):
        _, embeds, _ = prepare_multimodal_prompt(
            weights, cfg, prompt_ids, media.pixels,
            encoder_cache=cache, compute_dtype=dtype,
        )
        return {"prompt_embeds": embeds}

    return VlmAdapter(
        "gemma3", image_token, process, prepare,
        expansion=lambda n: f"\n\n{boi}{image_token * n}{eoi}\n\n",
    )


def gemma4_adapter(
    weights: dict, cfg, *, image_token: str = "<image_soft_token>",
    boi: str = "<start_of_image>", eoi: str = "<end_of_image>",
    encoder_cache: Optional[EncoderCache] = None, compute_dtype=None,
    image_size: int = 448,
) -> VlmAdapter:
    """Gemma 4 multimodal serving: VisionTower (2-D rotary encoder +
    position-binned pooling, vision/gemma4.py) → Gemma4MultimodalEmbedder →
    merged prompt embeds for the engine's Gemma4Adapter (the tower path of
    `vision_models/gemma4/mod.rs:360-430`). `weights` carries
    {"text": ..., "vision": ..., "embed_vision": ...}; `cfg` carries
    .text (Gemma4Config), .vision (Gemma4VisionConfig), .image_token_id."""
    from ..vision.gemma4 import multimodal_embed, vision_tower_encode

    import jax.numpy as jnp

    dtype = compute_dtype or jnp.float32
    vcfg = cfg.vision
    k = vcfg.pooling_kernel_size
    # resize to the adapter's square budget (multiple of patch·pool)
    quantum = vcfg.patch_size * k
    size = (image_size // quantum) * quantum
    n_tok = (size // vcfg.patch_size) ** 2 // (k * k)
    cache = encoder_cache or EncoderCache()

    def process(images):
        # the tower scales patches to [−1, 1] itself — feed raw [0, 1]
        px = np.stack([
            preprocess_image(im, size=size, mean=(0.0,) * 3, std=(1.0,) * 3)
            for im in images
        ])
        return ProcessedMedia(px, [n_tok] * len(images))

    def prepare(prompt_ids, media):
        from ..multimodal import prepare_vlm_prompt

        def encode(pv):
            toks = [
                multimodal_embed(
                    weights["embed_vision"],
                    vision_tower_encode(
                        weights["vision"], vcfg, jnp.asarray(p_, dtype)),
                    vcfg.rms_norm_eps,
                )
                for p_ in pv
            ]
            return jnp.stack(toks)

        _, embeds, _ = prepare_vlm_prompt(
            prompt_ids, media.pixels,
            embed_weights=weights["text"]["embed"],
            image_token_id=cfg.image_token_id,
            encode=encode,
            encoder_cache=cache,
            cache_namespace="gemma4",
            embed_multiplier=cfg.text.hidden_size ** 0.5,
            compute_dtype=dtype,
        )
        return {"prompt_embeds": embeds}

    return VlmAdapter(
        "gemma4", image_token, process, prepare,
        expansion=lambda n: f"\n\n{boi}{image_token * n}{eoi}\n\n",
    )


def qwen2vl_smart_resize(
    h: int, w: int, factor: int, min_pixels: int = 56 * 56,
    max_pixels: int = 14 * 14 * 4 * 1280,
) -> tuple[int, int]:
    """HF `smart_resize`: round dims to `factor`, keep area in budget."""
    import math

    if max(h, w) / min(h, w) > 200:
        raise ValueError("absurd aspect ratio")
    hb = max(factor, round(h / factor) * factor)
    wb = max(factor, round(w / factor) * factor)
    if hb * wb > max_pixels:
        beta = math.sqrt((h * w) / max_pixels)
        hb = math.floor(h / beta / factor) * factor
        wb = math.floor(w / beta / factor) * factor
    elif hb * wb < min_pixels:
        beta = math.sqrt(min_pixels / (h * w))
        hb = math.ceil(h * beta / factor) * factor
        wb = math.ceil(w * beta / factor) * factor
    return hb, wb


def qwen2vl_patchify_frames(
    frames: np.ndarray, patch: int, merge: int, tps: int,
    mean=CLIP_MEAN, std=CLIP_STD,
) -> tuple[np.ndarray, tuple[int, int, int]]:
    """[N, H, W, C] uint8 frames → ([grid_t*h*w, C*tps*p*p] patches,
    grid_thw) with HF's merge-window-major ordering — the VIDEO general
    case (grid_t = ⌈N/tps⌉; consecutive tps frames share one temporal
    patch, image_processing_qwen2_vl.py). A still image is the N=1 special
    case (repeated to tps)."""
    n, h0, w0 = frames.shape[:3]
    rh, rw = qwen2vl_smart_resize(h0, w0, patch * merge)

    def resize(img):
        try:
            from PIL import Image

            return np.asarray(
                Image.fromarray(img).resize((rw, rh), Image.BICUBIC),
                np.float32) / 255.0
        except ImportError:
            yi = (np.arange(rh) * h0 // rh).clip(0, h0 - 1)
            xi = (np.arange(rw) * w0 // rw).clip(0, w0 - 1)
            return np.asarray(img, np.float32)[yi][:, xi] / 255.0

    arr = np.stack([resize(f) for f in frames])  # [N, rh, rw, C]
    arr = (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    chw = arr.transpose(0, 3, 1, 2)  # [N, C, H, W]
    if n % tps:  # pad to a tps multiple by repeating the last frame
        chw = np.concatenate(
            [chw, np.repeat(chw[-1:], (-n) % tps, axis=0)]
        )
    c = chw.shape[1]
    gt, gh, gw = chw.shape[0] // tps, rh // patch, rw // patch
    p = chw.reshape(
        gt, tps, c, gh // merge, merge, patch, gw // merge, merge, patch
    )
    p = p.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return (
        p.reshape(gt * gh * gw, c * tps * patch * patch).astype(np.float32),
        (gt, gh, gw),
    )


def qwen2vl_patchify(
    image: np.ndarray, patch: int, merge: int, tps: int,
    mean=CLIP_MEAN, std=CLIP_STD,
) -> tuple[np.ndarray, tuple[int, int, int]]:
    """HWC uint8 still image → patches (grid_t = 1)."""
    return qwen2vl_patchify_frames(
        np.repeat(image[None], tps, axis=0), patch, merge, tps, mean, std
    )


def qwen2vl_adapter(
    weights: dict, cfg, *, image_token: str = "<|image_pad|>",
    video_token: str = "<|video_pad|>",
    vision_start: str = "<|vision_start|>", vision_end: str = "<|vision_end|>",
    encoder_cache: Optional[EncoderCache] = None, compute_dtype=None,
) -> VlmAdapter:
    from ..models.qwen2vl import prepare_multimodal_prompt

    import jax.numpy as jnp

    dtype = compute_dtype or jnp.bfloat16
    vis = cfg.vision
    cache = encoder_cache or EncoderCache()

    def process(items):
        from ..video import VideoInput

        if len(items) != 1:
            raise ValueError(
                "qwen2-vl serving currently supports one media item per "
                "request"
            )
        it = items[0]
        if isinstance(it, VideoInput):
            patches, grid = qwen2vl_patchify_frames(
                it.stacked(), vis.patch_size, vis.spatial_merge_size,
                vis.temporal_patch_size,
            )
            n = (grid[0] * grid[1] * grid[2]) // vis.spatial_merge_size**2
            return ProcessedMedia(patches, [n], {
                "grid_thw": grid, "kind": "video",
                "frame_hashes": it.frame_hashes(),
            })
        patches, grid = qwen2vl_patchify(
            it, vis.patch_size, vis.spatial_merge_size,
            vis.temporal_patch_size,
        )
        n = (grid[0] * grid[1] * grid[2]) // vis.spatial_merge_size**2
        return ProcessedMedia(patches, [n], {"grid_thw": grid})

    def prepare(prompt_ids, media):
        is_video = media.extras.get("kind") == "video"
        _, embeds, _, pos3 = prepare_multimodal_prompt(
            weights, cfg, prompt_ids, media.pixels,
            media.extras["grid_thw"], encoder_cache=cache,
            compute_dtype=dtype,
            media_token_id=(getattr(cfg, "video_token_id", None)
                            if is_video else None),
        )
        return {"prompt_embeds": embeds, "mrope_positions": pos3}

    return VlmAdapter(
        "qwen2vl", image_token, process, prepare,
        expansion=lambda n: f"{vision_start}{image_token * n}{vision_end}",
        video_token=video_token,
        video_expansion=lambda n: f"{vision_start}{video_token * n}{vision_end}",
    )


def qwen25vl_adapter(
    weights: dict, cfg, *, image_token: str = "<|image_pad|>",
    vision_start: str = "<|vision_start|>", vision_end: str = "<|vision_end|>",
    encoder_cache: Optional[EncoderCache] = None, compute_dtype=None,
) -> VlmAdapter:
    """Qwen2.5-VL: qwen2-vl patchify, windowed tower, M-RoPE kwargs."""
    from ..models.qwen2vl import qwen25vl_prepare_multimodal_prompt

    import jax.numpy as jnp

    dtype = compute_dtype or jnp.bfloat16
    vis = cfg.vision
    cache = encoder_cache or EncoderCache()

    def process(items):
        from ..video import VideoInput

        if len(items) != 1:
            raise ValueError(
                "qwen2.5-vl serving currently supports one media item per "
                "request"
            )
        it = items[0]
        if isinstance(it, VideoInput):
            patches, grid = qwen2vl_patchify_frames(
                it.stacked(), vis.patch_size, vis.spatial_merge_size,
                vis.temporal_patch_size,
            )
            n = (grid[0] * grid[1] * grid[2]) // vis.spatial_merge_size**2
            return ProcessedMedia(patches, [n], {
                "grid_thw": grid, "kind": "video",
                "frame_hashes": it.frame_hashes(),
            })
        patches, grid = qwen2vl_patchify(
            it, vis.patch_size, vis.spatial_merge_size,
            vis.temporal_patch_size,
        )
        n = (grid[0] * grid[1] * grid[2]) // vis.spatial_merge_size**2
        return ProcessedMedia(patches, [n], {"grid_thw": grid})

    def prepare(prompt_ids, media):
        is_video = media.extras.get("kind") == "video"
        _, embeds, _, pos3 = qwen25vl_prepare_multimodal_prompt(
            weights, cfg, prompt_ids, media.pixels,
            media.extras["grid_thw"], encoder_cache=cache,
            compute_dtype=dtype,
            media_token_id=(getattr(cfg, "video_token_id", None)
                            if is_video else None),
        )
        return {"prompt_embeds": embeds, "mrope_positions": pos3}

    video_token = "<|video_pad|>"
    return VlmAdapter(
        "qwen25vl", image_token, process, prepare,
        expansion=lambda n: f"{vision_start}{image_token * n}{vision_end}",
        video_token=video_token,
        video_expansion=lambda n: f"{vision_start}{video_token * n}{vision_end}",
    )


def qwen3vl_adapter(
    weights: dict, cfg, *, image_token: str = "<|image_pad|>",
    vision_start: str = "<|vision_start|>", vision_end: str = "<|vision_end|>",
    encoder_cache: Optional[EncoderCache] = None, compute_dtype=None,
) -> VlmAdapter:
    """Qwen3-VL: same smart-resize patchify as qwen2-vl; prepare returns
    the DeepStack rows alongside embeds + interleaved M-RoPE streams."""
    from ..models.qwen3_vl import prepare_multimodal_prompt

    import jax.numpy as jnp

    dtype = compute_dtype or jnp.bfloat16
    vis = cfg.vision
    cache = encoder_cache or EncoderCache()

    def process(items):
        from ..video import VideoInput

        if len(items) != 1:
            raise ValueError(
                "qwen3-vl serving currently supports one media item per "
                "request"
            )
        it = items[0]
        if isinstance(it, VideoInput):
            patches, grid = qwen2vl_patchify_frames(
                it.stacked(), vis.patch_size, vis.spatial_merge_size,
                vis.temporal_patch_size,
            )
            n = (grid[0] * grid[1] * grid[2]) // vis.spatial_merge_size**2
            return ProcessedMedia(patches, [n], {
                "grid_thw": grid, "kind": "video",
                "frame_hashes": it.frame_hashes(),
            })
        patches, grid = qwen2vl_patchify(
            it, vis.patch_size, vis.spatial_merge_size,
            vis.temporal_patch_size,
        )
        n = (grid[0] * grid[1] * grid[2]) // vis.spatial_merge_size**2
        return ProcessedMedia(patches, [n], {"grid_thw": grid})

    def prepare(prompt_ids, media):
        is_video = media.extras.get("kind") == "video"
        _, embeds, _, pos3, ds_rows = prepare_multimodal_prompt(
            weights, cfg, prompt_ids, media.pixels,
            media.extras["grid_thw"], encoder_cache=cache,
            compute_dtype=dtype,
            media_token_id=(getattr(cfg, "video_token_id", None)
                            if is_video else None),
        )
        return {"prompt_embeds": embeds, "mrope_positions": pos3,
                "deepstack_embeds": ds_rows}

    video_token = "<|video_pad|>"
    return VlmAdapter(
        "qwen3vl", image_token, process, prepare,
        expansion=lambda n: f"{vision_start}{image_token * n}{vision_end}",
        video_token=video_token,
        video_expansion=lambda n: f"{vision_start}{video_token * n}{vision_end}",
    )


def qwen25omni_adapter(
    weights: dict, cfg, *, audio_token: str = "<|audio_pad|>",
    image_token: str = "<|image_pad|>",
    encoder_cache: Optional[EncoderCache] = None, compute_dtype=None,
) -> VlmAdapter:
    """Qwen2.5-Omni thinker: audio (waveform → whisper mel → chunked
    tower) or image (qwen2.5-vl tower) per request."""
    from ..audio.mel import log_mel_spectrogram
    from ..models.qwen25omni import num_audio_tokens, prepare_multimodal_prompt

    import jax.numpy as jnp

    dtype = compute_dtype or jnp.bfloat16
    cache = encoder_cache or EncoderCache()
    vis = cfg.vision

    def process(media):
        if len(media) != 1:
            raise ValueError("qwen2.5-omni serving: one media item per request")
        m = media[0]
        if np.asarray(m).ndim == 1:  # waveform
            wav = np.asarray(m, np.float32)
            pad = -len(wav) % 160 or 160
            mel = log_mel_spectrogram(
                wav, num_mel_bins=cfg.audio.num_mel_bins,
                pad_to_samples=len(wav) + pad,
            )
            return ProcessedMedia(mel, [num_audio_tokens(cfg, mel.shape[1])],
                                  {"kind": "audio"})
        patches, grid = qwen2vl_patchify(
            m, vis.patch_size, vis.spatial_merge_size, vis.temporal_patch_size
        )
        n = (grid[0] * grid[1] * grid[2]) // vis.spatial_merge_size**2
        return ProcessedMedia(patches, [n], {"kind": "image",
                                             "grid_thw": grid})

    def prepare(prompt_ids, media):
        if media.extras["kind"] == "audio":
            _, embeds, _, _ = prepare_multimodal_prompt(
                weights, cfg, prompt_ids, mel=media.pixels,
                encoder_cache=cache, compute_dtype=dtype,
            )
            return {"prompt_embeds": embeds}
        _, embeds, _, pos3 = prepare_multimodal_prompt(
            weights, cfg, prompt_ids, patches=media.pixels,
            grid_thw=media.extras["grid_thw"], encoder_cache=cache,
            compute_dtype=dtype,
        )
        return {"prompt_embeds": embeds, "mrope_positions": pos3}

    return VlmAdapter("qwen25omni", audio_token, process, prepare)


def qwen3_5_adapter(
    weights: dict, cfg, *, image_token: str = "<|image_pad|>",
    vision_start: str = "<|vision_start|>", vision_end: str = "<|vision_end|>",
    encoder_cache: Optional[EncoderCache] = None, compute_dtype=None,
) -> VlmAdapter:
    """Qwen3.5: qwen2-vl patchify → DeepStack tower → hybrid GDN text
    (embeds + M-RoPE + deepstack through the Qwen3NextAdapter)."""
    from ..models.qwen3_5 import prepare_multimodal_prompt

    import jax.numpy as jnp

    dtype = compute_dtype or jnp.bfloat16
    vis = cfg.vision
    cache = encoder_cache or EncoderCache()

    def process(images):
        if len(images) != 1:
            raise ValueError("qwen3.5 serving: one image per request")
        patches, grid = qwen2vl_patchify(
            images[0], vis.patch_size, vis.spatial_merge_size,
            vis.temporal_patch_size,
        )
        n = (grid[0] * grid[1] * grid[2]) // vis.spatial_merge_size**2
        return ProcessedMedia(patches, [n], {"grid_thw": grid})

    def prepare(prompt_ids, media):
        _, embeds, _, pos3, ds_rows = prepare_multimodal_prompt(
            weights, cfg, prompt_ids, media.pixels,
            media.extras["grid_thw"], encoder_cache=cache,
            compute_dtype=dtype,
        )
        return {"prompt_embeds": embeds, "mrope_positions": pos3,
                "deepstack_embeds": ds_rows}

    return VlmAdapter(
        "qwen3_5", image_token, process, prepare,
        expansion=lambda n: f"{vision_start}{image_token * n}{vision_end}",
    )


def qwen3omni_adapter(
    weights: dict, cfg, *, audio_token: str = "<|audio_pad|>",
    encoder_cache: Optional[EncoderCache] = None, compute_dtype=None,
) -> VlmAdapter:
    """Qwen3-Omni thinker (audio understanding): waveform → whisper mel →
    /8 chunked tower → qwen3-moe decoder."""
    from ..audio.mel import log_mel_spectrogram
    from ..models.qwen3omni import num_audio_tokens, prepare_multimodal_prompt

    import jax.numpy as jnp

    dtype = compute_dtype or jnp.bfloat16
    cache = encoder_cache or EncoderCache()

    def process(media):
        if len(media) != 1:
            raise ValueError("qwen3-omni serving: one audio per request")
        wav = np.asarray(media[0], np.float32)
        pad = -len(wav) % 160 or 160
        mel = log_mel_spectrogram(
            wav, num_mel_bins=cfg.audio.num_mel_bins,
            pad_to_samples=len(wav) + pad,
        )
        return ProcessedMedia(mel, [num_audio_tokens(cfg, mel.shape[1])])

    def prepare(prompt_ids, media):
        _, embeds, _ = prepare_multimodal_prompt(
            weights, cfg, prompt_ids, media.pixels,
            encoder_cache=cache, compute_dtype=dtype,
        )
        return {"prompt_embeds": embeds}

    return VlmAdapter("qwen3omni", audio_token, process, prepare)


def glm4v_adapter(
    weights: dict, cfg, *, image_token: str = "<|image|>",
    begin_image: str = "<|begin_of_image|>", end_image: str = "<|end_of_image|>",
    encoder_cache: Optional[EncoderCache] = None, compute_dtype=None,
) -> VlmAdapter:
    """GLM-4V: qwen2-vl-style smart-resize patchify; M-RoPE kwargs."""
    from ..models.glm4v import prepare_multimodal_prompt

    import jax.numpy as jnp

    dtype = compute_dtype or jnp.bfloat16
    vis = cfg.vision
    cache = encoder_cache or EncoderCache()

    def process(images):
        if len(images) != 1:
            raise ValueError(
                "glm4v serving currently supports one image per request"
            )
        patches, grid = qwen2vl_patchify(
            images[0], vis.patch_size, vis.spatial_merge_size,
            vis.temporal_patch_size,
        )
        n = (grid[0] * grid[1] * grid[2]) // vis.spatial_merge_size**2
        return ProcessedMedia(patches, [n], {"grid_thw": grid})

    def prepare(prompt_ids, media):
        _, embeds, _, pos3 = prepare_multimodal_prompt(
            weights, cfg, prompt_ids, media.pixels,
            media.extras["grid_thw"], encoder_cache=cache,
            compute_dtype=dtype,
        )
        return {"prompt_embeds": embeds, "mrope_positions": pos3}

    return VlmAdapter(
        "glm4v", image_token, process, prepare,
        expansion=lambda n: f"{begin_image}{image_token * n}{end_image}",
    )


def llama4_adapter(
    weights: dict, cfg, *, image_token: str = "<|image|>",
    encoder_cache: Optional[EncoderCache] = None, compute_dtype=None,
) -> VlmAdapter:
    """Single-tile path: one resized global tile per image (the reference's
    llama4 inputs processor additionally tiles by aspect ratio)."""
    from ..models.llama4 import prepare_multimodal_prompt

    import jax.numpy as jnp

    dtype = compute_dtype or jnp.bfloat16
    vis = cfg.vision
    size = vis.image_size
    n_tok = int(
        (size // vis.patch_size) ** 2 * vis.pixel_shuffle_ratio**2
    )
    cache = encoder_cache or EncoderCache()

    def process(images):
        px = np.stack([
            preprocess_image(im, size=size, mean=(0.5,) * 3, std=(0.5,) * 3)
            for im in images
        ])
        return ProcessedMedia(px, [n_tok] * len(images))

    def prepare(prompt_ids, media):
        _, embeds, _ = prepare_multimodal_prompt(
            weights, cfg, prompt_ids, media.pixels,
            encoder_cache=cache, compute_dtype=dtype,
        )
        return {"prompt_embeds": embeds}

    return VlmAdapter("llama4", image_token, process, prepare)


_BUILDER_NAMES = {
    "gemma4": "gemma4_adapter",
    "llava": "llava_adapter",
    "llama4": "llama4_adapter",
    "voxtral": "voxtral_adapter",
    "idefics3": "idefics3_adapter",
    "gemma3": "gemma3_adapter",
    "qwen2_vl": "qwen2vl_adapter",
    "mistral3": "mistral3_adapter",
    "llava_next": "llava_next_adapter",
    "idefics2": "idefics2_adapter",
    "phi4mm": "phi4mm_adapter",
    "lfm2_vl": "lfm2_vl_adapter",
    "qwen3_vl": "qwen3vl_adapter",
    "glm4v": "glm4v_adapter",
    "qwen2_5_vl": "qwen25vl_adapter",
    "qwen2_5_omni": "qwen25omni_adapter",
    "phi3v": "phi3v_adapter",
    "minicpmo": "minicpmo_adapter",
    "qwen3_5": "qwen3_5_adapter",
    "qwen3_omni_moe": "qwen3omni_adapter",
}


def build_adapter(family: str, weights: dict, cfg, **kw) -> VlmAdapter:
    if family not in _BUILDER_NAMES:
        raise ValueError(f"no VLM adapter for family {family!r}")
    return globals()[_BUILDER_NAMES[family]](weights, cfg, **kw)



def decode_audio(data: str, fmt: str = "wav") -> np.ndarray:
    """base64 WAV → float32 mono 16 kHz waveform (zero-egress: inline data
    only, like images)."""
    from ..audio.wav import read_wav, resample_linear

    raw = base64.b64decode(data)
    if fmt not in ("wav", ""):
        raise ValueError(f"audio format {fmt!r} not supported (wav only)")
    x, rate = read_wav(raw)
    return resample_linear(x, rate, 16000)


def voxtral_adapter(
    weights: dict, cfg, *, audio_token: str = "[AUDIO]",
    encoder_cache: Optional[EncoderCache] = None, compute_dtype=None,
) -> VlmAdapter:
    """Audio-understanding adapter: waveform → 30 s log-mel chunks →
    Whisper-style encoder → audio tokens merged into the prompt."""
    from ..audio.mel import log_mel_spectrogram
    from ..audio.voxtral import prepare_multimodal_prompt

    import jax.numpy as jnp

    dtype = compute_dtype or jnp.bfloat16
    cache = encoder_cache or EncoderCache()
    frames_per_chunk = cfg.audio.max_source_positions  # after conv stride 2
    tok_per_chunk = (
        frames_per_chunk * cfg.audio.hidden_size // cfg.audio.intermediate_size
    )
    chunk_samples = frames_per_chunk * 2 * 160  # hop 160, conv2 stride 2

    def process(audios):
        mels = []
        counts = []
        for wav in audios:
            n_chunks = max(1, -(-len(wav) // chunk_samples))
            mel = log_mel_spectrogram(
                wav, num_mel_bins=cfg.audio.num_mel_bins,
                pad_to_samples=n_chunks * chunk_samples,
            )
            mels.append(mel.reshape(
                cfg.audio.num_mel_bins, n_chunks, -1
            ).transpose(1, 0, 2))
            counts.append(n_chunks * tok_per_chunk)
        return ProcessedMedia(np.concatenate(mels, axis=0), counts)

    def prepare(prompt_ids, media):
        _, embeds, _ = prepare_multimodal_prompt(
            weights, cfg, prompt_ids, media.pixels,
            encoder_cache=cache, compute_dtype=dtype,
        )
        return {"prompt_embeds": embeds}

    return VlmAdapter("voxtral", audio_token, process, prepare)


def mistral3_adapter(
    weights: dict, cfg, *, image_token: str = "[IMG]",
    img_break: str = "[IMG_BREAK]", img_end: str = "[IMG_END]",
    encoder_cache: Optional[EncoderCache] = None, compute_dtype=None,
) -> VlmAdapter:
    """Pixtral/Mistral-3: variable-aspect crops (dims rounded to
    patch×merge multiples, longest side ≤ image_size) packed into one
    tower call; placeholder rows end with [IMG_BREAK] and the image with
    [IMG_END] (the pixtral prompt grammar)."""
    from ..models.mistral3 import prepare_multimodal_prompt

    import jax.numpy as jnp

    dtype = compute_dtype or jnp.bfloat16
    vis = cfg.vision
    m = cfg.spatial_merge_size
    unit = vis.patch_size * m
    cache = encoder_cache or EncoderCache()

    def _resize(im: np.ndarray) -> np.ndarray:
        h, w = im.shape[:2]
        scale = min(1.0, vis.image_size / max(h, w))
        th = max(unit, int(-(-h * scale // unit) * unit))
        tw = max(unit, int(-(-w * scale // unit) * unit))
        th = min(th, vis.image_size)
        tw = min(tw, vis.image_size)
        try:
            from PIL import Image

            arr = np.asarray(
                Image.fromarray(im).resize((tw, th), Image.BICUBIC), np.float32
            ) / 255.0
        except ImportError:
            yi = (np.arange(th) * h // th).clip(0, h - 1)
            xi = (np.arange(tw) * w // tw).clip(0, w - 1)
            arr = np.asarray(im, np.float32)[yi][:, xi] / 255.0
        arr = (arr - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(
            CLIP_STD, np.float32
        )
        return arr.transpose(2, 0, 1)

    grids: dict[int, tuple[int, int]] = {}

    def process(images):
        crops = [_resize(im) for im in images]
        counts = []
        for i, c in enumerate(crops):
            nh, nw = c.shape[1] // vis.patch_size // m, c.shape[2] // vis.patch_size // m
            grids[i] = (nh, nw)
            counts.append(nh * nw)
        return ProcessedMedia(crops, counts)

    def prepare(prompt_ids, media):
        _, embeds, _ = prepare_multimodal_prompt(
            weights, cfg, prompt_ids, media.pixels,
            encoder_cache=cache, compute_dtype=dtype,
        )
        return {"prompt_embeds": embeds}

    def expansion(count):
        # find the grid for this count (rows × cols); fall back to one row
        for nh, nw in grids.values():
            if nh * nw == count:
                row = image_token * nw + img_break
                return row * (nh - 1) + image_token * nw + img_end
        return image_token * count + img_end

    return VlmAdapter("mistral3", image_token, process, prepare,
                      expansion=expansion)


def llava_next_adapter(
    weights: dict, cfg, *, image_token: str = "<image>",
    encoder_cache: Optional[EncoderCache] = None, compute_dtype=None,
) -> VlmAdapter:
    """LLaVA-NeXT anyres: resize-with-aspect into the best pinpoint canvas
    (padded), split into SxS tiles, prepend the base thumbnail."""
    from ..models.llava_next import num_image_tokens, select_best_resolution
    from ..models.llava_next import prepare_multimodal_prompt as prep

    import jax.numpy as jnp

    dtype = compute_dtype or jnp.bfloat16
    size = cfg.vision.image_size
    cache = encoder_cache or EncoderCache()
    sizes: dict[int, tuple[int, int]] = {}

    def _norm(arr_hwc: np.ndarray) -> np.ndarray:
        arr = arr_hwc.astype(np.float32) / 255.0
        arr = (arr - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(
            CLIP_STD, np.float32
        )
        return arr.transpose(2, 0, 1)

    def _resize(im: np.ndarray, th: int, tw: int) -> np.ndarray:
        try:
            from PIL import Image

            return np.asarray(
                Image.fromarray(im).resize((tw, th), Image.BICUBIC), np.uint8
            )
        except ImportError:
            h, w = im.shape[:2]
            yi = (np.arange(th) * h // th).clip(0, h - 1)
            xi = (np.arange(tw) * w // tw).clip(0, w - 1)
            return im[yi][:, xi]

    def process(images):
        if len(images) != 1:
            raise ValueError("llava-next serving: one image per request")
        im = images[0]
        oh, ow = im.shape[:2]
        bh, bw = select_best_resolution((oh, ow), cfg.image_grid_pinpoints)
        scale = min(bw / ow, bh / oh)
        nh, nw = max(1, int(oh * scale)), max(1, int(ow * scale))
        canvas = np.zeros((bh, bw, 3), np.uint8)
        y0, x0 = (bh - nh) // 2, (bw - nw) // 2
        canvas[y0 : y0 + nh, x0 : x0 + nw] = _resize(im, nh, nw)
        tiles = [
            canvas[r : r + size, c : c + size]
            for r in range(0, bh, size)
            for c in range(0, bw, size)
        ]
        base = _resize(im, size, size)
        px = np.stack([_norm(t) for t in [base] + tiles])
        sizes[0] = (oh, ow)
        return ProcessedMedia(px, [num_image_tokens(cfg, (oh, ow))])

    def prepare(prompt_ids, media):
        _, embeds, _ = prep(
            weights, cfg, prompt_ids, media.pixels, sizes[0],
            encoder_cache=cache, compute_dtype=dtype,
        )
        return {"prompt_embeds": embeds}

    return VlmAdapter("llava_next", image_token, process, prepare)


def idefics2_adapter(
    weights: dict, cfg, *, image_token: str = "<image>",
    encoder_cache: Optional[EncoderCache] = None, compute_dtype=None,
) -> VlmAdapter:
    """Single-tile path (no image splitting): every image resamples to
    `n_latents` tokens."""
    from ..models.idefics2 import prepare_multimodal_prompt

    import jax.numpy as jnp

    dtype = compute_dtype or jnp.bfloat16
    size = cfg.vision.image_size
    cache = encoder_cache or EncoderCache()

    def process(images):
        px = np.stack([
            preprocess_image(im, size=size, mean=(0.5,) * 3, std=(0.5,) * 3)
            for im in images
        ])
        return ProcessedMedia(px, [cfg.n_latents] * len(images))

    def prepare(prompt_ids, media):
        _, embeds, _ = prepare_multimodal_prompt(
            weights, cfg, prompt_ids, media.pixels,
            encoder_cache=cache, compute_dtype=dtype,
        )
        return {"prompt_embeds": embeds}

    return VlmAdapter("idefics2", image_token, process, prepare)


def phi4mm_adapter(
    weights: dict, cfg, *, image_token: str = "<|image|>",
    audio_token: str = "<|audio|>",
    encoder_cache: Optional[EncoderCache] = None, compute_dtype=None,
    max_crops: int = 16,
) -> VlmAdapter:
    """Phi-4-multimodal HD assembly: the image is scaled into the best
    hr×wr crop grid (area ≤ max_crops), padded to crop multiples, split
    into crops with a global thumbnail FIRST (the reference's
    `phi4/inputs_processor.rs` dynamic-HD transform). AUDIO items (mono
    16 kHz waveforms from `input_audio` parts) run the conformer encoder
    + speech projection (`audio/phi4mm.py`; reference
    `vision_models/conformer/` + `phi4/mod.rs:448`)."""
    from ..models.phi4mm import num_image_tokens
    from ..models.phi4mm import prepare_multimodal_prompt as prep

    import jax.numpy as jnp

    dtype = compute_dtype or jnp.bfloat16
    s = cfg.crop_size
    cache = encoder_cache or EncoderCache()
    sizes: dict[int, tuple[int, int]] = {}

    def _norm(arr_hwc: np.ndarray) -> np.ndarray:
        arr = arr_hwc.astype(np.float32) / 255.0
        return ((arr - 0.5) / 0.5).transpose(2, 0, 1)

    def _resize(im: np.ndarray, th: int, tw: int) -> np.ndarray:
        try:
            from PIL import Image

            return np.asarray(
                Image.fromarray(im).resize((tw, th), Image.BICUBIC), np.uint8
            )
        except ImportError:
            h, w = im.shape[:2]
            yi = (np.arange(th) * h // th).clip(0, h - 1)
            xi = (np.arange(tw) * w // tw).clip(0, w - 1)
            return im[yi][:, xi]

    def process(images):
        if len(images) != 1:
            raise ValueError("phi4mm serving: one media item per request")
        im = images[0]
        if getattr(im, "ndim", 2) == 1:  # mono waveform → audio modality
            from ..audio.phi4mm import (
                phi4mm_audio_embed_sizes,
                phi4mm_logmel,
            )

            if getattr(cfg, "audio", None) is None or "audio" not in weights:
                raise ValueError(
                    "this phi4 checkpoint has no audio encoder"
                )
            mel = phi4mm_logmel(im)
            n = phi4mm_audio_embed_sizes(cfg.audio, mel.shape[0])
            return ProcessedMedia(mel, [n], {"kind": "audio"})
        oh, ow = im.shape[:2]
        # best grid: preserve aspect, total crops ≤ max_crops
        best, best_err = (1, 1), float("inf")
        for hr in range(1, max_crops + 1):
            for wr in range(1, max_crops // hr + 1):
                err = abs(hr / wr - oh / ow)
                if err < best_err or (err == best_err and hr * wr > best[0] * best[1]):
                    best, best_err = (hr, wr), err
        hr, wr = best
        canvas = _resize(im, hr * s, wr * s)
        crops = [
            canvas[r : r + s, c : c + s]
            for r in range(0, hr * s, s)
            for c in range(0, wr * s, s)
        ]
        glb = _resize(im, s, s)
        px = np.stack([_norm(t) for t in [glb] + crops])
        sizes[0] = (hr * s, wr * s)
        return ProcessedMedia(px, [num_image_tokens(cfg, sizes[0])])

    def prepare(prompt_ids, media):
        if media.extras.get("kind") == "audio":
            from ..models.phi4mm import prepare_audio_prompt

            _, embeds, _ = prepare_audio_prompt(
                weights, cfg, prompt_ids, media.pixels,
                encoder_cache=cache, compute_dtype=dtype,
            )
            return {"prompt_embeds": embeds}
        _, embeds, _ = prep(
            weights, cfg, prompt_ids, media.pixels, sizes[0],
            encoder_cache=cache, compute_dtype=dtype,
        )
        return {"prompt_embeds": embeds}

    return VlmAdapter("phi4mm", image_token, process, prepare,
                      audio_token=audio_token)


def minicpmo_adapter(
    weights: dict, cfg, *, image_token: str = "<image>",
    encoder_cache: Optional[EncoderCache] = None, compute_dtype=None,
) -> VlmAdapter:
    """MiniCPM-O single-tile path: every image resamples to query_num
    tokens."""
    from ..models.minicpmo import prepare_multimodal_prompt

    import jax.numpy as jnp

    dtype = compute_dtype or jnp.bfloat16
    size = cfg.vision.image_size
    cache = encoder_cache or EncoderCache()

    def process(images):
        px = np.stack([
            preprocess_image(im, size=size, mean=(0.5,) * 3, std=(0.5,) * 3)
            for im in images
        ])
        return ProcessedMedia(px, [cfg.query_num] * len(images))

    def prepare(prompt_ids, media):
        _, embeds, _ = prepare_multimodal_prompt(
            weights, cfg, prompt_ids, media.pixels,
            encoder_cache=cache, compute_dtype=dtype,
        )
        return {"prompt_embeds": embeds}

    return VlmAdapter("minicpmo", image_token, process, prepare)


def phi3v_adapter(
    weights: dict, cfg, *, image_token: str = "<|image_1|>",
    encoder_cache: Optional[EncoderCache] = None, compute_dtype=None,
    max_crops: int = 16,
) -> VlmAdapter:
    """Phi-3-vision HD transform: best-aspect crop grid (area ≤ max_crops),
    global thumbnail FIRST, CLIP normalization."""
    from ..models.phi3v import num_image_tokens
    from ..models.phi3v import prepare_multimodal_prompt as prep

    import jax.numpy as jnp

    dtype = compute_dtype or jnp.bfloat16
    s = cfg.crop_size
    cache = encoder_cache or EncoderCache()
    sizes: dict[int, tuple[int, int]] = {}

    def _norm(arr_hwc: np.ndarray) -> np.ndarray:
        arr = arr_hwc.astype(np.float32) / 255.0
        arr = (arr - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(
            CLIP_STD, np.float32
        )
        return arr.transpose(2, 0, 1)

    def _resize(im: np.ndarray, th: int, tw: int) -> np.ndarray:
        try:
            from PIL import Image

            return np.asarray(
                Image.fromarray(im).resize((tw, th), Image.BICUBIC), np.uint8
            )
        except ImportError:
            h, w = im.shape[:2]
            yi = (np.arange(th) * h // th).clip(0, h - 1)
            xi = (np.arange(tw) * w // tw).clip(0, w - 1)
            return im[yi][:, xi]

    def process(images):
        if len(images) != 1:
            raise ValueError("phi3v serving: one image per request")
        im = images[0]
        oh, ow = im.shape[:2]
        best, best_err = (1, 1), float("inf")
        for hr in range(1, max_crops + 1):
            for wr in range(1, max_crops // hr + 1):
                err = abs(hr / wr - oh / ow)
                if err < best_err or (err == best_err and hr * wr > best[0] * best[1]):
                    best, best_err = (hr, wr), err
        hr, wr = best
        canvas = _resize(im, hr * s, wr * s)
        crops = [
            canvas[r : r + s, c : c + s]
            for r in range(0, hr * s, s)
            for c in range(0, wr * s, s)
        ]
        glb = _resize(im, s, s)
        px = np.stack([_norm(t) for t in [glb] + crops])
        sizes[0] = (hr * s, wr * s)
        return ProcessedMedia(px, [num_image_tokens(cfg, sizes[0])])

    def prepare(prompt_ids, media):
        _, embeds, _ = prep(
            weights, cfg, prompt_ids, media.pixels, sizes[0],
            encoder_cache=cache, compute_dtype=dtype,
        )
        return {"prompt_embeds": embeds}

    return VlmAdapter("phi3v", image_token, process, prepare)


def lfm2_vl_adapter(
    weights: dict, cfg, *, image_token: str = "<image>",
    encoder_cache: Optional[EncoderCache] = None, compute_dtype=None,
    max_patches: int = 1024,
) -> VlmAdapter:
    """LFM2-VL NaFlex preprocessing: resize so the patch grid is a multiple
    of the downsample factor with area ≤ max_patches, then pre-patchify
    channel-LAST (ph, pw, c) — the Siglip2 processor's patch layout."""
    from ..models.lfm2_vl import num_image_tokens
    from ..models.lfm2_vl import prepare_multimodal_prompt as prep

    import jax.numpy as jnp

    dtype = compute_dtype or jnp.bfloat16
    p = cfg.vision.patch_size
    f = cfg.downsample_factor
    cache = encoder_cache or EncoderCache()
    shapes: dict[int, tuple[int, int]] = {}

    def _resize(im: np.ndarray, th: int, tw: int) -> np.ndarray:
        try:
            from PIL import Image

            return np.asarray(
                Image.fromarray(im).resize((tw, th), Image.BICUBIC), np.uint8
            )
        except ImportError:
            h, w = im.shape[:2]
            yi = (np.arange(th) * h // th).clip(0, h - 1)
            xi = (np.arange(tw) * w // tw).clip(0, w - 1)
            return im[yi][:, xi]

    def process(images):
        if len(images) != 1:
            raise ValueError("lfm2-vl serving: one image per request")
        im = images[0]
        oh, ow = im.shape[:2]
        scale = min(1.0, (max_patches * p * p / (oh * ow)) ** 0.5)
        gh = max(f, int(round(oh * scale / p / f)) * f)
        gw = max(f, int(round(ow * scale / p / f)) * f)
        while gh * gw > max_patches:
            gh, gw = max(f, gh - f), max(f, gw - f)
        arr = _resize(im, gh * p, gw * p).astype(np.float32) / 255.0
        arr = (arr - 0.5) / 0.5
        patches = (
            arr.reshape(gh, p, gw, p, 3)
            .transpose(0, 2, 1, 3, 4)
            .reshape(gh * gw, -1)
        )
        shapes[0] = (gh, gw)
        return ProcessedMedia(patches, [num_image_tokens(cfg, (gh, gw))])

    def prepare(prompt_ids, media):
        _, embeds, _ = prep(
            weights, cfg, prompt_ids, media.pixels, shapes[0],
            encoder_cache=cache, compute_dtype=dtype,
        )
        return {"prompt_embeds": embeds}

    return VlmAdapter("lfm2_vl", image_token, process, prepare)


def gemma3n_image_adapter(
    text_weights: dict, text_cfg, vision_weights: dict, embedder: dict,
    *, image_token_id: int, image_token: str = "<image_soft_token>",
    image_size: int = 768, block_def=None, out_res=(16, 16),
    encoder_cache: Optional[EncoderCache] = None, compute_dtype=None,
) -> VlmAdapter:
    """Gemma 3n image path: 768×768 (mean/std 0.5) → native MobileNetV5
    tower → vision multimodal embedder → soft rows substituted at the
    placeholder positions of the (pre-scaled) text embeds. Reference:
    `vision_models/gemma3n/{vision.rs,multimodal_embedding.rs,mod.rs:225}`."""
    import jax.numpy as jnp

    from ..vision.mobilenetv5 import embed_vision_soft, vision_tower_forward

    dtype = compute_dtype or jnp.float32
    cache = encoder_cache or EncoderCache()
    n_tok = out_res[0] * out_res[1]

    def process(images):
        px = np.stack([
            preprocess_image(im, size=image_size, mean=(0.5,) * 3,
                             std=(0.5,) * 3, resample="bilinear")
            for im in images
        ])  # [N, 3, H, W]
        return ProcessedMedia(np.transpose(px, (0, 2, 3, 1)), [n_tok] * len(images))

    def prepare(prompt_ids, media):
        def encode(px):
            feats = vision_tower_forward(
                vision_weights, jnp.asarray(px[None], dtype),
                block_def=block_def, out_res=out_res,
            )
            return embed_vision_soft(embedder, feats)[0]  # [n_tok, H_txt]

        soft = [
            cache.get_or_encode(px, encode, namespace="gemma3n-image")
            for px in media.pixels
        ]
        ids = np.asarray(prompt_ids)
        embeds = np.asarray(
            text_weights["embed"], np.float32
        )[np.where(ids < text_cfg.vocab_size, ids, 0)] * np.sqrt(
            text_cfg.hidden_size
        )
        embeds = jnp.asarray(embeds, dtype)
        img_pos = np.nonzero(ids == image_token_id)[0]
        if len(img_pos) != sum(media.counts):
            raise ValueError(
                f"{len(img_pos)} image placeholders vs "
                f"{sum(media.counts)} vision tokens"
            )
        off = 0
        for s, count in zip(soft, media.counts):
            pos = img_pos[off:off + count]
            embeds = embeds.at[pos].set(s.astype(dtype))
            off += count
        return {"prompt_embeds": embeds}

    return VlmAdapter("gemma3n", image_token, process, prepare)
