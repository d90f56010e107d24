"""Generic multimodal serving helpers — the analog of the reference's
encoder cache + `prepare_inputs` plumbing shared by every vision pipeline
(`mistralrs-core/src/paged_attention/encoder_cache.rs`,
`pipeline/inputs_processor.rs`).

Every VLM family serves through the engine the same way: encode media →
merge features into token embeddings at placeholder positions → submit
``(prompt_ids, prompt_embeds, extra_hash)`` via ``Engine.add_request``.
The ``extra_hash`` (media digest) is chained into KV block hashes so
prefix caching cannot collide across different images that share the
same placeholder token pattern.
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np


def media_hash(pixel_values) -> str:
    h = hashlib.blake2b(digest_size=16)
    items = (
        pixel_values
        if isinstance(pixel_values, (list, tuple))
        else [pixel_values]  # variable-size crops (pixtral) come as a list
    )
    for it in items:
        arr = np.ascontiguousarray(np.asarray(it, np.float32))
        h.update(np.asarray(arr.shape, np.int64).tobytes())
        h.update(arr.tobytes())
    return h.hexdigest()


class EncoderCache:
    """LRU cache of vision-encoder outputs keyed by media digest.

    Family-agnostic: the encode callable is supplied per lookup, so one
    cache instance can back every loaded VLM (keys are namespaced)."""

    def __init__(self, max_entries: int = 64):
        self._cache: OrderedDict = OrderedDict()
        self.max_entries = max_entries
        self.hits = 0
        self.misses = 0

    def get_or_encode(self, pixel_values, encode: Callable, namespace: str = ""):
        key = (namespace, media_hash(pixel_values))
        if key in self._cache:
            self.hits += 1
            self._cache.move_to_end(key)
            return self._cache[key]
        self.misses += 1
        feats = encode(pixel_values)
        self._cache[key] = feats
        while len(self._cache) > self.max_entries:
            self._cache.popitem(last=False)
        return feats


def merge_image_embeddings(
    text_embeds,  # [B, T, H]
    input_ids,  # [B, T]
    image_features,  # [N_img, np, H] (reading order)
    image_token_id: int,
):
    """Replace placeholder positions with image feature rows."""
    b, t, h = text_embeds.shape
    flat = image_features.reshape(-1, h).astype(text_embeds.dtype)
    mask = (input_ids == image_token_id).reshape(-1)
    idx = jnp.clip(jnp.cumsum(mask) - 1, 0, flat.shape[0] - 1)
    merged = jnp.where(
        mask[:, None], flat[idx], text_embeds.reshape(-1, h)
    )
    return merged.reshape(b, t, h)


def prepare_vlm_prompt(
    prompt_ids: list[int],
    pixel_values,
    *,
    embed_weights,  # text embedding table (QTensor or array)
    image_token_id: int,
    encode: Callable,  # pixel_values -> [N_img, np, H_text]
    encoder_cache: Optional[EncoderCache] = None,
    cache_namespace: str = "",
    embed_multiplier: Optional[float] = None,
    compute_dtype=jnp.bfloat16,
):
    """→ (prompt_ids, prompt_embeds [T, H], extra_hash) for Engine.add_request."""
    from .quant.linear import embedding_lookup

    ids = jnp.asarray([prompt_ids], jnp.int32)
    embeds = embedding_lookup(ids, embed_weights, dtype=compute_dtype)
    if embed_multiplier:
        embeds = embeds * jnp.asarray(embed_multiplier, embeds.dtype)
    extra: tuple = ()
    if pixel_values is not None:
        if encoder_cache is not None:
            feats = encoder_cache.get_or_encode(
                pixel_values, encode, namespace=cache_namespace
            )
        else:
            feats = encode(pixel_values)
        embeds = merge_image_embeddings(embeds, ids, feats, image_token_id)
        extra = (media_hash(pixel_values),)
    return prompt_ids, embeds[0], extra
