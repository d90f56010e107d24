"""Dia text-to-speech model — the analog of the reference's speech stack
(`mistralrs-core/src/speech_models/dia/model.rs`: text encoder +
multi-channel audio decoder with cross-attention; `audio.rs`: channel delay
pattern).

Structure (verified against HF `DiaForConditionalGeneration`,
tests/test_dia.py):
- encoder: text tokens → bidirectional transformer (RoPE, attention scale
  1.0 — Dia does NOT scale by 1/sqrt(d))
- decoder: 9 audio-codebook channels embedded via one offset embedding and
  summed; causal GQA self-attention (RoPE) + cross-attention over encoder
  states + fused gate_up SwiGLU MLP; one shared ``logits_dense`` head
  produces all channels' logits
- generation uses the channel delay pattern: channel c's token for frame t
  is emitted at step t + delay[c] (helpers below)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_cos_sin, rope_frequencies


@dataclass(frozen=True)
class DiaConfig:
    # encoder
    enc_vocab: int
    enc_hidden: int
    enc_layers: int
    enc_heads: int
    enc_kv_heads: int
    enc_head_dim: int
    enc_ffn: int
    # decoder
    dec_vocab: int
    dec_hidden: int
    dec_layers: int
    dec_heads: int
    dec_kv_heads: int
    dec_head_dim: int
    dec_ffn: int
    num_channels: int
    cross_heads: int
    cross_kv_heads: int
    cross_head_dim: int
    delay_pattern: tuple[int, ...]
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    pad_token_id: int = 1025
    bos_token_id: int = 1026
    eos_token_id: int = 1024

    @classmethod
    def from_hf(cls, d: Mapping[str, Any]) -> "DiaConfig":
        e, dec = d["encoder_config"], d["decoder_config"]
        return cls(
            enc_vocab=e["vocab_size"], enc_hidden=e["hidden_size"],
            enc_layers=e["num_hidden_layers"], enc_heads=e["num_attention_heads"],
            enc_kv_heads=e.get("num_key_value_heads") or e["num_attention_heads"],
            enc_head_dim=e["head_dim"], enc_ffn=e["intermediate_size"],
            dec_vocab=dec["vocab_size"], dec_hidden=dec["hidden_size"],
            dec_layers=dec["num_hidden_layers"], dec_heads=dec["num_attention_heads"],
            dec_kv_heads=dec.get("num_key_value_heads") or dec["num_attention_heads"],
            dec_head_dim=dec["head_dim"], dec_ffn=dec["intermediate_size"],
            num_channels=dec["num_channels"],
            cross_heads=dec["cross_num_attention_heads"],
            cross_kv_heads=dec["cross_num_key_value_heads"],
            cross_head_dim=dec["cross_head_dim"],
            delay_pattern=tuple(d.get("delay_pattern", ())),
            norm_eps=e.get("norm_eps", 1e-5),
            rope_theta=e.get("rope_theta", 10000.0),
            pad_token_id=d.get("pad_token_id", 1025),
            bos_token_id=d.get("bos_token_id", 1026),
            eos_token_id=d.get("eos_token_id", 1024),
        )


def _mlp(lw, x):
    gu = x @ lw["gate_up"].T
    gate, up = jnp.split(gu, 2, axis=-1)
    return (up * jax.nn.silu(gate)) @ lw["down"].T


def _attn(x_q, x_kv, lw, n_heads, n_kv, hd, cos=None, sin=None, causal=False,
          kv_cache=None, kv_start=None):
    """Scale-1 attention. Returns (out, (k, v)) — k/v post-rope/full."""
    b, tq, _ = x_q.shape
    q = (x_q @ lw["q"].T).reshape(b, tq, n_heads, hd)
    k = (x_kv @ lw["k"].T).reshape(b, x_kv.shape[1], n_kv, hd)
    v = (x_kv @ lw["v"].T).reshape(b, x_kv.shape[1], n_kv, hd)
    if cos is not None:
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
    if kv_cache is not None:  # append into the running self-attn cache
        kc, vc = kv_cache

        def write(cache, new):
            def one(row, new_row, start):
                return jax.lax.dynamic_update_slice(row, new_row, (start, 0, 0))
            return jax.vmap(one)(cache, new, kv_start)

        k = write(kc, k)
        v = write(vc, v)
    group = n_heads // n_kv
    qf = q.reshape(b, tq, n_kv, group, hd).astype(jnp.float32)
    logits = jnp.einsum("btkgh,bskh->bkgts", qf, k.astype(jnp.float32))
    s = k.shape[1]
    if causal:
        q_pos = (kv_start[:, None] if kv_start is not None
                 else jnp.zeros((b, 1), jnp.int32)) + jnp.arange(tq)[None]
        mask = jnp.arange(s)[None, None, :] <= q_pos[:, :, None]
        if kv_start is not None:
            mask &= jnp.arange(s)[None, None, :] < (kv_start[:, None, None] + tq)
        logits = jnp.where(mask[:, None, None], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bkgts,bskh->btkgh", probs, v.astype(jnp.float32))
    out = out.reshape(b, tq, n_heads * hd).astype(x_q.dtype)
    return out @ lw["o"].T, (k, v)


def dia_encode(params: dict, cfg: DiaConfig, text_ids: jax.Array) -> jax.Array:
    """[B, S] → encoder states [B, S, enc_hidden]."""
    h = params["enc_embed"][text_ids]
    t = text_ids.shape[1]
    inv = rope_frequencies(cfg.enc_head_dim, cfg.rope_theta)
    pos = jnp.broadcast_to(jnp.arange(t)[None], text_ids.shape)
    cos, sin = rope_cos_sin(pos, inv)
    for lw in params["enc_layers"]:
        x = rms_norm(h, lw["pre_sa_norm"], cfg.norm_eps)
        attn, _ = _attn(x, x, lw["sa"], cfg.enc_heads, cfg.enc_kv_heads,
                        cfg.enc_head_dim, cos, sin, causal=False)
        h = h + attn
        x = rms_norm(h, lw["post_sa_norm"], cfg.norm_eps)
        h = h + _mlp(lw["mlp"], x)
    return rms_norm(h, params["enc_norm"], cfg.norm_eps)


def dia_cross_kv(params: dict, cfg: DiaConfig, enc_states: jax.Array):
    """Precompute per-layer cross-attention K/V from the encoder output."""
    b, s, _ = enc_states.shape
    out = []
    for lw in params["dec_layers"]:
        k = (enc_states @ lw["ca"]["k"].T).reshape(
            b, s, cfg.cross_kv_heads, cfg.cross_head_dim)
        v = (enc_states @ lw["ca"]["v"].T).reshape(
            b, s, cfg.cross_kv_heads, cfg.cross_head_dim)
        out.append((k, v))
    return out


def dia_decode(
    params: dict,
    cfg: DiaConfig,
    audio_codes: jax.Array,  # [B, T, C]
    cross_kv,  # from dia_cross_kv
    positions: jax.Array,  # [B, T]
    self_kv: Optional[list] = None,  # per-layer (k, v) caches [B, S, kv, hd]
    kv_start: Optional[jax.Array] = None,  # [B]
):
    """→ (audio logits [B, T, C, V], new self-attn caches)."""
    offsets = jnp.arange(cfg.num_channels) * cfg.dec_vocab
    h = params["dec_embed"][audio_codes + offsets[None, None]].sum(axis=2)
    inv = rope_frequencies(cfg.dec_head_dim, cfg.rope_theta)
    cos, sin = rope_cos_sin(positions, inv)
    new_kv = []
    for li, lw in enumerate(params["dec_layers"]):
        x = rms_norm(h, lw["pre_sa_norm"], cfg.norm_eps)
        attn, kv = _attn(
            x, x, lw["sa"], cfg.dec_heads, cfg.dec_kv_heads, cfg.dec_head_dim,
            cos, sin, causal=True,
            kv_cache=None if self_kv is None else self_kv[li],
            kv_start=kv_start,
        )
        new_kv.append(kv)
        h = h + attn
        x = rms_norm(h, lw["pre_ca_norm"], cfg.norm_eps)
        b, tq, _ = x.shape
        q = (x @ lw["ca"]["q"].T).reshape(b, tq, cfg.cross_heads, cfg.cross_head_dim)
        ck, cv = cross_kv[li]
        group = cfg.cross_heads // cfg.cross_kv_heads
        qf = q.reshape(b, tq, cfg.cross_kv_heads, group, cfg.cross_head_dim)
        logits = jnp.einsum("btkgh,bskh->bkgts", qf.astype(jnp.float32),
                            ck.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)
        cross = jnp.einsum("bkgts,bskh->btkgh", probs, cv.astype(jnp.float32))
        cross = cross.reshape(b, tq, cfg.cross_heads * cfg.cross_head_dim)
        h = h + cross.astype(h.dtype) @ lw["ca"]["o"].T
        x = rms_norm(h, lw["pre_mlp_norm"], cfg.norm_eps)
        h = h + _mlp(lw["mlp"], x)
    h = rms_norm(h, params["dec_norm"], cfg.norm_eps)
    logits = h @ params["logits_dense"].T  # [B, T, C*V]
    b, t, _ = logits.shape
    return logits.reshape(b, t, cfg.num_channels, cfg.dec_vocab), new_kv


# --------------------------------------------------------------------------
# channel delay pattern (`speech_models/dia/audio.rs`)
# --------------------------------------------------------------------------


def apply_delay_pattern(codes: np.ndarray, delays, pad: int) -> np.ndarray:
    """[T, C] frame-aligned codes → [T + max_delay, C] delayed layout where
    channel c's frame t sits at row t + delays[c] (pad elsewhere)."""
    t, c = codes.shape
    out = np.full((t + max(delays), c), pad, codes.dtype)
    for ch, d in enumerate(delays):
        out[d : d + t, ch] = codes[:, ch]
    return out


def revert_delay_pattern(delayed: np.ndarray, delays) -> np.ndarray:
    """Inverse of apply_delay_pattern."""
    total, c = delayed.shape
    t = total - max(delays)
    out = np.empty((t, c), delayed.dtype)
    for ch, d in enumerate(delays):
        out[:, ch] = delayed[d : d + t, ch]
    return out


def dia_weights_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: DiaConfig, dtype=jnp.float32
) -> dict:
    def g(n):
        return jnp.asarray(np.asarray(sd[n], np.float32), dtype)

    def attn_w(pre):
        return {"q": g(pre + "q_proj.weight"), "k": g(pre + "k_proj.weight"),
                "v": g(pre + "v_proj.weight"), "o": g(pre + "o_proj.weight")}

    enc_layers = []
    for i in range(cfg.enc_layers):
        p = f"model.encoder.layers.{i}."
        enc_layers.append({
            "pre_sa_norm": g(p + "pre_sa_norm.weight"),
            "post_sa_norm": g(p + "post_sa_norm.weight"),
            "sa": attn_w(p + "self_attention."),
            "mlp": {"gate_up": g(p + "mlp.gate_up_proj.weight"),
                    "down": g(p + "mlp.down_proj.weight")},
        })
    dec_layers = []
    for i in range(cfg.dec_layers):
        p = f"model.decoder.layers.{i}."
        dec_layers.append({
            "pre_sa_norm": g(p + "pre_sa_norm.weight"),
            "pre_ca_norm": g(p + "pre_ca_norm.weight"),
            "pre_mlp_norm": g(p + "pre_mlp_norm.weight"),
            "sa": attn_w(p + "self_attention."),
            "ca": attn_w(p + "cross_attention."),
            "mlp": {"gate_up": g(p + "mlp.gate_up_proj.weight"),
                    "down": g(p + "mlp.down_proj.weight")},
        })
    return {
        "enc_embed": g("model.encoder.embedding.weight"),
        "enc_layers": enc_layers,
        "enc_norm": g("model.encoder.norm.weight"),
        "dec_embed": g("model.decoder.embeddings.embed.weight"),
        "dec_layers": dec_layers,
        "dec_norm": g("model.decoder.norm.weight"),
        "logits_dense": g("logits_dense.weight"),
    }


# --------------------------------------------------------------------------
# end-to-end TTS driver (the analog of the reference's Dia generate loop,
# `mistralrs-core/src/speech_models/dia/mod.rs` generation)
# --------------------------------------------------------------------------


def dia_text_ids(cfg: DiaConfig, text: str, pad_to: int = 0) -> np.ndarray:
    """Dia's byte-level text encoding ([S1]/[S2] turn markers become the
    0x01/0x02 control bytes, reference speech_models/dia/setup)."""
    raw = text.replace("[S1]", "\x01").replace("[S2]", "\x02")
    ids = list(raw.encode("utf-8"))
    ids = [i % cfg.enc_vocab for i in ids]
    if pad_to > len(ids):
        ids = ids + [0] * (pad_to - len(ids))
    return np.asarray([ids], np.int32)


def dia_tts(
    params: dict,
    cfg: DiaConfig,
    text: str,
    *,
    max_tokens: int = 1024,
    temperature: float = 0.0,
    seed: int = 0,
) -> np.ndarray:
    """Text → DAC codebook codes [T, C] (delay pattern reverted, EOS/BOS
    rows stripped). Feed to `audio.dac.dac_decode_codes` for waveform."""
    import jax.random as jrandom

    delays = cfg.delay_pattern or tuple(range(cfg.num_channels))
    max_delay = max(delays)
    text_ids = dia_text_ids(cfg, text)
    enc = dia_encode(params, cfg, jnp.asarray(text_ids))
    ckv = dia_cross_kv(params, cfg, enc)

    cap = max_tokens + max_delay + 2
    caches = [
        (
            jnp.zeros((1, cap, cfg.dec_kv_heads, cfg.dec_head_dim), jnp.float32),
            jnp.zeros((1, cap, cfg.dec_kv_heads, cfg.dec_head_dim), jnp.float32),
        )
        for _ in range(cfg.dec_layers)
    ]
    frame = np.full((1, 1, cfg.num_channels), cfg.bos_token_id, np.int32)
    key = jrandom.PRNGKey(seed)
    out_frames: list[np.ndarray] = []
    eos_t: Optional[int] = None
    for t in range(cap - 1):
        logits, caches = dia_decode(
            params, cfg, jnp.asarray(frame), ckv,
            jnp.asarray([[t]], jnp.int32), self_kv=caches,
            kv_start=jnp.asarray([t], jnp.int32),
        )
        row = logits[0, 0]  # [C, V]
        if temperature > 0:
            key, sub = jrandom.split(key)
            toks = np.array(
                jrandom.categorical(sub, row / temperature, axis=-1)
            )
        else:
            toks = np.array(jnp.argmax(row, axis=-1))
        # delay gating: channel c only starts producing at step delays[c]
        for c, d in enumerate(delays):
            if t < d:
                toks[c] = cfg.bos_token_id
            elif eos_t is not None and t >= eos_t + d:
                toks[c] = cfg.pad_token_id
        if eos_t is None and toks[0] == cfg.eos_token_id:
            eos_t = t
        out_frames.append(toks.copy())
        frame = toks[None, None, :]
        if eos_t is not None and t >= eos_t + max_delay:
            break
        if eos_t is None and t + 1 >= max_tokens:
            eos_t = t + 1  # length cap: drain the delay tail
    delayed = np.stack(out_frames, axis=0)  # [T, C] delayed layout
    # frame-align: channel c's true frame t sits at delayed row t + d_c
    T = len(out_frames) - max_delay
    if T <= 0:
        return np.zeros((0, cfg.num_channels), np.int32)
    aligned = np.zeros((T, cfg.num_channels), np.int32)
    for c, d in enumerate(delays):
        aligned[:, c] = delayed[d : d + T, c]
    # strip EOS/PAD/BOS rows (any special token ends the usable stream)
    special = (aligned >= cfg.eos_token_id).any(axis=1)
    end = int(np.argmax(special)) if special.any() else T
    return aligned[:end]
