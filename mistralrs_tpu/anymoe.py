"""AnyMoE — build a mixture-of-experts from independently trained expert
MLPs at runtime, with a trainable gate (the analog of
`mistralrs-core/src/amoe/mod.rs:25-187`).

The gate is the only trainable component: `train_gate` runs next-token
cross-entropy over a small corpus, differentiating through the full forward
but updating only the router weights (optax adam)."""

from __future__ import annotations

from dataclasses import replace
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .models.config import ModelConfig
from .models.llama import KVCache, forward


def build_anymoe(
    cfg: ModelConfig,
    weights: dict,
    expert_mlps: Sequence[dict],
    num_experts_per_tok: int = 2,
    seed: int = 0,
) -> tuple[ModelConfig, dict]:
    """Replace the dense MLP with an expert bank.

    ``expert_mlps``: per-expert dicts of stacked [L, ...] gate/up/down
    weights (e.g. the base MLP plus fine-tuned variants)."""
    n_exp = len(expert_mlps)
    if n_exp < 2:
        raise ValueError("AnyMoE needs at least 2 experts")
    experts = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=1),  # leaves [L, E, ...]
        *[{k: e[k] for k in ("gate", "up", "down")} for e in expert_mlps],
    )
    rng = np.random.default_rng(seed)
    router = jnp.asarray(
        rng.standard_normal((cfg.num_layers, n_exp, cfg.hidden_size)) * 0.02,
        jnp.float32,
    )
    layers = dict(weights["layers"])
    for k in ("gate", "up", "down"):
        layers.pop(k, None)
    layers["experts"] = experts
    layers["router"] = router
    new_cfg = replace(
        cfg, num_experts=n_exp, num_experts_per_tok=num_experts_per_tok,
        norm_topk_prob=True,
    )
    return new_cfg, dict(weights, layers=layers)


def train_gate(
    cfg: ModelConfig,
    weights: dict,
    token_seqs: Sequence[Sequence[int]],
    *,
    lr: float = 1e-3,
    steps: int = 50,
    max_len: int = 64,
    seed: int = 0,
) -> tuple[dict, list[float]]:
    """Train ONLY the router on next-token prediction. Returns (weights,
    loss history)."""
    import optax

    from .generate import _freeze

    fcfg = _freeze(cfg)
    seqs = [list(s)[:max_len] for s in token_seqs if len(s) >= 2]
    t = max(len(s) for s in seqs)
    ids = np.zeros((len(seqs), t), np.int32)
    mask = np.zeros((len(seqs), t), np.float32)
    for i, s in enumerate(seqs):
        ids[i, : len(s)] = s
        mask[i, 1 : len(s)] = 1.0
    ids_j = jnp.asarray(ids)
    mask_j = jnp.asarray(mask)
    positions = jnp.broadcast_to(jnp.arange(t)[None], ids.shape).astype(jnp.int32)

    def loss_fn(router):
        w = dict(weights)
        w["layers"] = dict(weights["layers"], router=router)
        cache = KVCache.create(cfg, ids.shape[0], t, dtype=jnp.float32)
        logits, _ = forward(
            w, fcfg, ids_j, positions, cache,
            jnp.zeros((ids.shape[0],), jnp.int32),
            backend="xla", compute_dtype=jnp.float32,
        )
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        tgt = ids_j[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        m = mask_j[:, 1:]
        return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)

    router = weights["layers"]["router"]
    opt = optax.adam(lr)
    opt_state = opt.init(router)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    history = []
    for _ in range(steps):
        loss, g = grad_fn(router)
        updates, opt_state = opt.update(g, opt_state)
        router = optax.apply_updates(router, updates)
        history.append(float(loss))
    out = dict(weights)
    out["layers"] = dict(weights["layers"], router=router)
    return out, history
