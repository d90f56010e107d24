"""Grammar-constrained generation: JSON mode + choice constraints through
the full engine (analog of the reference's llguidance-driven sampling)."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from mistralrs_tpu.engine.engine import Engine
from mistralrs_tpu.engine.sampler import SamplingParams
from mistralrs_tpu.grammar import ChoiceConstraint, JsonConstraint
from mistralrs_tpu.models import ModelConfig, init_random_weights


def _byte_tokenizer():
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers

    from mistralrs_tpu.tokenizer import TokenizerWrapper

    alphabet = pre_tokenizers.ByteLevel.alphabet()
    vocab = {ch: i for i, ch in enumerate(sorted(alphabet))}
    tok = Tokenizer(models.BPE(vocab, []))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    return TokenizerWrapper(tok)


CFG = ModelConfig(
    arch="llama", vocab_size=256, hidden_size=64, intermediate_size=128,
    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
    max_position_embeddings=512,
)
WEIGHTS = init_random_weights(CFG, seed=21)


def _engine():
    return Engine(
        CFG, WEIGHTS, num_blocks=64, block_size=16, max_batch=2,
        backend="xla", compute_dtype=jnp.float32, tokenizer=_byte_tokenizer(),
    )


def test_json_mode_produces_valid_json():
    eng = _engine()
    seq = eng.add_request(
        [10, 20, 30],
        SamplingParams(temperature=0.9, seed=1, max_tokens=60,
                       constraint="json_object"),
    )
    eng.run_to_completion()
    text = eng.tokenizer.decode(seq.generated_ids)
    # either completed (valid JSON) or hit max_tokens mid-object; in the
    # completed case it must parse
    if len(seq.generated_ids) < 60:
        obj = json.loads(text)
        assert isinstance(obj, dict)
    else:
        assert text.lstrip().startswith("{")


def test_choice_constraint_forces_output():
    eng = _engine()
    seq = eng.add_request(
        [5, 6, 7],
        SamplingParams(temperature=1.0, seed=0, max_tokens=10,
                       constraint=ChoiceConstraint(["yes", "no"])),
    )
    eng.run_to_completion()
    text = eng.tokenizer.decode(seq.generated_ids)
    assert text in ("yes", "no"), text
