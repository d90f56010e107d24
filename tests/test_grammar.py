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


def test_regex_constraint_unit():
    from mistralrs_tpu.grammar import RegexConstraint

    def fullmatch(pattern: str, text: str) -> bool:
        c = RegexConstraint(pattern)
        st = c.initial()
        for by in text.encode():
            st = c.advance(st, by)
            if st is None:
                return False
        return c.is_complete(st)

    import re
    cases = [
        (r"abc", ["abc", "ab", "abcd", ""]),
        (r"a*b+c?", ["b", "aaabbc", "ac", "abbbb", "c"]),
        (r"(ab|cd)+", ["ab", "abcd", "cdab", "a", "abc"]),
        (r"[a-c0-9]{2,4}", ["a1", "abc9", "a", "abcde", "z1"]),
        (r"\d+\.\d{2}", ["3.14", "42.00", "3.1", ".99", "12."]),
        (r"[^x]*x", ["aaax", "x", "axa"]),
        (r"yes|no|maybe", ["yes", "no", "maybe", "nope", ""]),
        (r"a{3}", ["aaa", "aa", "aaaa"]),
        (r"a{2,}", ["aa", "aaaaa", "a"]),
        (r"(?:ha)+!", ["ha!", "hahaha!", "h!", "!"]),
        (r"\w+@\w+\.(com|org)", ["a_1@b.com", "x@y.org", "x@y.net", "@y.com"]),
    ]
    for pattern, texts in cases:
        for t in texts:
            assert fullmatch(pattern, t) == bool(re.fullmatch(pattern, t)), (
                pattern, t,
            )


def test_regex_constraint_engine():
    eng = _engine()
    seq = eng.add_request(
        [5, 6, 7],
        SamplingParams(temperature=1.0, seed=3, max_tokens=16,
                       constraint="regex:[ab]{3}[0-9]"),
    )
    eng.run_to_completion()
    import re
    text = eng.tokenizer.decode(seq.generated_ids)
    assert re.fullmatch(r"[ab]{3}[0-9]", text), text


def test_dry_penalty_row_semantics():
    from mistralrs_tpu.engine.sampler import dry_penalty_row

    p = SamplingParams(dry_multiplier=1.0, dry_base=2.0, dry_allowed_length=2)
    # context: ... 7 8 9 | 7 8 9 → next token extending the repeat is the
    # token that followed the earlier occurrence of the suffix (9 → 7? no:
    # after earlier "9" came "7"); suffix 7 8 9 matched with len 3
    ctx = [1, 7, 8, 9, 5, 7, 8, 9]
    row = dry_penalty_row(ctx, p, 16)
    assert row is not None
    # earlier "9" at index 3 is followed by token 5; match length 3 ≥ 2 →
    # penalty multiplier * base^(3-2) = 2.0
    assert row[5] == -2.0
    # unrelated tokens unpenalized
    assert row[1] == 0.0 and row[9] == 0.0
    # below allowed_length → no row
    assert dry_penalty_row([1, 2, 3], p, 16) is None
    # breakers cut the match
    p2 = SamplingParams(dry_multiplier=1.0, dry_base=2.0, dry_allowed_length=3,
                        dry_sequence_breaker_ids=(8,))
    assert dry_penalty_row(ctx, p2, 16) is None


def test_dry_engine_reduces_repetition():
    eng = _engine()
    seq = eng.add_request(
        [5, 6, 7],
        SamplingParams(temperature=0.0, max_tokens=24,
                       dry_multiplier=4.0, dry_allowed_length=2),
    )
    eng.run_to_completion()
    toks = seq.generated_ids
    # greedy decoding with a random tiny model loops hard; DRY must prevent
    # any long exact n-gram repeat from dominating the tail
    tail = tuple(toks[-8:])
    assert len(toks) == 24
    joined = tuple(toks)
    # no 4-gram occurs 4+ times
    from collections import Counter
    grams = Counter(joined[i:i+4] for i in range(len(joined) - 3))
    assert max(grams.values()) < 4, grams.most_common(3)
