"""Lark-style CFG constraints: recognizer correctness on classic CFLs +
engine-level constrained generation (the llguidance-Lark analog)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mistralrs_tpu.cfg_grammar import CfgGrammar, LarkConstraint


def _accepts(c: LarkConstraint, text: str):
    st = c.initial()
    for by in text.encode():
        st = c.advance(st, by)
        if st is None:
            return None
    return c.is_complete(st)


def test_balanced_parens():
    c = LarkConstraint('start: "(" start ")" start |')
    for s, ok in [("", True), ("()", True), ("(())()", True), ("((()))", True),
                  ("(", False), ("())", None), (")(", None)]:
        got = _accepts(c, s)
        if ok is None:
            assert got is None, s  # dead mid-string
        else:
            assert got == ok, s


def test_arith_expressions():
    g = """
start: expr
expr: term (/[+-]/ term)*
term: factor (/[*\\/]/ factor)*
factor: NUMBER | "(" expr ")"
NUMBER: /[0-9]+/
"""
    c = LarkConstraint(g)
    for s in ("1", "12+3", "2*(3+4)-5", "((7))", "1+2*3/4-5"):
        assert _accepts(c, s) is True, s
    for s in ("", "+", "1+", "(1", "1**2"):
        assert _accepts(c, s) in (False, None), s


def test_json_subset_grammar():
    g = """
start: value
value: dict | list | STRING | NUMBER
dict: "{" "}" | "{" pair ("," pair)* "}"
pair: STRING ":" value
list: "[" "]" | "[" value ("," value)* "]"
STRING: /"[a-z]*"/
NUMBER: /-?[0-9]+/
"""
    c = LarkConstraint(g)
    import json

    for s in ('{}', '{"a":1}', '[1,2,3]', '{"k":[{"x":"y"},-2]}', '"abc"'):
        assert _accepts(c, s) is True, s
        json.loads(s)  # our accepted strings are real JSON
    for s in ('{', '{"a"}', '[1,]', '{"a":}'):
        assert _accepts(c, s) in (False, None), s


def test_quantifiers_and_groups():
    c = LarkConstraint('start: "a"+ ("b" | "c")? "d"*')
    for s, ok in [("a", True), ("aaab", True), ("acddd", True), ("aaa", True),
                  ("b", None), ("abc", None)]:
        got = _accepts(c, s)
        assert (got is True) if ok is True else (got in (False, None)), s


def test_engine_cfg_constrained_generation():
    from mistralrs_tpu.engine.engine import Engine
    from mistralrs_tpu.engine.sampler import SamplingParams
    from mistralrs_tpu.models import ModelConfig, init_random_weights
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers

    from mistralrs_tpu.tokenizer import TokenizerWrapper

    alphabet = pre_tokenizers.ByteLevel.alphabet()
    vocab = {ch: i for i, ch in enumerate(sorted(alphabet))}
    tok = Tokenizer(models.BPE(vocab, []))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()

    cfg = ModelConfig(
        arch="llama", vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        max_position_embeddings=256,
    )
    eng = Engine(
        cfg, init_random_weights(cfg, seed=77), num_blocks=64, block_size=16,
        max_batch=2, backend="xla", compute_dtype=jnp.float32,
        tokenizer=TokenizerWrapper(tok),
    )
    grammar = LarkConstraint(
        'start: "(" start ")" start | "x"'
    )
    seq = eng.add_request(
        [10, 20, 30],
        SamplingParams(temperature=1.0, seed=5, max_tokens=24,
                       constraint=grammar),
    )
    eng.run_to_completion()
    text = eng.tokenizer.decode(seq.generated_ids)
    # fully matched or truncated mid-derivation; any full output must parse
    probe = LarkConstraint('start: "(" start ")" start | "x"')
    st = probe.initial()
    for by in text.encode():
        st = probe.advance(st, by)
        assert st is not None, text
    if len(seq.generated_ids) < 24:
        assert probe.is_complete(st), text
