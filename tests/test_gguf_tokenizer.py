"""GGUF-metadata tokenizer reconstruction parity (analog of
`gguf_tokenizer.rs:498-560` round-trip tests, offline fixtures)."""

import numpy as np

from mistralrs_tpu.tokenizer import from_gguf_metadata


def _bpe_fixture():
    """Small byte-level BPE trained-by-hand: base alphabet + a few merges."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=300, special_tokens=["<s>", "</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(
        ["hello world", "hello there", "the quick brown fox", "world peace"] * 50,
        trainer,
    )
    return tok


def test_bpe_roundtrip_through_gguf_metadata():
    hf = _bpe_fixture()
    vocab = hf.get_vocab()
    tokens = [None] * len(vocab)
    for t, i in vocab.items():
        tokens[i] = t
    # extract merges from the serialized model
    import json

    model = json.loads(hf.to_str())["model"]
    merges = [
        m if isinstance(m, str) else " ".join(m) for m in model["merges"]
    ]
    md = {
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.merges": merges,
        "tokenizer.ggml.bos_token_id": vocab.get("<s>", 0),
        "tokenizer.ggml.eos_token_id": vocab.get("</s>", 1),
        "tokenizer.ggml.add_bos_token": False,
    }
    ours = from_gguf_metadata(md)
    for text in ["hello world", "the quick brown fox says hello", "unseen zebra!"]:
        ref_ids = hf.encode(text).ids
        got_ids = ours.encode(text, add_bos=False)
        assert got_ids == ref_ids, (text, got_ids, ref_ids)
        assert ours.decode(got_ids) == hf.decode(ref_ids)
