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


def test_unigram_spm_semantics():
    """SentencePiece-style unigram assembly from GGUF metadata: whitespace
    → ▁ with prepended ▁, highest-score segmentation, byte fallback for
    OOV, and exact decode round-trip (the llama.cpp 'llama' tokenizer
    semantics, hand-computed oracle)."""
    from mistralrs_tpu.tokenizer import from_gguf_metadata

    pieces = {
        "<unk>": 0.0, "<s>": 0.0, "</s>": 0.0,
        "▁hello": -1.0, "▁world": -1.0, "▁he": -5.0,
        "llo": -5.0, "▁": -10.0, "h": -12.0, "e": -12.0, "l": -12.0,
        "o": -12.0, "w": -12.0, "r": -12.0, "d": -12.0, "!": -11.0,
    }
    # byte-fallback entries <0x00>..<0xFF>
    tokens = list(pieces)
    scores = list(pieces.values())
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        scores.append(-20.0)
    token_types = [2, 3, 3] + [1] * (len(pieces) - 3) + [6] * 256  # 6=BYTE
    md = {
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.scores": scores,
        "tokenizer.ggml.token_type": token_types,
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
        "tokenizer.ggml.unknown_token_id": 0,
        "tokenizer.ggml.add_bos_token": True,
    }
    tw = from_gguf_metadata(md)
    idx = {t: i for i, t in enumerate(tokens)}

    ids = tw.encode("hello world")
    # best segmentation: ▁hello(-1) ▁world(-1); bos prepended
    assert ids == [1, idx["▁hello"], idx["▁world"]], ids
    assert tw.decode(ids) == "hello world"

    # byte fallback for OOV codepoint (é = 0xC3 0xA9) and round-trip
    ids2 = tw.encode("hello é!")
    assert idx["<0xC3>"] in ids2 and idx["<0xA9>"] in ids2
    assert tw.decode(ids2) == "hello é!"

    # segmentation picks the higher-score single piece over subpieces
    ids3 = tw.encode("hello")
    assert ids3 == [1, idx["▁hello"]]
