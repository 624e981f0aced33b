"""Tokenizer parity vs the HuggingFace `tokenizers` library (oracle), mirroring
the reference's tokenizer golden tests (/root/reference/test/processor/)."""

import json

import pytest
from tokenizers import Tokenizer as HFTokenizer
from tokenizers import models, pre_tokenizers, trainers, decoders

from mllm_tpu.tokenizers.base import bytes_to_unicode, text_to_byte_units, byte_units_to_text
from mllm_tpu.tokenizers.hf_json import from_tokenizer_json
from mllm_tpu.tokenizers.tiktoken import byte_pair_encode
from mllm_tpu.tokenizers.wordpiece import WordPieceTokenizer

CORPUS = [
    "Hello world! This is a test of the tokenizer.",
    "The quick brown fox jumps over the lazy dog. 1234 42",
    "def main():\n    print('hi')\n",
    "Curiosity killed the cat, but satisfaction brought it back.",
    "JAX + TPU = fast inference.  Email: a@b.co",
    "多语言 support with 中文 and emoji 🙂 too",
]

SAMPLES = [
    "Hello world!",
    "  leading spaces and\ttabs\nnewlines",
    "numbers 123456789 and punct!!! ...",
    "unicode: 你好世界 🙂 café naïve",
    "code: x = f(y) * 2 ** 8  # comment",
    "",
]


@pytest.fixture(scope="module")
def hf_bpe(tmp_path_factory):
    """Train a small byte-level BPE with the HF library; save tokenizer.json."""
    tok = HFTokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(vocab_size=400, special_tokens=["<|endoftext|>"],
                                  show_progress=False)
    tok.train_from_iterator(CORPUS * 10, trainer)
    path = tmp_path_factory.mktemp("tok") / "tokenizer.json"
    tok.save(str(path))
    return tok, str(path)


def test_byte_unicode_roundtrip():
    table = bytes_to_unicode()
    assert len(table) == 256
    assert len(set(table.values())) == 256
    for s in SAMPLES:
        assert byte_units_to_text(text_to_byte_units(s)) == s


def test_bytelevel_bpe_matches_hf(hf_bpe):
    hf, path = hf_bpe
    ours = from_tokenizer_json(path)
    for s in SAMPLES:
        expected = hf.encode(s).ids
        got = ours.encode(s)
        assert got == expected, f"{s!r}: {got} != {expected}"
        if s:
            assert ours.decode(got) == hf.decode(expected)


def test_special_token_split(hf_bpe):
    hf, path = hf_bpe
    ours = from_tokenizer_json(path)
    sid = ours.token_to_id["<|endoftext|>"]
    ids = ours.encode("Hello<|endoftext|>world")
    assert sid in ids
    # text around the special token tokenizes as if split there
    left = ours.encode("Hello")
    right = ours.encode("world")
    assert ids == left + [sid] + right


def test_wordpiece_matches_hf():
    vocab = {}
    for i, t in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "quick", "brown", "fox", "jump",
         "##s", "##ed", "over", "lazy", "dog", "hello", "world", "!", ",", "un",
         "##known", "##word", "123", "##45"]
    ):
        vocab[t] = i
    hf = HFTokenizer(models.WordPiece(vocab, unk_token="[UNK]", max_input_chars_per_word=100))
    from tokenizers import normalizers
    hf.normalizer = normalizers.Sequence([normalizers.Lowercase(), normalizers.NFD(), normalizers.StripAccents()])
    hf.pre_tokenizer = pre_tokenizers.Sequence([pre_tokenizers.Whitespace()])
    id_to_token = [""] * len(vocab)
    for t, i in vocab.items():
        id_to_token[i] = t
    ours = WordPieceTokenizer(vocab, id_to_token, unk_token="[UNK]", lowercase=True)
    for s in ["the quick brown fox jumps over the lazy dog!",
              "Hello World, unknownword 12345", "THE QUICK fox"]:
        assert ours.encode(s) == hf.encode(s).ids, s


def test_tiktoken_byte_pair_encode():
    # ranks: all single bytes + a few merges
    ranks = {bytes([i]): i for i in range(256)}
    ranks[b"he"] = 256
    ranks[b"ll"] = 257
    ranks[b"hell"] = 258
    ranks[b"hello"] = 259
    assert byte_pair_encode(b"hello", ranks) == [259]
    assert byte_pair_encode(b"hellx", ranks) == [258, ord("x")]
    assert byte_pair_encode(b"abc", ranks) == [97, 98, 99]


def test_sentencepiece_bpe_basics():
    from mllm_tpu.tokenizers.bpe import SentencePieceBPE

    toks = ["<unk>", "<s>", "</s>", "▁", "▁the", "▁cat", "c", "a", "t", "▁ca",
            "▁c", "he", "▁t", "▁th", "e", "h", "t"] + [f"<0x{i:02X}>" for i in range(256)]
    t2i = {t: i for i, t in enumerate(toks)}
    scores = [0.0] * len(toks)
    # higher score = preferred merge
    for tok, s in [("▁the", -1.0), ("▁cat", -1.5), ("▁ca", -3.0), ("▁th", -2.5), ("he", -2.0)]:
        scores[t2i[tok]] = s
    tk = SentencePieceBPE(t2i, toks, scores)
    ids = tk.encode("the cat")
    assert ids == [t2i["▁the"], t2i["▁cat"]]
    assert tk.decode(ids) == " the cat"
    # byte fallback for unknown char
    ids2 = tk.encode("Ω")
    text2 = tk.decode(ids2)
    assert "Ω" in text2
