"""Token-for-token parity against the reference's REAL vocab assets.

/root/reference/vocab ships the actual `.mllm` vocab containers (magic 23333,
written by tools/convertor/vocab.py) and merges.txt files used by the C++
demos.  These tests load them through our loader and golden-compare encode /
decode against transformers' slow tokenizers reconstructed from the same
data — i.e. exact-id parity on real assets, not toy vocabs.

Reference surface: /root/reference/mllm/tokenizers/Tokenizer.hpp:34-190,
BPE/Bpe.cpp; vocab container format Tokenizer.cpp:7-18.
"""

import json
import os

import pytest

VOCAB_DIR = "/root/reference/vocab"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(VOCAB_DIR), reason="reference vocab assets not present"
)

# mixed corpus: ASCII, contractions, CJK, emoji, code, whitespace shapes
CORPUS = [
    "Hello, world!",
    "The quick brown fox jumps over the lazy dog.",
    "I'm can't won't it's we've they'll he'd",
    "你好，世界！这是一个测试。",
    "日本語のテキストもある。한국어 텍스트도 있다.",
    "emoji: 🙂🚀🔥 and flags 🇺🇸🇯🇵",
    "def main():\n    print('hi')\n    return 0\n",
    "x = [1, 2, 3]; y = {'a': 1e-5, 'b': 0xFF}",
    "  leading and   internal    spaces\tand\ttabs",
    "line one\nline two\r\nline three\n\n",
    "MixedCASE WordsWith123Numbers and_under_scores",
    "https://example.com/path?q=1&r=2#frag",
    "１２３４５ full-width digits, ℕ∀∂∈ℝ math",
]


def _load(name):
    from mllm_tpu.core.param_loader import load_merges, load_vocab

    t2i, i2t, scores = load_vocab(os.path.join(VOCAB_DIR, name + "_vocab.mllm"))
    merges = None
    mp = os.path.join(VOCAB_DIR, name + "_merges.txt")
    if os.path.exists(mp):
        merges = load_merges(mp)
    return t2i, i2t, scores, merges


def _hf_files(tmp_path, name, t2i):
    """Reconstruct vocab.json + merges.txt for the HF slow tokenizer.

    HF's GPT2/CLIP tokenizers drop the FIRST merges line unconditionally
    (assuming a '#version' header); some reference files (dclm, phonelm,
    qwen2vl) start with a real merge instead — normalize by prepending the
    header so the oracle sees every merge, like our loader (and the
    reference's C++ BPE) does."""
    d = tmp_path / name
    d.mkdir(exist_ok=True)
    vj = d / "vocab.json"
    with open(vj, "w", encoding="utf-8") as f:
        json.dump(t2i, f, ensure_ascii=False)
    src = os.path.join(VOCAB_DIR, name + "_merges.txt")
    with open(src, encoding="utf-8") as f:
        content = f.read()
    if not content.startswith("#version"):
        content = "#version: 0.2\n" + content
    mp = d / "merges.txt"
    with open(mp, "w", encoding="utf-8") as f:
        f.write(content)
    return str(vj), str(mp)


def _compare(ours, hf, corpus=CORPUS, decode=True):
    for text in corpus:
        ref = hf(text, add_special_tokens=False)["input_ids"]
        got = ours.encode(text)
        assert got == ref, f"encode mismatch on {text!r}:\n ours={got}\n   hf={ref}"
        if decode:
            assert ours.decode(ref) == hf.decode(ref)


@pytest.mark.parametrize("name", ["qwen2vl", "qwen2.5", "ds_qwen2"])
def test_qwen_family_real_vocab(tmp_path, name):
    from transformers import Qwen2Tokenizer

    from mllm_tpu.tokenizers.bpe import QWEN2_PATTERN, ByteLevelBPE

    t2i, i2t, scores, merges = _load(name)
    ours = ByteLevelBPE(t2i, i2t, merges, pattern=QWEN2_PATTERN)
    vj, mp = _hf_files(tmp_path, name, t2i)
    hf = Qwen2Tokenizer(vj, mp)
    _compare(ours, hf)


@pytest.mark.parametrize("name", ["smollm", "opt", "dclm", "phonelm"])
def test_gpt2_family_real_vocab(tmp_path, name):
    from transformers import GPT2Tokenizer

    from mllm_tpu.tokenizers.bpe import GPT2_PATTERN, ByteLevelBPE

    t2i, i2t, scores, merges = _load(name)
    ours = ByteLevelBPE(t2i, i2t, merges, pattern=GPT2_PATTERN)
    vj, mp = _hf_files(tmp_path, name, t2i)
    hf = GPT2Tokenizer(vj, mp)
    _compare(ours, hf)


def test_clip_real_vocab(tmp_path):
    from transformers import CLIPTokenizer

    from mllm_tpu.tokenizers.bpe import ClipBPE

    t2i, i2t, scores, merges = _load("clip")
    ours = ClipBPE(t2i, i2t, merges)
    vj, mp = _hf_files(tmp_path, "clip", t2i)
    hf = CLIPTokenizer(vj, mp)
    for text in CORPUS:
        ref = hf(text, add_special_tokens=False)["input_ids"]
        got = ours.encode(text)
        assert got == ref, f"clip encode mismatch on {text!r}:\n ours={got}\n   hf={ref}"


def test_qwen2vl_chat_template_round_trip(tmp_path):
    """Chat-templated text (with <|im_start|>/vision specials) encodes to the
    same ids as the HF tokenizer with the same added specials."""
    from transformers import Qwen2Tokenizer

    from mllm_tpu.tokenizers.bpe import QWEN2_PATTERN, ByteLevelBPE

    specials = ["<|im_start|>", "<|im_end|>", "<|endoftext|>",
                "<|vision_start|>", "<|vision_end|>"]
    t2i, i2t, scores, merges = _load("qwen2vl")
    for s in specials:
        assert s in t2i, f"{s} missing from real vocab"
    ours = ByteLevelBPE(t2i, i2t, merges, pattern=QWEN2_PATTERN)
    ours.add_special_tokens(specials)
    # <|image_pad|> is an EXTENDED special beyond the vocab file — registered
    # with its hardcoded id, like the reference (tokenization_qwen2_vl.hpp)
    ours.add_special_tokens({"<|image_pad|>": 151655})

    vj, mp = _hf_files(tmp_path, "qwen2vl", t2i)
    hf = Qwen2Tokenizer(vj, mp)
    hf.add_tokens(specials, special_tokens=True)
    hf.add_tokens(["<|image_pad|>"], special_tokens=True)
    assert hf.convert_tokens_to_ids("<|image_pad|>") == 151655

    text = ("<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
            "<|im_start|>user\n<|vision_start|><|image_pad|><|vision_end|>"
            "What is in this image? 这是什么？<|im_end|>\n<|im_start|>assistant\n")
    ref = hf(text, add_special_tokens=False)["input_ids"]
    got = ours.encode(text)
    assert got == ref
    assert ours.decode(got) == text


def test_llama2_real_vocab_round_trip():
    """SentencePiece-family vocab: the reference's vocab writer stores the
    '▁' marker as a literal space (the C++ BPE works on raw spaces) —
    auto-detected; byte-fallback intact; known-token goldens + round trip.
    (No HF oracle without the .model file — the reference's own demos use
    this same .mllm.)"""
    from mllm_tpu.tokenizers.bpe import SentencePieceBPE

    t2i, i2t, scores, merges = _load("llama2")
    # byte-fallback alphabet: raw bytes at a contiguous id block (3..258)
    assert t2i["\x00"] == 3 and t2i["\x7f"] == 130 and i2t[258] == "\xff"
    ours = SentencePieceBPE(t2i, i2t, scores, add_bos=False)
    assert ours.SPACE == " "  # reference .mllm convention
    assert ours._byte_id0 == 3

    # whole-word pieces win over sub-pieces (llama2's actual ids)
    assert ours.encode("Hello, world!") == [
        t2i[" Hello"], t2i[","], t2i[" world"], t2i["!"]
    ]
    for text in ["Hello, world!", "The quick brown fox.", "emoji 🙂 test",
                 "你好 world"]:
        ids = ours.encode(text)
        assert ids, text
        # sentencepiece decode drops the leading prefix space
        assert ours.decode(ids).lstrip(" ") == text


def test_gte_wordpiece_real_vocab(tmp_path):
    """gte_vocab.mllm is a BERT-family WordPiece vocab."""
    from transformers import BertTokenizer

    from mllm_tpu.tokenizers.wordpiece import WordPieceTokenizer

    t2i, i2t, scores, _ = _load("gte")
    assert "[CLS]" in t2i and "[SEP]" in t2i and "##s" in t2i
    d = tmp_path / "gte"
    d.mkdir()
    with open(d / "vocab.txt", "w", encoding="utf-8") as f:
        f.write("\n".join(i2t) + "\n")
    lowercase = "Hello" not in t2i  # uncased vocab?
    hf = BertTokenizer(str(d / "vocab.txt"), do_lower_case=lowercase)
    ours = WordPieceTokenizer(t2i, i2t, lowercase=lowercase)
    for text in ["Hello, world!", "the quick brown fox", "unbelievable tokenization",
                 "你好 world 123"]:
        ref = hf(text, add_special_tokens=False)["input_ids"]
        got = ours.encode(text)
        assert got == ref, f"gte mismatch on {text!r}: ours={got} hf={ref}"
