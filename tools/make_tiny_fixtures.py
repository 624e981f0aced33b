#!/usr/bin/env python
"""Regenerate the tiny HF test fixtures used by the demo/serving drive recipes.

/tmp is wiped between sessions; the verify recipes (serve.py, demo_llm.py,
demo_sd.py, VL serving) need small real checkpoints.  This tool rebuilds them
deterministically:

  python tools/make_tiny_fixtures.py            # both fixtures
  python tools/make_tiny_fixtures.py text       # /tmp/tiny_qwen2 only
  python tools/make_tiny_fixtures.py vl         # /tmp/tiny_qwen2vl only
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_tokenizer(path: str, extra_special: list[str]) -> None:
    """Train a tiny byte-level BPE and write HF tokenizer.json."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "a b c a b c a b c d e f g h i j k l m n o p",
        "hello world this is a tiny fixture for serving tests",
        "0 1 2 3 4 5 6 7 8 9 numbers and words mix here",
    ] * 8
    trainer = trainers.BpeTrainer(
        vocab_size=128 - len(extra_special) - 1,
        special_tokens=["<|endoftext|>"] + extra_special,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet()[:64],
    )
    tok.train_from_iterator(corpus, trainer)
    tok.save(os.path.join(path, "tokenizer.json"))


def make_text(path: str = "/tmp/tiny_qwen2") -> None:
    import torch
    import transformers

    os.makedirs(path, exist_ok=True)
    torch.manual_seed(0)
    cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=512,
        rope_theta=10000.0, tie_word_embeddings=False,
        bos_token_id=0, eos_token_id=0,
    )
    model = transformers.Qwen2ForCausalLM(cfg).eval()
    model.save_pretrained(path, safe_serialization=True)
    make_tokenizer(path, [])
    print(f"wrote {path}")


def make_vl(path: str = "/tmp/tiny_qwen2vl") -> None:
    import torch
    import transformers

    os.makedirs(path, exist_ok=True)
    torch.manual_seed(0)
    vis = dict(
        depth=2, embed_dim=32, hidden_size=32, num_heads=4, in_chans=3,
        patch_size=14, spatial_merge_size=2, temporal_patch_size=2, mlp_ratio=2,
    )
    cfg = transformers.Qwen2VLConfig(
        vocab_size=160, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=512,
        rope_theta=10000.0, tie_word_embeddings=False, vision_config=vis,
        rope_scaling={"type": "mrope", "mrope_section": [2, 1, 1]},
        image_token_id=151, vision_start_token_id=149, vision_end_token_id=150,
        bos_token_id=0, eos_token_id=0,
    )
    model = transformers.Qwen2VLForConditionalGeneration(cfg).eval()
    model.save_pretrained(path, safe_serialization=True)
    make_tokenizer(path, ["<|vision_start|>", "<|vision_end|>", "<|image_pad|>",
                          "<|video_pad|>"])
    print(f"wrote {path}")


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "both"
    if what in ("both", "text"):
        make_text()
    if what in ("both", "vl"):
        make_vl()
