"""Token-for-token parity gate vs the reference C++ engine.

BASELINE.md's parity bar is "match the reference C++ CPU FP32 path"; SURVEY
§4's pattern is recorded golden fixtures (reference test/cpu/TestUtils.py
writes named tensors, test/TestLoader.hpp reads them back).  This tool is
the model-level version of that pattern:

1. `--gen DIR` writes a DETERMINISTIC random-weight checkpoint at the
   reference's QWen "0.5B" preset geometry (configuration_qwen.hpp:86-104 —
   hidden 1024, ffn 2816, 24 layers, 16 q / 16 kv heads, vocab 151936,
   rope theta 1e6, tied embeddings, qkv biases) as f32 safetensors with HF
   tensor names.  Seed fixed -> bit-identical weights on every machine.
2. The SAME safetensors file feeds BOTH engines:
   - reference: tools/convertor/converter.py -> .mllm -> a greedy-decode
     driver built against the unmodified reference model/tokenizer code
     (examples/parity_qwen.cpp pattern: QWenTokenizer + QWenForCausalLM +
     model.generate with do_sample=false), printing raw token ids;
   - this repo: `--run DIR` loads the checkpoint (f32, CPU), applies the
     same chat template, greedy-decodes the same number of tokens.
3. The reference run's ids are committed as tests/goldens/
   reference_qwen05b.json; tests/test_reference_parity.py re-runs step 2's
   local half and asserts ids match token-for-token.

Numerics note: both engines compute in f32 (XLA CPU vs the reference's
AVX2 kernels).  Argmax agreement over the full 151936-way softmax at every
step is therefore a REAL end-to-end equivalence statement about tokenizer,
weights layout, rope, attention, and lm-head math — a fp-rounding tie at
any step would diverge immediately and fail the gate.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# reference QWenConfig "0.5B" (configuration_qwen.hpp:86-104)
GEOM = dict(vocab_size=151936, hidden_size=1024, intermediate_size=2816,
            num_hidden_layers=24, num_attention_heads=16,
            num_key_value_heads=16, rope_theta=1000000.0,
            max_position_embeddings=32768, rms_norm_eps=1e-6,
            tie_word_embeddings=True)
SEED = 20012  # the .mllm magic number, for style points
PROMPT = "Give me a short introduction to large language model."
NEW_TOKENS = 32


def gen_checkpoint(path: str) -> None:
    """Deterministic random-weight Qwen2-0.5B-geometry checkpoint (f32
    safetensors, HF names).  ~1.9 GB."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    g = GEOM
    d, ff, L = g["hidden_size"], g["intermediate_size"], g["num_hidden_layers"]
    v = g["vocab_size"]
    rng = np.random.default_rng(SEED)

    def w(*shape, std=0.02):
        return (rng.standard_normal(shape, dtype=np.float32) * std)

    t = {"model.embed_tokens.weight": w(v, d),
         "model.norm.weight": np.ones(d, np.float32)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones(d, np.float32)
        t[p + "post_attention_layernorm.weight"] = np.ones(d, np.float32)
        for nm in ("q_proj", "k_proj", "v_proj"):
            t[p + f"self_attn.{nm}.weight"] = w(d, d)
            t[p + f"self_attn.{nm}.bias"] = w(d, std=0.01)
        t[p + "self_attn.o_proj.weight"] = w(d, d)
        t[p + "mlp.gate_proj.weight"] = w(ff, d)
        t[p + "mlp.up_proj.weight"] = w(ff, d)
        t[p + "mlp.down_proj.weight"] = w(d, ff)
    save_file(t, os.path.join(path, "model.safetensors"))

    cfg = dict(GEOM, model_type="qwen2", hidden_act="silu",
               bos_token_id=151643, eos_token_id=151645,
               attention_dropout=0.0, initializer_range=0.02,
               architectures=["Qwen2ForCausalLM"], torch_dtype="float32")
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)
    print(f"wrote {path}: {len(t)} tensors")


def chat_ids(vocab_mllm: str, merges_txt: str) -> list[int]:
    """Tokenize the prompt with the reference's own chat template
    (tokenization_qwen.hpp:71-72) through this repo's BPE."""
    from mllm_tpu.core.param_loader import load_merges, load_vocab
    from mllm_tpu.tokenizers.bpe import QWEN2_PATTERN, ByteLevelBPE

    t2i, i2t, _scores = load_vocab(vocab_mllm)
    merges = load_merges(merges_txt)
    tok = ByteLevelBPE(t2i, i2t, merges, pattern=QWEN2_PATTERN)
    # QWenTokenizer's specials (tokenization_qwen.hpp:365-369)
    tok.add_special_tokens(["<|endoftext|>", "<|im_start|>", "<|im_end|>"])
    text = ("<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
            "<|im_start|>user\n" + PROMPT + "<|im_end|>\n<|im_start|>assistant\n")
    return tok.encode(text)


def run_local(path: str, vocab_mllm: str, merges_txt: str,
              new_tokens: int = NEW_TOKENS) -> dict:
    """Greedy-decode with this framework on CPU in f32; returns ids."""
    import jax

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        import jax.numpy as jnp

        from mllm_tpu.models.registry import auto_model

        model, _, cfg = auto_model(path, dtype=jnp.float32, with_tokenizer=False)
        ids = chat_ids(vocab_mllm, merges_txt)
        cache = model.init_cache(1, len(ids) + new_tokens + 8, jnp.float32)
        x = jnp.asarray(np.asarray(ids, np.int32)[None])
        logits, cache = model(x, cache, last_only=True)
        out = []
        tok = jnp.argmax(logits[:, -1], axis=-1)
        for _ in range(new_tokens):
            out.append(int(tok[0]))
            logits, cache = model(tok[:, None].astype(jnp.int32), cache,
                                  last_only=True)
            tok = jnp.argmax(logits[:, -1], axis=-1)
        return {"input_ids": ids, "output_ids": out}


# ---------------------------------------------------------------------------
# Second family (round-4 verdict #6): TinyLlama — sentencepiece-score BPE
# with byte fallback (the reference's LLaMATokenizer / Bpe.cpp no-merges
# path) + GQA geometry.  Reference preset: configuration_tinyllama.hpp
# "1.1B" (hidden 2048, ffn 5632, 22 layers, 32 q / 4 kv heads, vocab
# 32000, rope theta 1e4, untied head); driver: the out-of-tree
# examples/parity_tinyllama.cpp (docs/ROUND5.md).
# ---------------------------------------------------------------------------

TINYLLAMA_GEOM = dict(vocab_size=32000, hidden_size=2048,
                      intermediate_size=5632, num_hidden_layers=22,
                      num_attention_heads=32, num_key_value_heads=4,
                      rope_theta=10000.0, max_position_embeddings=16384,
                      rms_norm_eps=1e-6, tie_word_embeddings=False)
# demo_tinyllama.cpp's chat template (set_chat_template args)
TINYLLAMA_SYS_START = (" You are a Q&A assistant. Your goal is to answer "
                       "questions as accurately as possible based on the "
                       "instructions and context provided.<|USER|>")
TINYLLAMA_SYS_END = "<|ASSISTANT|>"


def gen_checkpoint_tinyllama(path: str) -> None:
    """Deterministic random-weight TinyLlama-1.1B-geometry checkpoint."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    g = TINYLLAMA_GEOM
    d, ff, L, v = (g["hidden_size"], g["intermediate_size"],
                   g["num_hidden_layers"], g["vocab_size"])
    hd = d // g["num_attention_heads"]
    kvd = g["num_key_value_heads"] * hd
    rng = np.random.default_rng(SEED + 1)

    def w(*shape, std=0.02):
        return (rng.standard_normal(shape, dtype=np.float32) * std)

    t = {"model.embed_tokens.weight": w(v, d),
         "model.norm.weight": np.ones(d, np.float32),
         "lm_head.weight": w(v, d)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones(d, np.float32)
        t[p + "post_attention_layernorm.weight"] = np.ones(d, np.float32)
        t[p + "self_attn.q_proj.weight"] = w(d, d)
        t[p + "self_attn.k_proj.weight"] = w(kvd, d)
        t[p + "self_attn.v_proj.weight"] = w(kvd, d)
        t[p + "self_attn.o_proj.weight"] = w(d, d)
        t[p + "mlp.gate_proj.weight"] = w(ff, d)
        t[p + "mlp.up_proj.weight"] = w(ff, d)
        t[p + "mlp.down_proj.weight"] = w(d, ff)
    save_file(t, os.path.join(path, "model.safetensors"))
    cfg = dict(TINYLLAMA_GEOM, model_type="llama", hidden_act="silu",
               bos_token_id=1, eos_token_id=2, attention_bias=False,
               architectures=["LlamaForCausalLM"], torch_dtype="float32")
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)
    print(f"wrote {path}: {len(t)} tensors")


def tinyllama_chat_ids(vocab_mllm: str) -> list[int]:
    """Tokenize the prompt the way parity_tinyllama.cpp does: bos + the
    sentencepiece-score BPE with byte fallback over the chat-templated
    text (LLaMATokenizer path, Bpe.cpp:280-282 -> byte_fallback=true)."""
    from mllm_tpu.core.param_loader import load_vocab
    from mllm_tpu.tokenizers.bpe import SentencePieceBPE

    t2i, i2t, scores = load_vocab(vocab_mllm)
    tok = SentencePieceBPE(t2i, i2t, scores, add_bos=True,
                           add_prefix_space=False)
    tok.bos_token_id = 1  # BPETokenizer::TokenBos
    text = TINYLLAMA_SYS_START + PROMPT + TINYLLAMA_SYS_END
    return tok.encode(text, bos=True)


def run_local_tinyllama(path: str, vocab_mllm: str,
                        new_tokens: int = NEW_TOKENS) -> dict:
    import jax

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        import jax.numpy as jnp

        from mllm_tpu.models.registry import auto_model

        model, _, cfg = auto_model(path, dtype=jnp.float32, with_tokenizer=False)
        ids = tinyllama_chat_ids(vocab_mllm)
        cache = model.init_cache(1, len(ids) + new_tokens + 8, jnp.float32)
        x = jnp.asarray(np.asarray(ids, np.int32)[None])
        logits, cache = model(x, cache, last_only=True)
        out = []
        tok = jnp.argmax(logits[:, -1], axis=-1)
        for _ in range(new_tokens):
            out.append(int(tok[0]))
            logits, cache = model(tok[:, None].astype(jnp.int32), cache,
                                  last_only=True)
            tok = jnp.argmax(logits[:, -1], axis=-1)
        return {"input_ids": ids, "output_ids": out}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", metavar="DIR", help="write the fixture checkpoint")
    ap.add_argument("--run", metavar="DIR", help="greedy-decode locally, print ids")
    ap.add_argument("--family", default="qwen05b",
                    choices=["qwen05b", "tinyllama"])
    ap.add_argument("--vocab", default=None)
    ap.add_argument("--merges", default=os.environ.get(
        "MLLM_REF_MERGES", "/root/reference/vocab/qwen2.5_merges.txt"))
    ap.add_argument("--new-tokens", type=int, default=NEW_TOKENS)
    args = ap.parse_args()
    if args.vocab is None:
        args.vocab = os.environ.get(
            "MLLM_REF_VOCAB",
            "/root/reference/vocab/tinyllama_vocab.mllm"
            if args.family == "tinyllama"
            else "/root/reference/vocab/qwen2.5_vocab.mllm")
    if args.family == "tinyllama":
        if args.gen:
            gen_checkpoint_tinyllama(args.gen)
        if args.run:
            print(json.dumps(run_local_tinyllama(args.run, args.vocab,
                                                 args.new_tokens)))
        return
    if args.gen:
        gen_checkpoint(args.gen)
    if args.run:
        print(json.dumps(run_local(args.run, args.vocab, args.merges,
                                   args.new_tokens)))


if __name__ == "__main__":
    main()
