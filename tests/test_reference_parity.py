"""Token-for-token parity vs the reference C++ engine (round-3 verdict #4).

The golden fixture tests/goldens/reference_qwen05b.json records the
UNMODIFIED reference engine's greedy output (QWenForCausalLM, CPU f32,
do_sample=false) on a deterministic random-weight checkpoint at the QWen
"0.5B" preset geometry (reference configuration_qwen.hpp:86-104), converted
through the reference's own tools/convertor/converter.py.  Provenance and
the exact recipe live in the fixture + tools/reference_parity.py.

Two gates:
- tokenizer: this repo's BPE over the reference vocab assets must produce
  the recorded input ids (runs whenever /root/reference/vocab is present);
- model: greedy decode of the same checkpoint must reproduce every one of
  the 32 recorded output ids.  Regenerating the 1.9 GB checkpoint and
  running 24 f32 layers x 32 steps takes minutes on a 1-core host, so this
  half is opt-in: MLLM_RUN_PARITY=1 (checkpoint cached at
  $MLLM_PARITY_CKPT or /root/parity_ckpt).

Both engines compute in f32; argmax agreement at every step over the
151936-way vocab is an end-to-end statement about tokenizer, weight
loading, rope, attention, and lm-head math.
"""

import json
import os

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "reference_qwen05b.json")
VOCAB = "/root/reference/vocab/qwen2.5_vocab.mllm"
MERGES = "/root/reference/vocab/qwen2.5_merges.txt"


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.mark.skipif(not os.path.exists(VOCAB), reason="reference vocab assets absent")
def test_tokenizer_matches_reference(golden):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from reference_parity import chat_ids

    assert chat_ids(VOCAB, MERGES) == golden["input_ids"]


@pytest.mark.skipif(os.environ.get("MLLM_RUN_PARITY") != "1",
                    reason="set MLLM_RUN_PARITY=1 (needs the 1.9 GB fixture "
                           "checkpoint + minutes of 1-core f32 decode)")
def test_reference_parity(golden):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from reference_parity import gen_checkpoint, run_local

    ckpt = os.environ.get("MLLM_PARITY_CKPT", "/root/parity_ckpt")
    if not os.path.exists(os.path.join(ckpt, "model.safetensors")):
        gen_checkpoint(ckpt)
    res = run_local(ckpt, VOCAB, MERGES, new_tokens=len(golden["output_ids"]))
    assert res["input_ids"] == golden["input_ids"]
    assert res["output_ids"] == golden["output_ids"], (
        f"diverged at step "
        f"{next(i for i, (a, b) in enumerate(zip(res['output_ids'], golden['output_ids'])) if a != b)}"
    )


# ---------------------------------------------------------------------------
# Second family (round-4 verdict #6): TinyLlama — sentencepiece-score BPE
# (byte fallback, no merges) + GQA geometry + untied head, vs the
# out-of-tree parity_tinyllama.cpp reference build.  Recorded ids in
# tests/goldens/reference_tinyllama.json (49 input + 32 output).
# ---------------------------------------------------------------------------

GOLDEN_TL = os.path.join(os.path.dirname(__file__), "goldens",
                         "reference_tinyllama.json")
VOCAB_TL = "/root/reference/vocab/tinyllama_vocab.mllm"


@pytest.fixture(scope="module")
def golden_tl():
    with open(GOLDEN_TL) as f:
        return json.load(f)


@pytest.mark.skipif(not os.path.exists(VOCAB_TL),
                    reason="reference vocab assets absent")
def test_tinyllama_tokenizer_matches_reference(golden_tl):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from reference_parity import tinyllama_chat_ids

    assert tinyllama_chat_ids(VOCAB_TL) == golden_tl["input_ids"]


@pytest.mark.skipif(os.environ.get("MLLM_RUN_PARITY") != "1",
                    reason="set MLLM_RUN_PARITY=1 (needs the 4.4 GB fixture "
                           "checkpoint + minutes of 1-core f32 decode)")
def test_tinyllama_reference_parity(golden_tl):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from reference_parity import gen_checkpoint_tinyllama, run_local_tinyllama

    ckpt = os.environ.get("MLLM_PARITY_CKPT_TL", "/root/parity_ckpt_tl")
    if not os.path.exists(os.path.join(ckpt, "model.safetensors")):
        gen_checkpoint_tinyllama(ckpt)
    got = run_local_tinyllama(ckpt, VOCAB_TL)
    assert got["input_ids"] == golden_tl["input_ids"]
    assert got["output_ids"] == golden_tl["output_ids"]
