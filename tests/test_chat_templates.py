"""Chat template rendering per family."""

from mllm_tpu.tokenizers.chat_templates import render

MSGS = [{"role": "system", "content": "Be brief."},
        {"role": "user", "content": "Hi"}]


def test_qwen_chatml():
    s = render("qwen2", MSGS)
    assert s == ("<|im_start|>system\nBe brief.<|im_end|>\n"
                 "<|im_start|>user\nHi<|im_end|>\n<|im_start|>assistant\n")
    # default system injected for plain strings
    s2 = render("qwen2", "Hi")
    assert s2.startswith("<|im_start|>system\nYou are a helpful assistant.")


def test_llama2():
    s = render("llama2", MSGS)
    assert s == "<s>[INST] <<SYS>>\nBe brief.\n<</SYS>>\n\nHi [/INST]"


def test_llama3():
    s = render("llama3", [{"role": "user", "content": "Hi"}])
    assert s == ("<|begin_of_text|><|start_header_id|>user<|end_header_id|>\n\n"
                 "Hi<|eot_id|><|start_header_id|>assistant<|end_header_id|>\n\n")


def test_gemma():
    s = render("gemma", [{"role": "user", "content": "Hi"},
                         {"role": "assistant", "content": "Hello"},
                         {"role": "user", "content": "Bye"}])
    assert s == ("<bos><start_of_turn>user\nHi<end_of_turn>\n"
                 "<start_of_turn>model\nHello<end_of_turn>\n"
                 "<start_of_turn>user\nBye<end_of_turn>\n<start_of_turn>model\n")


def test_mistral_phi3():
    assert render("mistral", [{"role": "user", "content": "Hi"}]) == "<s>[INST] Hi [/INST]"
    assert render("phi3", [{"role": "user", "content": "Hi"}]) == "<|user|>\nHi<|end|>\n<|assistant|>\n"


def test_unknown_family_falls_back_to_chatml():
    s = render("somethingelse", "Hi")
    assert "<|im_start|>user\nHi<|im_end|>" in s
