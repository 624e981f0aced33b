#!/usr/bin/env python
"""Checkpoint convertor: HF safetensors / torch .bin -> `.mllm` container.

Counterpart of /root/reference/tools/convertor/converter.py (same magic 20012
container; files written here load in the reference C++ engine and vice
versa), plus vocab export (magic 23333, vocab.py counterpart).

  python tools/convertor.py --input <hf_dir_or_file> --output model.mllm
  python tools/convertor.py --input <hf_dir> --output vocab.mllm --vocab
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def convert_weights(inp: str, out: str):
    from mllm_tpu.core.param_loader import MllmWriter, SafetensorsLoader
    from mllm_tpu.core.dtypes import DataType

    writer = MllmWriter(out)
    if inp.endswith(".bin") or inp.endswith(".pt"):
        import torch

        sd = torch.load(inp, map_location="cpu", weights_only=True)
        items = ((k, v.float().numpy()) for k, v in sd.items())
    else:
        loader = SafetensorsLoader(inp)
        items = ((name, loader.load(name, None, np.float32)) for name in loader)
    n = 0
    for name, arr in items:
        writer.add(name, np.ascontiguousarray(arr, np.float32), DataType.F32)
        n += 1
    writer.write()
    print(f"wrote {n} tensors -> {out}")


def convert_vocab(inp: str, out: str):
    from mllm_tpu.core.param_loader import write_vocab
    from mllm_tpu.tokenizers.hf_json import from_tokenizer_json

    tok = from_tokenizer_json(inp)
    scores = getattr(tok, "scores", None)
    write_vocab(out, tok.id_to_token, scores)
    print(f"wrote vocab ({len(tok.id_to_token)} tokens) -> {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--vocab", action="store_true", help="export vocab instead of weights")
    args = ap.parse_args()
    if args.vocab:
        convert_vocab(args.input, args.output)
    else:
        convert_weights(args.input, args.output)


if __name__ == "__main__":
    main()
