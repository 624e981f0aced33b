#!/usr/bin/env python
"""Offline quantizer: `.mllm` fp32 -> quantized `.mllm`.

Counterpart of /root/reference/tools/quantizer/ (main_quantize.cpp:32-50 flag
-> dtype map; QuantWriter per-tensor skip rules: norms/biases/embeddings stay
fp32).

  python tools/quantizer.py model.mllm model_q4_k.mllm Q4_K
Supported: Q4_0, Q8_0, Q2_0, Q4_K, Q6_K, Q2_K, Q3_K, Q8_K
(the reference's full writer set, main_quantize.cpp:36-46)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


SKIP_SUBSTRINGS = (
    "norm", "ln_", "layernorm", "bias", "rotary", "position", "pos_embed",
    "cls_token", "logit_scale", "embed_tokens", "token_embedding", "lm_head.bias",
)


def should_quantize(name: str, n_elems: int) -> bool:
    low = name.lower()
    if any(s in low for s in SKIP_SUBSTRINGS):
        return False
    return n_elems % 256 == 0 and n_elems >= 1 << 14


def main():
    from mllm_tpu.core import dtypes as dt
    from mllm_tpu.core.param_loader import MllmWriter, ParamLoader

    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("dtype", choices=["Q4_0", "Q8_0", "Q4_K", "Q6_K", "Q2_0",
                                      "Q2_K", "Q3_K", "Q8_K"])
    args = ap.parse_args()

    quant_fn = {
        "Q4_0": (dt.quant_q4_0, dt.DataType.Q4_0),
        "Q8_0": (dt.quant_q8_0, dt.DataType.Q8_0),
        "Q4_K": (dt.quant_q4_k, dt.DataType.Q4_K),
        "Q6_K": (dt.quant_q6_k, dt.DataType.Q6_K),
        "Q2_0": (dt.quant_q2_0, dt.DataType.Q2_0),
        "Q2_K": (dt.quant_q2_k, dt.DataType.Q2_K),
        "Q3_K": (dt.quant_q3_k, dt.DataType.Q3_K),
        "Q8_K": (dt.quant_q8_k, dt.DataType.Q8_K),
    }[args.dtype]

    src = ParamLoader(args.input)
    writer = MllmWriter(args.output)
    nq = nf = 0
    for name in src:
        e = src[name]
        if e.dtype != dt.DataType.F32:
            writer.add(name, bytes(src.raw(name)), e.dtype)
            nf += 1
            continue
        arr = src.raw(name).view(np.float32)
        if should_quantize(name, arr.size):
            writer.add(name, quant_fn[0](arr).tobytes(), quant_fn[1])
            nq += 1
        else:
            writer.add(name, bytes(src.raw(name)), dt.DataType.F32)
            nf += 1
    writer.write()
    print(f"quantized {nq} tensors to {args.dtype}, kept {nf} as-is -> {args.output}")


if __name__ == "__main__":
    main()
