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


def quantize_q4_0_4x4_file(inp: str, outp: str) -> None:
    """GemmPack row-interleaved Q4_0 writer (reference: QuantWriter.cpp:217-297).

    The flat container stores no shapes, so the row width is recovered the
    way the reference does: pre-scan for a `model*norm` f32 tensor -> hidden
    dim H; n_per_row = H except down-proj-family names (K = n_elems / H).
    Tensors whose row count isn't a multiple of 4 stay f32.
    """
    from mllm_tpu.core import dtypes as dt
    from mllm_tpu.core.param_loader import MllmWriter, ParamLoader

    src = ParamLoader(inp)
    hidden = None
    for name in src:  # QuantWriter.cpp:176-179 hidden-dim pre-scan
        if ("model" in name and "norm" in name and "k" not in name
                and "q" not in name and src[name].dtype == dt.DataType.F32):
            hidden = src[name].size // 4
            break
    if hidden is None:
        raise SystemExit("Q4_0_4_4: no `model*norm` tensor to infer hidden dim from")
    down_names = ("w2", "down_proj", "down")  # q23_to_q4_0_4x4_layers analogue
    writer = MllmWriter(outp)
    nq = nf = 0
    for name in src:
        e = src[name]
        arr = src.raw(name).view(np.float32) if e.dtype == dt.DataType.F32 else None
        if arr is None or not should_quantize(name, arr.size):
            writer.add(name, bytes(src.raw(name)), e.dtype)
            nf += 1
            continue
        k = arr.size // hidden if any(s in name for s in down_names) else hidden
        if k % 32 or arr.size % (4 * k):
            writer.add(name, bytes(src.raw(name)), dt.DataType.F32)
            nf += 1
            continue
        writer.add(name, dt.quant_q4_0_4x4(arr, k).tobytes(), dt.DataType.Q4_0_4_4)
        nq += 1
    writer.write()
    print(f"quantized {nq} tensors to Q4_0_4_4 (hidden={hidden}), kept {nf} -> {outp}")


def main():
    from mllm_tpu.core import dtypes as dt
    from mllm_tpu.core.param_loader import MllmWriter, ParamLoader

    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("dtype", choices=["Q4_0", "Q8_0", "Q4_K", "Q6_K", "Q2_0",
                                      "Q2_K", "Q3_K", "Q8_K", "Q4_0_4_4"])
    args = ap.parse_args()

    if args.dtype == "Q4_0_4_4":
        return quantize_q4_0_4x4_file(args.input, args.output)

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
