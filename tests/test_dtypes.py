"""Quant format round-trips and container IO.

Mirrors the reference's golden-data quantizer tests
(/root/reference/test/quantizer/QuantTest.cpp) with numpy as the oracle.
"""

import numpy as np
import pytest

from mllm_tpu.core import dtypes as dt
from mllm_tpu.core.param_loader import (
    MllmWriter,
    ParamLoader,
    SafetensorsLoader,
    load_vocab,
    write_vocab,
)


def _rand(n):
    rng = np.random.default_rng(42)
    return rng.standard_normal(n).astype(np.float32)


@pytest.mark.parametrize(
    "quant,dtype,rtol",
    [
        (dt.quant_q4_0, dt.DataType.Q4_0, 0.15),
        (dt.quant_q8_0, dt.DataType.Q8_0, 0.01),
        (dt.quant_q4_k, dt.DataType.Q4_K, 0.12),
        (dt.quant_q6_k, dt.DataType.Q6_K, 0.04),
    ],
)
def test_quant_roundtrip(quant, dtype, rtol):
    x = _rand(1024)
    raw = quant(x)
    spec = dt.block_spec(dtype)
    assert raw.size == dt.nbytes_for(dtype, 1024)
    back = dt.decode(raw, dtype, 1024)
    rms = np.sqrt(np.mean((x - back) ** 2)) / np.sqrt(np.mean(x**2))
    assert rms < rtol, f"{dtype}: rms {rms}"


def test_block_sizes_match_ggml():
    # byte sizes must match ggml's block structs (reference vendored kernels)
    assert dt.block_spec(dt.DataType.Q4_0).nbytes == 18
    assert dt.block_spec(dt.DataType.Q8_0).nbytes == 34
    assert dt.block_spec(dt.DataType.Q4_K).nbytes == 144
    assert dt.block_spec(dt.DataType.Q6_K).nbytes == 210
    assert dt.block_spec(dt.DataType.Q2_K).nbytes == 84
    assert dt.block_spec(dt.DataType.Q3_K).nbytes == 110


def test_mllm_container_roundtrip(tmp_path):
    p = tmp_path / "w.mllm"
    w = MllmWriter(p)
    a = _rand(64).reshape(8, 8)
    b = _rand(256)
    braw = dt.quant_q8_0(b)
    w.add("model.layers.0.weight", a)
    w.add("model.layers.0.q", braw, dt.DataType.Q8_0)
    w.write()

    ld = ParamLoader(p)
    assert set(ld) == {"model.layers.0.weight", "model.layers.0.q"}
    assert ld.dtype("model.layers.0.weight") == dt.DataType.F32
    np.testing.assert_array_equal(ld.load("model.layers.0.weight", (8, 8)), a)
    back = ld.load("model.layers.0.q", (256,))
    assert np.sqrt(np.mean((b - back) ** 2)) < 0.01


def test_vocab_roundtrip(tmp_path):
    p = tmp_path / "v.mllm"
    toks = ["<s>", "hello", "世界", "##ing"]
    write_vocab(p, toks, [0.0, -1.5, -2.0, -3.0])
    t2i, i2t, scores = load_vocab(p)
    assert i2t == toks
    assert t2i["hello"] == 1
    assert abs(scores[2] + 2.0) < 1e-6


def test_safetensors_reader(tmp_path):
    import json, struct

    a = _rand(32).reshape(4, 8)
    header = {
        "x": {"dtype": "F32", "shape": [4, 8], "data_offsets": [0, 128]},
    }
    hb = json.dumps(header).encode()
    with open(tmp_path / "m.safetensors", "wb") as f:
        f.write(struct.pack("<Q", len(hb)))
        f.write(hb)
        f.write(a.tobytes())
    ld = SafetensorsLoader(tmp_path / "m.safetensors")
    np.testing.assert_array_equal(ld.load("x"), a)
