"""Native C++ library parity vs the numpy reference implementations.

Skipped when the toolchain is unavailable (the numpy fallback is always
exercised by the other suites)."""

import numpy as np
import pytest

from mllm_tpu.core import dtypes as dt
from mllm_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


@pytest.mark.parametrize(
    "kind,quant,dtype",
    [
        ("q4_0", dt.quant_q4_0, dt.DataType.Q4_0),
        ("q8_0", dt.quant_q8_0, dt.DataType.Q8_0),
        ("q4_k", dt.quant_q4_k, dt.DataType.Q4_K),
        ("q6_k", dt.quant_q6_k, dt.DataType.Q6_K),
    ],
)
def test_dequant_bit_exact(kind, quant, dtype):
    x = np.random.default_rng(0).standard_normal(1024 * 8).astype(np.float32)
    raw = quant(x)
    a = native.dequant(kind, raw, x.size)
    b = dt._DEQUANT[dtype](np.frombuffer(raw, np.uint8), x.size)
    np.testing.assert_array_equal(a, b)


def test_repack_int8_bit_exact():
    w = np.random.default_rng(1).standard_normal((64, 256)).astype(np.float32)
    qn, sn = native.repack_int8(w)
    qp, sp = dt.quant_q8_per_row_int8(w)
    np.testing.assert_array_equal(qn, qp.T)
    np.testing.assert_array_equal(sn, sp)


def test_repack_int4_bit_exact(monkeypatch):
    import mllm_tpu.ops.quant_matmul as qm

    w = np.random.default_rng(2).standard_normal((64, 256)).astype(np.float32)
    pn, scn = native.repack_int4(w, 32)
    monkeypatch.setenv("MLLM_NO_NATIVE", "1")
    native.get_lib.cache_clear()
    try:
        pp, scp = qm.repack_float_to_int4(w, 32)
    finally:
        monkeypatch.delenv("MLLM_NO_NATIVE")
        native.get_lib.cache_clear()
    np.testing.assert_array_equal(pn, pp)
    np.testing.assert_array_equal(scn, scp)


def test_native_bpe_merge():
    # vocab: 1='h' 2='i' 10='hi'; 3='!'; 11='hi!'
    tbl = native.NativeBpe({(1, 2): (0, 10), (10, 3): (1, 11)})
    out = tbl.merge(np.array([1, 2, 3, 1, 2], np.int32))
    assert out.tolist() == [11, 10]
    # no applicable merges
    out = tbl.merge(np.array([5, 6, 7], np.int32))
    assert out.tolist() == [5, 6, 7]


def test_quant_q8_0_scale_fp16_rne_bit_exact():
    """Native f32->f16 narrowing must round-to-nearest-even like numpy
    (ADVICE r1, low) — includes tiny blocks that hit the subnormal-half path."""
    rng = np.random.default_rng(0)
    w = np.concatenate([
        rng.standard_normal(32 * 500).astype(np.float32),
        (rng.standard_normal(32 * 100) * 1e-5).astype(np.float32),
        (rng.standard_normal(32 * 100) * 1e-7).astype(np.float32),
    ])
    out = native.quant_q8_0(w)
    if out is None:
        import pytest
        pytest.skip("native lib unavailable")
    d_nat = out.reshape(-1, 34)[:, :2].copy().view(np.float16)[:, 0]
    amax = np.max(np.abs(w.reshape(-1, 32)), axis=1)
    d_np = (amax / 127.0).astype(np.float16)
    np.testing.assert_array_equal(d_nat.view(np.uint16), d_np.view(np.uint16))
