"""Metrics registry, Prometheus export, and XLA cost analysis."""

import jax.numpy as jnp
import numpy as np

from mllm_tpu.utils.metrics import GenerationMetrics, Metrics, cost_table


def test_counters_gauges_histograms():
    m = Metrics()
    m.inc("reqs")
    m.inc("reqs", 2)
    m.set("batch", 8)
    for v in [1.0, 2.0, 3.0, 4.0]:
        m.observe("lat", v)
    snap = m.snapshot()
    assert snap["counters"]["reqs"] == 3
    assert snap["gauges"]["batch"] == 8
    assert snap["histograms"]["lat"]["count"] == 4
    assert snap["histograms"]["lat"]["mean"] == 2.5


def test_prometheus_format():
    m = Metrics()
    m.inc("mllm.requests")
    m.observe("mllm.ttft", 0.5)
    text = m.to_prometheus()
    assert "mllm_requests 1.0" in text
    assert 'mllm_ttft{quantile="0.5"} 0.5' in text
    assert "mllm_ttft_count 1" in text


def test_timer():
    m = Metrics()
    with m.timer("op"):
        pass
    assert m.snapshot()["histograms"]["op"]["count"] == 1


def test_generation_metrics():
    m = Metrics()
    gm = GenerationMetrics(m)
    gm.record(prompt_tokens=100, new_tokens=50, ttft_s=0.1, total_s=1.1)
    snap = m.snapshot()
    assert snap["counters"]["mllm_generated_tokens_total"] == 50
    assert abs(snap["histograms"]["mllm_decode_tokens_per_second"]["mean"] - 49.0) < 1e-6


def test_cost_table():
    def f(a, b):
        return a @ b

    a = jnp.zeros((256, 512), jnp.float32)
    b = jnp.zeros((512, 128), jnp.float32)
    ct = cost_table(f, a, b)
    assert ct["flops"] >= 2 * 256 * 512 * 128 * 0.9
    assert ct["bytes_accessed"] > 0
    assert ct["bound"] in ("memory", "compute")
