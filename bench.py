"""Benchmark harness — mirrors the reference's profiling protocol
(/root/reference/mllm/Module.cpp:25-61 Module::profiling and
 examples/mllm_benchmark.cpp): load time, prefill tok/s, TTFT, decode tok/s.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The headline metric is decode tok/s on the flagship decoder config
(BASELINE.md north star: Qwen2-VL-2B >= 2000 decode tok/s on one v5e chip).
Until the full Qwen2-VL stack lands, this benches the Qwen2-class LM decode
path (bf16 weights, Pallas decode attention, on-device sampling loop).
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def bench_decoder(prompt_len=128, decode_tokens=256, max_len=2048):
    from mllm_tpu.core.config import TextConfig
    from mllm_tpu.models.transformer import CausalLM
    from mllm_tpu.generation.generate import generate_compiled, pad_to_bucket
    from mllm_tpu.generation.sampling import SamplingConfig

    t_load0 = time.perf_counter()
    # Qwen2-0.5B geometry (reference configuration_qwen.hpp "0.5b");
    # stand-in for Qwen2-VL-2B's LM until the vision stack lands.
    cfg = TextConfig(
        vocab_size=151936, hidden_size=1024, intermediate_size=2816,
        num_hidden_layers=24, num_attention_heads=16, num_key_value_heads=16,
        max_position_embeddings=32768, eos_token_id=-2,
    )
    model = CausalLM.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    t_load = time.perf_counter() - t_load0

    ids = np.random.randint(0, cfg.vocab_size, (1, prompt_len)).astype(np.int32)
    padded = jnp.asarray(pad_to_bucket(ids, 128))
    scfg = SamplingConfig(max_new_tokens=decode_tokens)

    def run():
        # NB: np.asarray (host transfer) is the sync point; block_until_ready
        # is not reliable through the remote-execution relay.
        cache = model.init_cache(1, max_len, jnp.bfloat16)
        toks, n = generate_compiled(
            model, padded, cache, prompt_len, decode_tokens, scfg, eos_token_id=-7
        )
        return np.asarray(toks), n

    # warm-up compile
    t0 = time.perf_counter()
    run()
    t_compile = time.perf_counter() - t0

    # timed runs
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        toks, n = run()
        times.append(time.perf_counter() - t0)
    t_total = min(times)
    if "--debug" in sys.argv:
        print("times:", times, "n:", int(n), file=sys.stderr)

    # separate prefill timing (TTFT): jitted prefill alone
    from mllm_tpu.generation.generate import _prefill

    cache = model.init_cache(1, max_len, jnp.bfloat16)
    logits, cache2 = _prefill(model, cache, padded, prompt_len)
    np.asarray(logits)
    cache = model.init_cache(1, max_len, jnp.bfloat16)
    t0 = time.perf_counter()
    logits, cache2 = _prefill(model, cache, padded, prompt_len)
    np.asarray(logits)
    ttft = time.perf_counter() - t0

    decode_time = max(t_total - ttft, 1e-9)
    decode_tps = (decode_tokens - 1) / decode_time
    prefill_tps = prompt_len / ttft

    return {
        "load_s": round(t_load, 3),
        "compile_s": round(t_compile, 1),
        "ttft_s": round(ttft, 4),
        "prefill_tps": round(prefill_tps, 1),
        "decode_tps": round(decode_tps, 1),
    }


def main():
    stats = bench_decoder()
    result = {
        "metric": "decode_tok_s_qwen2_0.5b_bf16",
        "value": stats["decode_tps"],
        "unit": "tok/s",
        # reference publishes no absolute numbers (BASELINE.md); north star for
        # Qwen2-VL-2B decode is 2000 tok/s — report ratio against that bar.
        "vs_baseline": round(stats["decode_tps"] / 2000.0, 3),
        "detail": stats,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
