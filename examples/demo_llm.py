#!/usr/bin/env python
"""Generic chat demo — counterpart of the reference's demo_qwen / demo_llama
CLIs (/root/reference/examples/demo_qwen.cpp) with the same flag spirit:

  python examples/demo_llm.py -m <model_dir> [-l kv_limit] [-q int8|int4] \\
      [--prompt "..."] [--max-new 100] [--temperature 0.7 --top-k 40]

Model dir = HF-style directory (config.json + safetensors + tokenizer.json)
or a directory of .mllm files + tokenizer.json.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp


def main():
    from mllm_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True, help="model directory")
    ap.add_argument("-l", "--limits", type=int, default=2048, help="KV cache limit (cache_limit)")
    ap.add_argument("-q", "--quant", choices=["int8", "int8-a8", "int4", "int4-mixed"], default=None)
    ap.add_argument("--prompt", default="Give me a short introduction to large language models.")
    ap.add_argument("--max-new", type=int, default=128)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--top-k", type=int, default=0)
    ap.add_argument("--top-p", type=float, default=0.0)
    ap.add_argument("--no-chat-template", action="store_true")
    ap.add_argument("--chunked", type=int, default=0, metavar="CHUNK",
                    help="chunked prefill with this chunk size (one compiled "
                         "program for any prompt length)")
    ap.add_argument("--turns", type=int, default=1,
                    help=">1: repeat generation reusing the prompt cache "
                         "(prefix-reuse demo)")
    ap.add_argument("--kv", choices=["bf16", "int8", "int4"], default="bf16",
                    help="KV cache dtype (int8 = 2x context, int4 = 4x; "
                         "fused quant decode kernels; reference "
                         "KVCache_TYPE knob, int4 beyond its q8 floor)")
    ap.add_argument("--elastic", type=float, default=0, metavar="RATIO",
                    help="elastic inference: activate only the first RATIO "
                         "fraction of heads/FFN neurons (reference "
                         "demo_elastic_llama activate_dims)")
    ap.add_argument("--batch", type=int, default=1,
                    help=">1: batched generation of this many prompts "
                         "(ragged left-pad; reference demo_qwen_batch)")
    ap.add_argument("--mbp", type=int, default=0, metavar="N_RESIDENT",
                    help="MoE models only: MBP expert offload — experts live "
                         "in host RAM, at most N_RESIDENT are device-cached, "
                         "routed experts stream in with next-layer prefetch "
                         "(reference demo_minicpm_moe_mbp)")
    ap.add_argument("--sparse", type=float, default=None, metavar="THRESH",
                    help="predictor-sparse FFN with this threshold "
                         "(reference modeling_sparse_llama; predictors are "
                         "random unless shipped with the checkpoint)")
    args = ap.parse_args()

    from mllm_tpu.generation.generate import generate
    from mllm_tpu.generation.sampling import SamplingConfig
    from mllm_tpu.models.registry import auto_model
    from mllm_tpu.utils.profiling import Profiler

    t0 = time.perf_counter()
    model, tok, cfg = auto_model(args.model, dtype=jnp.bfloat16, quant=args.quant)
    if args.elastic:
        from mllm_tpu.models.elastic import elastic_model

        model = elastic_model(model, args.elastic, args.elastic)
        print(f"[elastic] ratio {args.elastic}: heads {cfg.num_attention_heads}"
              f"->{model.cfg.num_attention_heads}, ffn {cfg.intermediate_size}"
              f"->{model.blocks.mods[0].mlp.down_proj.weight.shape[1] if hasattr(model.blocks.mods[0].mlp.down_proj, 'weight') else '?'}")
        cfg = model.cfg
    if args.sparse is not None:
        from mllm_tpu.models.elastic import make_predictors, sparse_model
        import jax as _jax

        model = sparse_model(model, make_predictors(_jax.random.PRNGKey(0), model),
                             threshold=args.sparse)
        print(f"[sparse] predictor-gated FFN, threshold {args.sparse}")
    prof = Profiler(load_s=time.perf_counter() - t0)
    if tok is None:
        print("no tokenizer.json found in model dir", file=sys.stderr)
        sys.exit(1)

    from mllm_tpu.tokenizers.chat_templates import render

    text = args.prompt if args.no_chat_template else render(cfg.model_type, args.prompt)
    ids = np.asarray(tok.encode(text, bos=True), np.int32)[None, :]
    print(f"[{cfg.model_type}] prompt tokens: {ids.shape[1]}")

    cache = model.init_cache(1, args.limits, jnp.bfloat16, kv_dtype=args.kv)
    scfg = SamplingConfig(
        max_new_tokens=args.max_new,
        do_sample=args.temperature > 0,
        temperature=args.temperature or 1.0,
        top_k=args.top_k, top_p=args.top_p,
    )

    def stream(t):
        sys.stdout.write(tok.detokenize(t))
        sys.stdout.flush()
        return True

    if args.mbp:
        from mllm_tpu.models.moe import mbp_forward, to_mbp

        model, store = to_mbp(model, max_device_entries=args.mbp)
        print(f"[mbp] {len(store.host)} experts host-resident, "
              f"device budget {args.mbp}")
        # MBP routes data-dependently through the host store -> host-driven
        # loop with jitted dense sub-blocks (the reference's MBP path equally
        # runs outside its graph executor)
        t0 = time.perf_counter()
        logits, cache = mbp_forward(model, jnp.asarray(ids), cache)
        ttft = time.perf_counter() - t0
        tokv = int(np.argmax(np.asarray(logits[0, -1])))
        stream(tokv)
        n = 1
        t0 = time.perf_counter()
        for _ in range(scfg.max_new_tokens - 1):
            logits, cache = mbp_forward(model, jnp.asarray([[tokv]], jnp.int32), cache)
            tokv = int(np.argmax(np.asarray(logits[0, -1])))
            if tokv == tok.eos_token_id:
                break
            stream(tokv)
            n += 1
        dt = time.perf_counter() - t0
        print(f"\n[mbp] ttft {ttft*1e3:.0f} ms, {n / dt:.1f} tok/s, "
              f"expert cache hit rate {store.hit_rate:.1%} "
              f"({store.hits} hits / {store.misses} misses)")
        prof.ttft_s = ttft
        prof.decode_tps = n / dt
        prof.report(args.model)
        return
    if args.batch > 1:
        from mllm_tpu.generation.generate import ragged_batched_generate

        prompts = [np.asarray(tok.encode(text, bos=True), np.int32)]
        for i in range(1, args.batch):  # vary lengths to exercise ragged padding
            prompts.append(prompts[0][: max(1, len(prompts[0]) - i % 5)])
        cache = model.init_cache(args.batch, args.limits, jnp.bfloat16, kv_dtype=args.kv)
        t0 = time.perf_counter()
        toks, n_valid, _ = ragged_batched_generate(model, prompts, cache, scfg)
        dt = time.perf_counter() - t0
        for i in range(args.batch):
            print(f"[seq {i}] {tok.decode(toks[i, : n_valid[i]].tolist())!r}")
        total = int(n_valid.sum())
        print(f"batch={args.batch}: {total} tokens in {dt:.2f} s "
              f"({total / dt:.1f} tok/s aggregate)")
        prof.report(args.model)
        return
    if args.chunked or args.turns > 1:
        from mllm_tpu.generation.generate import _decode_step
        from mllm_tpu.generation.prefill import PromptCache, prefill_with_prompt_cache
        from mllm_tpu.generation.sampling import sample_token
        import jax

        pcache = PromptCache()
        chunk = args.chunked or 256
        for turn in range(args.turns):
            cache = model.init_cache(1, args.limits, jnp.bfloat16)
            t0 = time.perf_counter()
            logits, cache, matched = prefill_with_prompt_cache(
                model, cache, ids, ids.shape[1], pcache, chunk=chunk)
            ttft = time.perf_counter() - t0
            tokv = sample_token(jax.random.PRNGKey(turn), logits, scfg)
            n = 1
            stream(int(tokv[0]))
            for _ in range(scfg.max_new_tokens - 1):
                logits, cache = _decode_step(model, cache, tokv)
                tokv = sample_token(jax.random.PRNGKey(turn * 1000 + n), logits, scfg)
                t = int(tokv[0])
                if t == tok.eos_token_id:
                    break
                stream(t)
                n += 1
            print(f"\n[turn {turn}] prefix-cache hit: {matched}/{ids.shape[1]} tokens, "
                  f"ttft {ttft*1000:.0f} ms")
        prof.ttft_s = ttft
        prof.report(args.model)
    else:
        res, cache = generate(model, ids, cache, scfg, callback=stream,
                              eos_token_id=tok.eos_token_id)
        print()
        prof.prefill_tps = res.prefill_tps
        prof.ttft_s = res.ttft_s
        prof.decode_tps = res.decode_tps
        prof.report(args.model)


if __name__ == "__main__":
    main()
