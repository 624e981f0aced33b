#!/usr/bin/env python
"""OPT text-generation demo — counterpart of
/root/reference/examples/demo_opt.cpp:

  python examples/demo_opt.py -m <opt_dir> [--prompt "Hello, who are you?"]
"""

import time

from _demo_common import jnp, np, std_parser, vl_decode_loop


def main():
    args = std_parser(__doc__, default_prompt="Hello, who are you?").parse_args()

    from mllm_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from mllm_tpu.models.opt import load_opt, opt_config_from_hf
    from mllm_tpu.models.registry import open_loader
    from mllm_tpu.tokenizers.hf_json import auto_tokenizer

    t0 = time.perf_counter()
    cfg = opt_config_from_hf(args.model)
    model = load_opt(open_loader(args.model), cfg, jnp.bfloat16)
    tok = auto_tokenizer(args.model)
    print(f"load: {time.perf_counter() - t0:.1f} s")

    # OPT prepends </s> (bos id 2)
    ids = np.asarray([cfg.bos_token_id] + tok.encode(args.prompt), np.int32)[None, :]
    cache = model.init_cache(1, args.limits, jnp.bfloat16)
    logits, cache = model(jnp.asarray(ids), cache)
    vl_decode_loop(model, tok, logits, cache, args.max_new)


if __name__ == "__main__":
    main()
