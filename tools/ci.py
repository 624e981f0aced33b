"""CI smoke test: run the framework end-to-end on whatever device is
attached and emit a machine-readable report.

TPU-native counterpart of the reference's device-farm smoke runner
(/root/reference/tools/ci/mobile_test.py): where that pushes binaries to
phones over adb, runs a demo per model and greps the output, this runs the
core subsystems in-process on the attached backend (TPU chip or CPU) and
reports per-stage latency + pass/fail as one JSON object — suitable for a
cron/CI gate (`python tools/ci.py || exit 1`).

Stages: device probe, tiny-model build, prefill+decode generate (greedy,
compiled loop), int8 quantized decode, tokenizer round-trip, image
preprocess, KV-cache advance/rollback.  Each stage is isolated: a failure
records the error and the remaining stages still run.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _stage(report, name, fn):
    t0 = time.perf_counter()
    try:
        detail = fn() or {}
        report["stages"][name] = {"ok": True,
                                  "ms": round((time.perf_counter() - t0) * 1e3, 1),
                                  **detail}
    except Exception as e:  # noqa: BLE001 — report, don't abort the suite
        report["stages"][name] = {"ok": False,
                                  "ms": round((time.perf_counter() - t0) * 1e3, 1),
                                  "error": f"{type(e).__name__}: {e}",
                                  "trace": traceback.format_exc(limit=3)}


def main(argv=None):
    import numpy as np

    report = {"tool": "mllm_tpu-ci-smoke", "stages": {}}

    def probe():
        import jax

        devs = jax.devices()
        report["platform"] = devs[0].platform
        return {"devices": len(devs), "kind": devs[0].device_kind}

    _stage(report, "device", probe)

    import jax
    import jax.numpy as jnp

    from mllm_tpu.core.config import TextConfig
    from mllm_tpu.models.transformer import CausalLM

    cfg = TextConfig(vocab_size=256, hidden_size=128, intermediate_size=256,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=256,
                     eos_token_id=-7)
    state = {}

    def build():
        state["model"] = CausalLM.init(jax.random.PRNGKey(0), cfg,
                                       dtype=jnp.bfloat16)
        return {"params": sum(int(np.prod(l.shape))
                              for l in jax.tree.leaves(state["model"]))}

    _stage(report, "build", build)

    def _generate(model, new_tokens):
        from mllm_tpu.generation.generate import generate
        from mllm_tpu.generation.sampling import SamplingConfig

        ids = np.arange(16, dtype=np.int32)[None, :] % cfg.vocab_size
        cache = model.init_cache(1, 256, jnp.bfloat16)
        res, _ = generate(model, jnp.asarray(ids), cache,
                          SamplingConfig(max_new_tokens=new_tokens,
                                         min_new_tokens=new_tokens))
        toks = res.tokens
        assert len(toks) >= new_tokens and all(t >= 0 for t in toks), toks
        return {"tokens": len(toks), "ttft_ms": round(res.ttft_s * 1e3, 1)}

    _stage(report, "generate", lambda: _generate(state["model"], 8))

    def quantized():
        from mllm_tpu.ops.quantize_model import quantize_model

        return _generate(quantize_model(state["model"], "int8", min_size=1), 4)

    _stage(report, "int8_decode", quantized)

    def tokenizer():
        from mllm_tpu.tokenizers.base import text_to_byte_units
        from mllm_tpu.tokenizers.bpe import ByteLevelBPE

        text = "ci smoke"
        units = sorted(set(text_to_byte_units(text)))
        vocab = {u: i for i, u in enumerate(units)}
        tok = ByteLevelBPE(vocab, list(units), {})
        ids = tok.encode_ordinary(text)
        assert tok.decode(ids) == text, tok.decode(ids)
        return {"ids": len(ids)}

    _stage(report, "tokenizer", tokenizer)

    def image():
        from mllm_tpu.processor.image import smart_resize

        h, w = smart_resize(480, 640, factor=28)
        assert h % 28 == 0 and w % 28 == 0
        return {"resized": [h, w]}

    _stage(report, "image_preprocess", image)

    def kv_cache():
        cache = state["model"].init_cache(1, 64, jnp.bfloat16)
        assert int(cache.pos) == 0
        cache2 = cache.advance(5)
        assert int(cache2.pos) == 5

    _stage(report, "kv_cache", kv_cache)

    def multichip_dryrun():
        # Run the driver's 8-device gate under the driver's OWN wall-clock
        # budget (580 s): round 3 regressed this gate (MULTICHIP_r03 rc=124)
        # because local CI only checked correctness, not elapsed time.
        import subprocess

        env = dict(os.environ,
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=8")
        entry = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
        t0 = time.perf_counter()
        proc = subprocess.run([sys.executable, entry, "multichip", "8"],
                              env=env, capture_output=True, text=True, timeout=580)
        elapsed = time.perf_counter() - t0
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "dryrun_multichip OK" in proc.stdout, proc.stdout[-500:]
        return {"elapsed_s": round(elapsed, 1), "budget_s": 580}

    if "--dryrun" in (argv or sys.argv[1:]):
        _stage(report, "multichip_dryrun", multichip_dryrun)

    report["ok"] = all(s["ok"] for s in report["stages"].values())
    print(json.dumps(report))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
