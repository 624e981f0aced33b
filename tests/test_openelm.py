"""OpenELM: layer-wise-scaled architecture (no HF oracle available — apple's
checkpoint needs trust_remote_code).  Structural tests: non-uniform layers,
cache semantics, incremental == full forward."""

import numpy as np
import jax.numpy as jnp

from mllm_tpu.core.param_loader import MllmWriter, ParamLoader
from mllm_tpu.models.openelm import OpenELMConfig, load_openelm


def _write_random(path, cfg: OpenELMConfig, seed=0):
    rng = np.random.default_rng(seed)
    w = MllmWriter(path)

    def add(name, *shape):
        w.add(name + ".weight", (rng.standard_normal(shape) * 0.05).astype(np.float32))

    add("transformer.token_embeddings", cfg.vocab_size, cfg.model_dim)
    add("transformer.norm", cfg.model_dim)
    for i in range(cfg.num_layers):
        p = f"transformer.layers.{i}."
        nq, nkv, ffn = cfg.num_query_heads[i], cfg.num_kv_heads[i], cfg.ffn_dims[i]
        add(p + "attn.qkv_proj", (nq + 2 * nkv) * cfg.head_dim, cfg.model_dim)
        add(p + "attn.out_proj", cfg.model_dim, nq * cfg.head_dim)
        add(p + "attn.q_norm", cfg.head_dim)
        add(p + "attn.k_norm", cfg.head_dim)
        add(p + "attn_norm", cfg.model_dim)
        add(p + "ffn_norm", cfg.model_dim)
        add(p + "ffn.proj_1", 2 * ffn, cfg.model_dim)
        add(p + "ffn.proj_2", cfg.model_dim, ffn)
    w.write()


def test_openelm_nonuniform_layers(tmp_path):
    cfg = OpenELMConfig(
        vocab_size=64, model_dim=32, num_layers=3, head_dim=8,
        num_query_heads=(2, 4, 4), num_kv_heads=(1, 1, 2),
        ffn_dims=(32, 48, 64), max_context=64,
    )
    p = tmp_path / "oe.mllm"
    _write_random(p, cfg)
    model = load_openelm(ParamLoader(p), cfg)

    ids = jnp.asarray(np.arange(1, 9)[None], jnp.int32)
    cache = model.init_cache(1, 32, jnp.float32)
    full, _ = model(ids, cache, last_only=False)
    assert full.shape == (1, 8, 64)
    assert np.isfinite(np.asarray(full)).all()

    # incremental == full
    cache2 = model.init_cache(1, 32, jnp.float32)
    lg, cache2 = model(ids[:, :5], cache2, last_only=False)
    outs = [np.asarray(lg)[0]]
    for i in range(5, 8):
        lg, cache2 = model(ids[:, i : i + 1], cache2, last_only=False)
        outs.append(np.asarray(lg)[0])
    inc = np.concatenate(outs, axis=0)
    np.testing.assert_allclose(np.asarray(full)[0], inc, rtol=2e-4, atol=2e-5)


def test_openelm_config_from_hf():
    cfg = OpenELMConfig.from_hf({
        "num_transformer_layers": 4, "model_dim": 64, "head_dim": 16,
        "num_query_heads": [2, 2, 4, 4], "num_kv_heads": [1, 1, 2, 2],
        "ffn_multipliers": [0.5, 1.0, 1.5, 2.0], "ffn_dim_divisor": 16,
        "vocab_size": 100,
    })
    assert cfg.num_layers == 4
    assert cfg.ffn_dims == (32, 64, 96, 128)
