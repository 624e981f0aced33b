"""Elastic and predictor-sparse inference wiring (models/elastic.py).

Oracle strategy mirrors the reference's semantics
(/root/reference/mllm/models/llama/modeling_elastic_llama.hpp,
modeling_sparse_llama.hpp): elastic = first-N-heads/neurons truncation,
sparse = masked-dense equivalence.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mllm_tpu.core.config import TextConfig
from mllm_tpu.models.elastic import elastic_model, make_predictors, sparse_model
from mllm_tpu.models.transformer import CausalLM


def _tiny(l=2, heads=4, kv=2, inter=128):
    cfg = TextConfig(
        vocab_size=96, hidden_size=64, intermediate_size=inter, num_hidden_layers=l,
        num_attention_heads=heads, num_key_value_heads=kv,
        max_position_embeddings=128, eos_token_id=-5,
    )
    return CausalLM.init(jax.random.PRNGKey(7), cfg), cfg


def _logits(model, ids):
    cache = model.init_cache(1, 32, dtype=jnp.float32)
    out, _ = model(ids, cache, last_only=False)
    return np.asarray(out)


IDS = np.arange(12, dtype=np.int32)[None, :] % 96


def test_elastic_ratio_one_is_exact():
    model, _ = _tiny()
    el = elastic_model(model, 1.0, 1.0)
    np.testing.assert_array_equal(_logits(el, IDS), _logits(model, IDS))


def test_elastic_half_matches_manual_truncation():
    """elastic_model(0.5) == a CausalLM built from hand-sliced numpy weights."""
    model, cfg = _tiny(heads=4, kv=2, inter=128)
    hd = cfg.head_dim_
    el = elastic_model(model, attn_ratio=0.5, mlp_ratio=0.5)
    assert el.cfg.num_attention_heads == 2 and el.cfg.num_key_value_heads == 1

    # independent truncation: init a small model, copy slices of the big one
    small_cfg = cfg.replace(num_attention_heads=2, num_key_value_heads=1, head_dim=hd)
    manual = CausalLM.init(jax.random.PRNGKey(0), small_cfg)
    ai = 64
    blocks = []
    for big, sm in zip(model.blocks.mods, manual.blocks.mods):
        attn = sm.attn.replace(
            q_proj=sm.attn.q_proj.replace(weight=big.attn.q_proj.weight[: 2 * hd, :],
                                          bias=big.attn.q_proj.bias[: 2 * hd]),
            k_proj=sm.attn.k_proj.replace(weight=big.attn.k_proj.weight[: 1 * hd, :],
                                          bias=big.attn.k_proj.bias[: 1 * hd]),
            v_proj=sm.attn.v_proj.replace(weight=big.attn.v_proj.weight[: 1 * hd, :],
                                          bias=big.attn.v_proj.bias[: 1 * hd]),
            o_proj=sm.attn.o_proj.replace(weight=big.attn.o_proj.weight[:, : 2 * hd],
                                          bias=big.attn.o_proj.bias),
        )
        mlp = sm.mlp.replace(
            gate_proj=sm.mlp.gate_proj.replace(weight=big.mlp.gate_proj.weight[:ai, :], bias=None),
            up_proj=sm.mlp.up_proj.replace(weight=big.mlp.up_proj.weight[:ai, :], bias=None),
            down_proj=sm.mlp.down_proj.replace(weight=big.mlp.down_proj.weight[:, :ai], bias=None),
        )
        blocks.append(sm.replace(attn=attn, mlp=mlp,
                                 input_norm=big.input_norm, post_attn_norm=big.post_attn_norm))
    from mllm_tpu.nn.module import ModuleList

    manual = manual.replace(blocks=ModuleList(blocks), embed_tokens=model.embed_tokens,
                            norm=model.norm, lm_head=model.lm_head, rope=model.rope)
    np.testing.assert_allclose(_logits(el, IDS), _logits(manual, IDS), rtol=0, atol=0)


def test_elastic_generate_runs():
    from mllm_tpu.generation.generate import generate
    from mllm_tpu.generation.sampling import SamplingConfig

    model, _ = _tiny()
    el = elastic_model(model, 0.5, 0.5)
    cache = el.init_cache(1, 32, dtype=jnp.float32)
    res, _ = generate(el, IDS[:, :5], cache, SamplingConfig(max_new_tokens=4), bucket=8)
    assert len(res.tokens) == 4


def test_sparse_all_active_equals_dense():
    model, cfg = _tiny()
    preds = make_predictors(jax.random.PRNGKey(1), model, rank=16)
    sp = sparse_model(model, preds, threshold=-1e30)  # every neuron active
    np.testing.assert_allclose(_logits(sp, IDS), _logits(model, IDS), atol=1e-6)


def test_sparse_masks_neurons_and_matches_masked_dense():
    model, cfg = _tiny(l=1)
    preds = make_predictors(jax.random.PRNGKey(2), model, rank=16)
    sp = sparse_model(model, preds, threshold=0.0)
    smlp = sp.blocks.mods[0].mlp
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 5, cfg.hidden_size), jnp.float32)

    got = np.asarray(smlp(x))
    # masked-dense oracle computed with plain jnp ops
    scores = np.asarray(smlp.neuron_scores(x))
    mask = (scores > 0.0).astype(np.float32)
    assert 0.05 < mask.mean() < 0.95  # the predictor actually gates something
    dense = model.blocks.mods[0].mlp
    h = np.asarray(jax.nn.silu(dense.gate_proj(x))) * np.asarray(dense.up_proj(x))
    want = np.asarray(dense.down_proj(jnp.asarray(h * mask)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sparse_generate_runs():
    from mllm_tpu.generation.generate import generate
    from mllm_tpu.generation.sampling import SamplingConfig

    model, _ = _tiny()
    preds = make_predictors(jax.random.PRNGKey(4), model, rank=16)
    sp = sparse_model(model, preds, threshold=0.0)
    cache = sp.init_cache(1, 32, dtype=jnp.float32)
    res, _ = generate(sp, IDS[:, :5], cache, SamplingConfig(max_new_tokens=4), bucket=8)
    assert len(res.tokens) == 4
