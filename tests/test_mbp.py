"""MBP host-expert streaming (reference expert-offload counterpart)."""

import numpy as np
import jax
import jax.numpy as jnp

from mllm_tpu.utils.mbp import HostExpertStore, mbp_moe_forward


def _cpu():
    import jax
    return jax.devices("cpu")[0]


def _store(n_layers=3, n_experts=4, d=8, ff=16, seed=0):
    rng = np.random.default_rng(seed)
    weights = {}
    for l in range(n_layers):
        for e in range(n_experts):
            weights[(l, e)] = (
                rng.standard_normal((ff, d)).astype(np.float32) * 0.2,
                rng.standard_normal((ff, d)).astype(np.float32) * 0.2,
                rng.standard_normal((d, ff)).astype(np.float32) * 0.2,
            )
    return weights


def test_fetch_cache_and_prefetch():
    st = HostExpertStore(_store(), device=_cpu(), max_device_entries=4)
    a = st.fetch(0, 1)
    b = st.fetch(0, 1)
    assert st.hits == 1 and st.misses == 1
    assert a is b
    st.prefetch([(1, 0), (1, 2)])
    st.wait()
    st.fetch(1, 0)
    st.fetch(1, 2)
    assert st.hits == 3  # prefetched entries hit


def test_lru_bound():
    st = HostExpertStore(_store(), device=_cpu(), max_device_entries=2)
    st.fetch(0, 0)
    st.fetch(0, 1)
    st.fetch(0, 2)
    assert len(st._cache) == 2


def test_mbp_forward_matches_dense():
    n_experts, d, ff, k = 4, 8, 16, 2
    weights = _store(n_layers=2, n_experts=n_experts, d=d, ff=ff)
    st = HostExpertStore(weights, device=_cpu())
    rng = np.random.default_rng(1)
    router = jnp.asarray(rng.standard_normal((n_experts, d)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((5, d)).astype(np.float32))

    y = mbp_moe_forward(x, router, st, layer=0, n_layers=2, top_k=k,
                        act_fn=jax.nn.silu, norm_topk=True)

    # dense reference
    logits = np.asarray(x) @ np.asarray(router).T
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    top_i = np.argsort(-p, axis=-1)[:, :k]
    ref = np.zeros((5, d), np.float32)
    for t in range(5):
        ps = p[t, top_i[t]]
        ps = ps / ps.sum()
        for j, e in enumerate(top_i[t]):
            wg, wu, wd = weights[(0, e)]
            h = np.asarray(jax.nn.silu(np.asarray(x)[t] @ wg.T)) * (np.asarray(x)[t] @ wu.T)
            ref[t] += (h @ wd.T) * ps[j]
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-4, atol=2e-5)
    st.wait()
    assert len(st._cache) > 0  # layer-1 prefetch staged


def test_to_mbp_model_matches_resident(tmp_path):
    """Model-level MBP exactness: a real MoE CausalLM converted with
    `to_mbp` must produce the resident model's logits (reference
    modeling_minicpm_moe_mbp.hpp streams experts without changing math),
    and prefetch across layers must produce cache hits."""
    import torch
    import transformers

    from mllm_tpu.models.moe import MBPMoEMLP, to_mbp
    from mllm_tpu.models.registry import auto_model

    torch.manual_seed(0)
    cfg = transformers.MixtralConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
        num_local_experts=4, num_experts_per_tok=2, rope_theta=10000.0,
    )
    transformers.MixtralForCausalLM(cfg).eval().save_pretrained(tmp_path / "m")
    with jax.default_device(_cpu()):
        ours, _, _ = auto_model(str(tmp_path / "m"), dtype=jnp.float32,
                                with_tokenizer=False)
        ids = jnp.asarray([[3, 17, 42, 99, 7, 23, 56, 11]], jnp.int32)
        cache = ours.init_cache(1, 32, jnp.float32)
        want, _ = ours(ids, cache, last_only=False)

        mbp, store = to_mbp(ours, max_device_entries=8, device=_cpu())
        assert len(store.host) == 3 * 4
        assert all(isinstance(b.mlp, MBPMoEMLP) for b in mbp.blocks)
        cache = mbp.init_cache(1, 32, jnp.float32)
        got, cache = mbp(ids, cache, last_only=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
    store.wait()
    assert store.hits > 0  # layer L's routed set prefetched for L+1

    # decode step (T=1) through the updated cache stays finite + exact-ish
    with jax.default_device(_cpu()):
        nxt = jnp.argmax(got[:, -1:], axis=-1).astype(jnp.int32)
        got2, _ = mbp(nxt, cache)
    assert np.isfinite(np.asarray(got2)).all()


def test_mbp_rejects_jit():
    from mllm_tpu.models.moe import MBPMoEMLP

    st = HostExpertStore(_store(n_layers=1), device=_cpu())
    layer = MBPMoEMLP(jnp.zeros((4, 8)), st, 0, 1, 2, True, "silu")
    with np.testing.assert_raises(Exception):
        jax.jit(layer)(jnp.zeros((1, 2, 8)))


def test_mbp_forward_jitted_subblocks(tmp_path):
    """mbp_forward (per-layer jitted dense sub-blocks + host expert
    streaming) matches the resident model across prefill + a decode step."""
    import torch
    import transformers

    from mllm_tpu.models.moe import mbp_forward, to_mbp
    from mllm_tpu.models.registry import auto_model

    torch.manual_seed(1)
    cfg = transformers.MixtralConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=64,
        num_local_experts=4, num_experts_per_tok=2, rope_theta=10000.0,
    )
    transformers.MixtralForCausalLM(cfg).eval().save_pretrained(tmp_path / "m")
    with jax.default_device(_cpu()):
        ours, _, _ = auto_model(str(tmp_path / "m"), dtype=jnp.float32,
                                with_tokenizer=False)
        ids = jnp.asarray([[3, 17, 42, 7]], jnp.int32)
        cache = ours.init_cache(1, 16, jnp.float32)
        want, wcache = ours(ids, cache, last_only=True)
        nxt = jnp.argmax(want[:, -1:], axis=-1).astype(jnp.int32)
        want2, _ = ours(nxt, wcache)

        mbp, store = to_mbp(ours, max_device_entries=8, device=_cpu())
        cache = mbp.init_cache(1, 16, jnp.float32)
        got, cache = mbp_forward(mbp, ids, cache)
        got2, _ = mbp_forward(mbp, nxt, cache)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), rtol=2e-4, atol=2e-5)
    assert store.hits > 0


def test_to_mbp_quantized_experts_dequantize(tmp_path):
    """to_mbp on a QuantMoEMLP model dequantizes the int8 expert stacks into
    the host store (scales folded per out-channel) — MBP output matches the
    resident quantized model instead of streaming raw unscaled integers."""
    import torch
    import transformers

    from mllm_tpu.models.moe import MBPMoEMLP, QuantMoEMLP, to_mbp
    from mllm_tpu.models.registry import auto_model
    from mllm_tpu.ops.quantize_model import quantize_model

    torch.manual_seed(1)
    cfg = transformers.MixtralConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
        num_local_experts=4, num_experts_per_tok=2, rope_theta=10000.0,
    )
    transformers.MixtralForCausalLM(cfg).eval().save_pretrained(tmp_path / "m")
    with jax.default_device(_cpu()):
        ours, _, _ = auto_model(str(tmp_path / "m"), dtype=jnp.float32,
                                with_tokenizer=False)
        ours = quantize_model(ours, "int8", min_size=1, quant_embed_head=False)
        assert any(isinstance(b.mlp, QuantMoEMLP) for b in ours.blocks)
        ids = jnp.asarray([[3, 17, 42, 99, 7, 23, 56, 11]], jnp.int32)
        want, _ = ours(ids, ours.init_cache(1, 32, jnp.float32), last_only=False)

        mbp, store = to_mbp(ours, max_device_entries=8, device=_cpu())
        assert all(isinstance(b.mlp, MBPMoEMLP) for b in mbp.blocks)
        # host store holds dequantized float experts, not raw int8
        some = next(iter(store.host.values()))
        assert all(np.issubdtype(np.asarray(w).dtype, np.floating) for w in some)
        got, _ = mbp(ids, mbp.init_cache(1, 32, jnp.float32), last_only=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
