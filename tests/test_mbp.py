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
