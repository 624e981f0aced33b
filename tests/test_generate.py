"""Generation-loop semantics: greedy parity, samplers, batched + compiled loops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mllm_tpu.core.config import TextConfig
from mllm_tpu.generation.generate import batched_generate, generate, generate_compiled, pad_to_bucket
from mllm_tpu.generation.sampling import SamplingConfig, greedy, sample_top_k, sample_top_p
from mllm_tpu.models.transformer import CausalLM


@pytest.fixture(scope="module")
def tiny_model():
    cfg = TextConfig(
        vocab_size=97, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, max_position_embeddings=128,
        eos_token_id=96, rope_theta=10000.0,
    )
    return CausalLM.init(jax.random.PRNGKey(7), cfg)


def test_pad_to_bucket():
    ids = np.ones((1, 5), np.int32)
    assert pad_to_bucket(ids, 16).shape == (1, 16)
    assert pad_to_bucket(np.ones((1, 16), np.int32), 16).shape == (1, 16)
    assert pad_to_bucket(np.ones((1, 17), np.int32), 16).shape == (1, 32)


def test_greedy_generate_matches_full_forward(tiny_model):
    model = tiny_model
    ids = np.array([[5, 9, 2, 7]], np.int32)
    cache = model.init_cache(1, 64, jnp.float32)
    res, _ = generate(model, ids, cache, SamplingConfig(max_new_tokens=6), bucket=8)
    assert len(res.tokens) <= 6

    # oracle: repeatedly run the full sequence through a fresh cache
    seq = list(ids[0])
    for t_expected in res.tokens:
        cache2 = model.init_cache(1, 64, jnp.float32)
        lg, _ = model(jnp.asarray([seq], jnp.int32), cache2, last_only=True)
        t = int(np.argmax(np.asarray(lg)[0, 0]))
        assert t == t_expected
        seq.append(t)


def test_generate_compiled_matches_python_loop(tiny_model):
    model = tiny_model
    ids = np.array([[5, 9, 2, 7]], np.int32)
    cache = model.init_cache(1, 64, jnp.float32)
    res, _ = generate(model, ids, cache, SamplingConfig(max_new_tokens=6), bucket=8)

    padded = jnp.asarray(pad_to_bucket(ids, 8))
    cache2 = model.init_cache(1, 64, jnp.float32)
    toks, n = generate_compiled(model, padded, cache2, 4, 6, SamplingConfig(max_new_tokens=6),
                                eos_token_id=96)
    toks = np.asarray(toks)[: int(n)].tolist()
    assert toks == res.tokens


def test_batched_generate(tiny_model):
    model = tiny_model
    ids = np.array([[5, 9, 2, 7], [1, 1, 3, 4]], np.int32)
    cache = model.init_cache(2, 64, jnp.float32)
    out, _ = batched_generate(model, ids, np.array([4, 4]), cache, SamplingConfig(max_new_tokens=5))
    assert out.shape[0] == 2 and out.shape[1] <= 5
    # row 0 must equal the single-prompt result
    cache1 = model.init_cache(1, 64, jnp.float32)
    res, _ = generate(model, ids[:1], cache1, SamplingConfig(max_new_tokens=5), bucket=4)
    np.testing.assert_array_equal(out[0, : len(res.tokens)], res.tokens)


def test_eos_stops(tiny_model):
    model = tiny_model
    ids = np.array([[5, 9, 2, 7]], np.int32)
    cache = model.init_cache(1, 64, jnp.float32)
    # every token is eos -> stop after the first
    res, _ = generate(model, ids, cache, SamplingConfig(max_new_tokens=10),
                      eos_token_id=set(range(97)), bucket=8)
    assert len(res.tokens) == 1


def test_callback_streaming(tiny_model):
    model = tiny_model
    seen = []
    ids = np.array([[5, 9, 2, 7]], np.int32)
    cache = model.init_cache(1, 64, jnp.float32)
    res, _ = generate(model, ids, cache, SamplingConfig(max_new_tokens=4),
                      callback=lambda t: (seen.append(t), True)[1], bucket=8)
    assert seen == res.tokens


def test_samplers_shapes_and_determinism():
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray(np.random.default_rng(0).standard_normal((2, 50)).astype(np.float32))
    g = greedy(logits)
    assert g.shape == (2,)
    tk = sample_top_k(key, logits, 5, 0.8)
    tp = sample_top_p(key, logits, 0.9, 0.8)
    assert tk.shape == (2,) and tp.shape == (2,)
    # top-k=1 == greedy regardless of temperature
    np.testing.assert_array_equal(np.asarray(sample_top_k(key, logits, 1, 5.0)), np.asarray(g))
    # top-p -> tiny p keeps only the argmax
    np.testing.assert_array_equal(np.asarray(sample_top_p(key, logits, 1e-6, 1.0)), np.asarray(g))


def test_ragged_batched_generate(tiny_model):
    """Left-padded ragged batching must match per-sequence greedy decoding."""
    from mllm_tpu.generation.generate import ragged_batched_generate

    model = tiny_model
    prompts = [np.array([5, 9, 2, 7], np.int32),
               np.array([1, 3], np.int32),
               np.array([8, 8, 8, 8, 8, 8], np.int32)]
    cache = model.init_cache(3, 64, jnp.float32)
    toks, n_valid, _ = ragged_batched_generate(
        model, prompts, cache, SamplingConfig(max_new_tokens=6))

    for i, p in enumerate(prompts):
        c1 = model.init_cache(1, 64, jnp.float32)
        res, _ = generate(model, p[None], c1, SamplingConfig(max_new_tokens=6),
                          eos_token_id={-1}, bucket=4)
        np.testing.assert_array_equal(toks[i, : len(res.tokens)], res.tokens,
                                      err_msg=f"seq {i}")


def test_sample_token_topk_topp_matches_batched():
    """SamplingConfig with BOTH top_k and top_p set samples from the same
    (intersected) distribution in the offline path (sample_token) as in the
    serving path (sample_tokens_batched) — regression: sample_token used to
    silently ignore top_p whenever top_k was set."""
    from mllm_tpu.generation.sampling import sample_token, sample_tokens_batched

    rng = np.random.default_rng(11)
    logits = jnp.asarray(rng.standard_normal((1, 64)) * 3, jnp.float32)
    cfg = SamplingConfig(do_sample=True, temperature=0.9, top_k=10, top_p=0.5)
    for seed in range(8):
        key = jax.random.PRNGKey(seed)
        a = sample_token(jax.random.fold_in(key, 0), logits, cfg)
        b = sample_tokens_batched(key, logits, jnp.asarray([0.9]),
                                  jnp.asarray([10]), jnp.asarray([0.5]))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the intersection actually bites: p small enough to exclude some
    # of the top-k set means the sampled token must come from the nucleus
    cfg_tight = SamplingConfig(do_sample=True, temperature=1.0, top_k=64, top_p=1e-6)
    toks = {int(sample_token(jax.random.PRNGKey(s), logits, cfg_tight)[0])
            for s in range(16)}
    assert toks == {int(np.argmax(np.asarray(logits)))}
