"""Layer-level golden tests vs PyTorch (the reference's CPUXxxTest.py pattern,
/root/reference/test/cpu/ — torch as framework-of-record)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from mllm_tpu.nn.layers import (
    Conv2d,
    Embedding,
    LayerNorm,
    Linear,
    RMSNorm,
    RotaryEmbedding,
    silu,
)


def test_linear_vs_torch():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((16, 8)).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    x = rng.standard_normal((2, 3, 8)).astype(np.float32)
    ours = Linear(jnp.asarray(w), jnp.asarray(b))(jnp.asarray(x))
    theirs = torch.nn.functional.linear(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-5)


def test_rmsnorm_vs_torch():
    rng = np.random.default_rng(1)
    w = rng.standard_normal(32).astype(np.float32)
    x = rng.standard_normal((2, 5, 32)).astype(np.float32)
    ours = RMSNorm(jnp.asarray(w), eps=1e-6)(jnp.asarray(x))
    xt = torch.from_numpy(x)
    theirs = xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-6) * torch.from_numpy(w)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-5)


def test_layernorm_vs_torch():
    rng = np.random.default_rng(2)
    w = rng.standard_normal(32).astype(np.float32)
    b = rng.standard_normal(32).astype(np.float32)
    x = rng.standard_normal((4, 32)).astype(np.float32)
    ours = LayerNorm(jnp.asarray(w), jnp.asarray(b), eps=1e-5)(jnp.asarray(x))
    theirs = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (32,), torch.from_numpy(w), torch.from_numpy(b), eps=1e-5
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-5)


def test_rope_hf_vs_torch_formula():
    """HF (GPT-NeoX) rotate-half convention, as in transformers' LlamaRotaryEmbedding."""
    D, S, H = 64, 7, 2
    rope = RotaryEmbedding.make(D, max_position=128, theta=10000.0, style="hf")
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, S, H, D)).astype(np.float32)
    pos = np.arange(3, 3 + S, dtype=np.int32)[None, :]
    ours = np.asarray(rope(jnp.asarray(x), jnp.asarray(pos)))

    inv = 1.0 / (10000.0 ** (np.arange(0, D, 2) / D))
    t = pos[0].astype(np.float64)
    freqs = np.outer(t, inv)  # [S, D/2]
    emb_cos = np.cos(np.concatenate([freqs, freqs], axis=-1))  # [S, D]
    emb_sin = np.sin(np.concatenate([freqs, freqs], axis=-1))
    xt = torch.from_numpy(x)

    def rotate_half(v):
        return torch.cat([-v[..., D // 2 :], v[..., : D // 2]], dim=-1)

    cos = torch.from_numpy(emb_cos.astype(np.float32))[None, :, None, :]
    sin = torch.from_numpy(emb_sin.astype(np.float32))[None, :, None, :]
    theirs = xt * cos + rotate_half(xt) * sin
    np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-4, atol=1e-5)


def test_rope_llama_interleaved():
    """Interleaved-pair convention (reference RoPEType::LLAMAROPE)."""
    D = 8
    rope = RotaryEmbedding.make(D, max_position=16, style="llama")
    x = np.zeros((1, 1, 1, D), np.float32)
    x[..., 0] = 1.0  # pair (0,1) rotates by theta = pos * inv_freq[0]
    pos = np.array([[2]], np.int32)
    out = np.asarray(rope(jnp.asarray(x), jnp.asarray(pos)))[0, 0, 0]
    assert abs(out[0] - np.cos(2.0)) < 1e-5
    assert abs(out[1] - np.sin(2.0)) < 1e-5


def test_partial_rotary():
    D = 16
    rope = RotaryEmbedding.make(D, max_position=16, style="hf", partial=0.5)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 2, 1, D)).astype(np.float32)
    out = np.asarray(rope(jnp.asarray(x), jnp.asarray(np.array([[5, 6]], np.int32))))
    # pass-through half untouched
    np.testing.assert_array_equal(out[..., 8:], x[..., 8:])
    assert not np.allclose(out[..., :8], x[..., :8])


def test_conv2d_vs_torch():
    rng = np.random.default_rng(5)
    w = rng.standard_normal((6, 3, 4, 4)).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)
    x = rng.standard_normal((1, 12, 12, 3)).astype(np.float32)
    ours = Conv2d(jnp.asarray(w), jnp.asarray(b), (4, 4))(jnp.asarray(x))
    theirs = torch.nn.functional.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w), torch.from_numpy(b), stride=4
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-3, atol=1e-4)


def test_embedding():
    rng = np.random.default_rng(6)
    w = rng.standard_normal((10, 4)).astype(np.float32)
    e = Embedding(jnp.asarray(w))
    out = np.asarray(e(jnp.asarray(np.array([[1, 3], [0, 9]]))))
    np.testing.assert_array_equal(out, w[np.array([[1, 3], [0, 9]])])


def test_silu_vs_torch():
    x = np.linspace(-4, 4, 64, dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(silu(jnp.asarray(x))),
        torch.nn.functional.silu(torch.from_numpy(x)).numpy(),
        rtol=1e-5, atol=1e-6,
    )
