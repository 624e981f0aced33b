#!/usr/bin/env python
"""Rotation-assisted quantization (QuaRot/SpinQuant-lite).

Counterpart of /root/reference/tools/rotate/ (rotation_utils.py, used by the
NPU INT8 pipeline, backends/qnn/README.md:44-52): orthogonal rotations spread
activation/weight outliers across channels so low-bit quantization loses less.

This implements the *exactness-preserving* subset on the v->o pair: attention
output is linear in V, so rotating each head's value space by an orthogonal R
(v_proj rows by R, o_proj columns by R^T) leaves the model function IDENTICAL
in fp while flattening per-channel outliers before int8/int4 quantization.

  python tools/rotate.py --check          # exactness + outlier-metric demo
API: rotate_vo(model, seed) -> model'  (fp-equivalent, quantization-friendlier)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def hadamard(n: int) -> np.ndarray:
    """Sylvester Hadamard matrix (n must be a power of 2), orthonormalized."""
    assert n & (n - 1) == 0, "n must be a power of two"
    h = np.array([[1.0]])
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return (h / np.sqrt(n)).astype(np.float32)


def random_orthogonal(n: int, seed: int = 0) -> np.ndarray:
    """Haar-random orthogonal matrix (QR of gaussian)."""
    rng = np.random.default_rng(seed)
    q, r = np.linalg.qr(rng.standard_normal((n, n)))
    return (q * np.sign(np.diag(r))).astype(np.float32)


def rotation_for(head_dim: int, mode: str = "hadamard", seed: int = 0) -> np.ndarray:
    if mode == "hadamard" and head_dim & (head_dim - 1) == 0:
        # randomized Hadamard: diag(+-1) @ H — cheap and effective (QuaRot)
        rng = np.random.default_rng(seed)
        signs = rng.choice([-1.0, 1.0], head_dim).astype(np.float32)
        return hadamard(head_dim) * signs[None, :]
    return random_orthogonal(head_dim, seed)


def rotate_vo(model, mode: str = "hadamard", seed: int = 0):
    """Rotate each layer's V/O head spaces: function-preserving in fp."""
    import jax.numpy as jnp

    cfg = model.cfg
    hkv, h, hd = cfg.num_key_value_heads, cfg.num_attention_heads, cfg.head_dim_
    n_rep = h // hkv
    new_blocks = []
    for li, blk in enumerate(model.blocks):
        attn = blk.attn
        r = rotation_for(hd, mode, seed + li)  # [hd, hd]
        wv = np.asarray(attn.v_proj.weight, np.float32).reshape(hkv, hd, -1)
        wv2 = np.einsum("de,hek->hdk", r, wv).reshape(hkv * hd, -1)
        wo = np.asarray(attn.o_proj.weight, np.float32).reshape(-1, h, hd)
        wo2 = np.einsum("khd,ed->khe", wo, r).reshape(wo.shape[0], h * hd)
        v_bias = attn.v_proj.bias
        if v_bias is not None:
            vb = np.asarray(v_bias, np.float32).reshape(hkv, hd)
            v_bias = jnp.asarray((vb @ r.T), np.asarray(v_bias).dtype).reshape(-1)
        dtype = attn.v_proj.weight.dtype
        new_attn = attn.replace(
            v_proj=attn.v_proj.replace(weight=jnp.asarray(wv2, dtype), bias=v_bias),
            o_proj=attn.o_proj.replace(weight=jnp.asarray(wo2, dtype)),
        )
        new_blocks.append(blk.replace(attn=new_attn))
    from mllm_tpu.nn.module import ModuleList

    return model.replace(blocks=ModuleList(new_blocks))


def outlier_metric(w: np.ndarray) -> float:
    """max|w| / rms — lower is friendlier to symmetric quantization."""
    return float(np.max(np.abs(w)) / (np.sqrt(np.mean(w**2)) + 1e-12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    if not args.check:
        ap.print_help()
        return
    import jax, jax.numpy as jnp
    from mllm_tpu.core.config import TextConfig
    from mllm_tpu.models.transformer import CausalLM

    cfg = TextConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                     head_dim=16, max_position_embeddings=64, eos_token_id=63)
    model = CausalLM.init(jax.random.PRNGKey(0), cfg)
    rotated = rotate_vo(model)
    ids = jnp.asarray(np.arange(1, 9)[None], jnp.int32)
    c1 = model.init_cache(1, 16, jnp.float32)
    c2 = rotated.init_cache(1, 16, jnp.float32)
    a, _ = model(ids, c1, last_only=False)
    b, _ = rotated(ids, c2, last_only=False)
    print("max fp diff after rotation:", float(jnp.max(jnp.abs(a - b))))
    w0 = np.asarray(model.blocks[0].attn.v_proj.weight)
    w1 = np.asarray(rotated.blocks[0].attn.v_proj.weight)
    print(f"v_proj outlier metric: {outlier_metric(w0):.2f} -> {outlier_metric(w1):.2f}")


if __name__ == "__main__":
    main()
