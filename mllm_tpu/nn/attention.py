"""Attention: the TPU-native replacement for the reference's eager-softmax
path and its CPU FlashAttention-2 / SageAttention kernels
(/root/reference/mllm/models/transformer/modeling_transformer.hpp:132-212,
 backends/cpu/compute/FlashAttention2.hpp).

Layouts: q is [B, Sq, H, D]; k/v are in *cache layout* [B, H_kv, Skv, D]
(see kv/cache.py — sequence inner for contiguous HBM streaming).

Three tiers:
  - `sdpa`            : plain XLA attention (einsum + softmax); always correct,
                        used for tests, odd shapes and CPU runs.
  - Pallas flash      : mllm_tpu/ops/flash_attention.py — tiled online-softmax
                        prefill kernel (causal / sliding-window).
  - Pallas decode     : mllm_tpu/ops/decode_attention.py — fused single-token
                        attention over the KV cache.
`attend` dispatches between them based on shapes/platform/config.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .layers import NEG_INF


def repeat_kv_cache_layout(x: jax.Array, n_rep: int) -> jax.Array:
    """[B, H_kv, S, D] -> [B, H_kv*n_rep, S, D] (GQA broadcast)."""
    if n_rep == 1:
        return x
    b, h, s, d = x.shape
    return jnp.broadcast_to(x[:, :, None], (b, h, n_rep, s, d)).reshape(b, h * n_rep, s, d)


def sdpa(
    q: jax.Array,  # [B, Sq, H, D]
    k: jax.Array,  # [B, H_kv, Skv, D]
    v: jax.Array,  # [B, H_kv, Skv, D]
    *,
    q_offset=0,  # absolute position of q[0] (traced ok)
    kv_valid_len=None,  # number of valid kv entries (traced ok); None = all
    kv_start=None,  # [B] first valid kv index per sequence (left-padding)
    causal: bool = True,
    window: Optional[int] = None,
    bias: Optional[jax.Array] = None,  # additive bias [..., Sq, Skv] (tree mask etc.)
    scale: Optional[float] = None,
    logit_softcap: Optional[float] = None,
) -> jax.Array:
    """Masked scaled-dot-product attention with f32 softmax statistics."""
    b, sq, h, d = q.shape
    hkv = k.shape[1]
    n_rep = h // hkv
    k = repeat_kv_cache_layout(k, n_rep)
    v = repeat_kv_cache_layout(v, n_rep)
    if scale is None:
        scale = d**-0.5

    logits = jnp.einsum("bqhd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if logit_softcap is not None:
        logits = jnp.tanh(logits / logit_softcap) * logit_softcap

    skv = k.shape[2]
    # q_offset / kv_valid_len may be scalars or per-sequence [B] vectors
    # (per-slot continuous batching) — normalize to [B?, 1, 1] broadcasting
    qo = jnp.reshape(jnp.asarray(q_offset), (-1, 1))  # [1 or B, 1]
    k_pos = jnp.arange(skv)
    ok = jnp.ones((1, sq, skv), dtype=bool)
    if causal:
        q_pos = qo + jnp.arange(sq)[None, :]  # [1 or B, sq]
        ok = k_pos[None, None, :] <= q_pos[:, :, None]
        if window is not None:
            ok = ok & (k_pos[None, None, :] > q_pos[:, :, None] - window)
    if kv_valid_len is not None:
        kvl = jnp.reshape(jnp.asarray(kv_valid_len), (-1, 1, 1))
        ok = ok & (k_pos[None, None, :] < kvl)
    ok = jnp.broadcast_to(ok[:, None], logits.shape)
    if kv_start is not None:  # left-padded batches: mask the pad prefix
        ok = ok & (jnp.arange(skv)[None, None, None, :] >= kv_start[:, None, None, None])
    logits = jnp.where(ok, logits, NEG_INF)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)

    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bqhd", probs, v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def attend_padded_head(q, k, v, *, causal=False, scale=None, pad_to: int = 128):
    """Attention for head dims that miss the 128-lane requirement (e.g. ViT's
    80): zero-pad q/k/v to `pad_to` lanes (scores unchanged with the explicit
    original-dim scale), run the flash kernel, crop the output.

    q: [B, Sq, H, D]; k/v cache layout [B, H_kv, Skv, D].
    """
    from ..utils.runtime import on_tpu as _on_tpu

    d = q.shape[-1]
    s, skv = q.shape[1], k.shape[2]
    if scale is None:
        scale = d**-0.5
    if not _on_tpu() or causal:
        return sdpa(q, k, v, causal=causal, scale=scale)
    from ..ops.flash_attention import flash_attention

    pad_d = (-d) % pad_to
    pad_s = (-s) % 128
    pad_skv = (-skv) % 128
    qp = jnp.pad(q, ((0, 0), (0, pad_s), (0, 0), (0, pad_d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad_skv), (0, pad_d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad_skv), (0, pad_d)))
    # one k block covering the whole (padded) kv axis: the kernel takes its
    # one-shot softmax path (no online-softmax rescale traffic) — measured
    # fastest for dense vision attention at S ~ 1.5-4k.
    out = flash_attention(qp, kp, vp, causal=False, kv_valid_len=skv, scale=scale,
                          block_q=256, block_k=min(skv + pad_skv, 2048))
    return out[:, :s, :, :d]


def attend_from_cache(
    q, cache, layer_idx, *, q_offset=0, kv_valid_len=None, kv_start=None,
    causal=True, window=None, bias=None, scale=None, logit_softcap=None,
):
    """Attention reading K/V straight from the cache object.

    For QuantKVCache on the TPU decode path this streams int8 K/V + scales
    through the fused quant kernel (the SageAttention-KVQ8 counterpart) —
    never materializing a dequantized max_len cache.  Everything else
    dequantizes the layer once and takes the standard `attend` dispatch."""
    from ..kv.cache import PagedKVCache, Quant4KVCache, QuantKVCache, SlotQuantKVCache
    from ..utils.runtime import on_tpu as _on_tpu

    if isinstance(cache, PagedKVCache):
        sq, d = q.shape[1], q.shape[3]
        if (_on_tpu() and sq == 1 and d % 128 == 0 and bias is None
                and logit_softcap is None and kv_start is None):
            from ..ops.decode_attention import decode_attention_paged

            return decode_attention_paged(
                q, cache.k[layer_idx], cache.v[layer_idx], cache.table,
                kv_valid_len=kv_valid_len, scale=scale, window=window)
        # fallback (CPU tests / odd shapes): gather a dense view per layer
    if isinstance(cache, (QuantKVCache, Quant4KVCache, SlotQuantKVCache)):
        sq, d = q.shape[1], q.shape[3]
        if (_on_tpu() and sq == 1 and d % 128 == 0 and cache.max_len % 128 == 0
                and bias is None and logit_softcap is None):
            from ..ops.decode_attention import decode_attention_quant

            kq, vq, ks, vs = cache.layer_quant(layer_idx)
            return decode_attention_quant(
                q, kq, vq, ks, vs, kv_valid_len=kv_valid_len, kv_start=kv_start,
                scale=scale, window=window,
            )
        scalar_valid = kv_valid_len is None or getattr(kv_valid_len, "ndim", 0) == 0
        if (_on_tpu() and sq > 1 and sq % 128 == 0 and d % 128 == 0
                and cache.max_len % 128 == 0 and bias is None
                and logit_softcap is None and scalar_valid):
            # chunked prefill over the int8 cache: stream int8 + scales
            # through the Sage-style flash kernel — never materialize a
            # dequantized max_len cache
            from ..ops.flash_attention import flash_attention_quant

            kq, vq, ks, vs = cache.layer_quant(layer_idx)
            return flash_attention_quant(
                q, kq, vq, ks, vs, q_offset=q_offset, kv_valid_len=kv_valid_len,
                kv_start=kv_start, causal=causal, window=window, scale=scale,
            )
    k_full, v_full = cache.layer(layer_idx)
    return attend(
        q, k_full, v_full, q_offset=q_offset, kv_valid_len=kv_valid_len,
        kv_start=kv_start, causal=causal, window=window, bias=bias, scale=scale,
        logit_softcap=logit_softcap,
    )


def attend(
    q, k, v, *, q_offset=0, kv_valid_len=None, kv_start=None, causal=True, window=None,
    bias=None, scale=None, logit_softcap=None, impl: str = "auto",
):
    """Dispatch between XLA sdpa and the Pallas kernels.

    impl: 'auto' | 'xla' | 'flash' | 'decode'
    """
    import os

    from ..utils.runtime import on_tpu as _on_tpu

    sq, d = q.shape[1], q.shape[3]
    vector_valid = kv_valid_len is not None and getattr(kv_valid_len, "ndim", 0) == 1
    if impl == "auto":
        on_tpu = _on_tpu()
        if (not on_tpu or bias is not None or logit_softcap is not None
                or d % 128 != 0 or (vector_valid and sq != 1)):
            impl = "xla"  # per-seq valid lens: only the decode kernel supports them
        elif sq == 1:
            # The HBM-resident Pallas decode kernel early-exits at the valid
            # cache length: 3-8.5x faster than XLA's full-padded-sweep
            # attention at batch (B=8: 5.2 vs 15.6 ms/step @ smax 2048, 7.2 vs
            # 61 @ smax 8192).  At B=1 with a short cache, XLA's fused sweep
            # wins slightly (463 vs 403 tok/s on the 2B int8 single stream),
            # so the kernel engages for batch>1 or long caches.
            # MLLM_DECODE_KERNEL=pallas|xla overrides.
            forced = os.environ.get("MLLM_DECODE_KERNEL")
            if forced in ("pallas", "xla"):
                impl = "decode" if forced == "pallas" else "xla"
            else:
                b_, skv_ = q.shape[0], k.shape[2]
                # kernel requires 128-aligned cache length (clamped final DMA)
                ok_len = skv_ % 128 == 0
                impl = "decode" if (ok_len and (b_ > 1 or skv_ > 2048)) else "xla"
        elif sq % 128 == 0:
            impl = "flash"
        else:
            impl = "xla"
    if impl == "flash":
        from ..ops.flash_attention import flash_attention

        return flash_attention(
            q, k, v, q_offset=q_offset, kv_valid_len=kv_valid_len, kv_start=kv_start,
            causal=causal, window=window, scale=scale,
        )
    if impl == "decode":
        from ..ops.decode_attention import decode_attention

        return decode_attention(q, k, v, kv_valid_len=kv_valid_len, kv_start=kv_start,
                                scale=scale, window=window)
    return sdpa(
        q, k, v, q_offset=q_offset, kv_valid_len=kv_valid_len, kv_start=kv_start,
        causal=causal, window=window, bias=bias, scale=scale, logit_softcap=logit_softcap,
    )
