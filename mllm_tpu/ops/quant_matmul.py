"""Pallas TPU quantized matmul kernels.

TPU-native replacement for the reference's quantized GEMM stack
(/root/reference/mllm/backends/cpu/compute/Matmul.cpp:31-158 dispatching to
ggml vec_dot / llamafile sgemm / KleidiAI).  Instead of translating the ggml
block microkernels, weights are repacked once at load time into MXU-friendly
k-major layouts:

  int8 layout: values int8 [K, N], scales f32 [N]      (per-out-channel symmetric)
  int4 layout: packed uint8 [K/2, N] — row j holds k=j in the low nibble and
               k=j+K/2 in the high nibble ("planar" packing, so unpacking is
               two contiguous k-slabs, no interleave);
               scales f32 [K/G, N] per (group, out-channel), optional zeros
               f32 [K/G, N] for asymmetric k-quants (value = q*scale + zero;
               symmetric: value = (q-8)*scale).

The win is HBM bandwidth: decode GEMV is weight-bandwidth-bound, so int8/int4
weights stream 2x/4x faster than bf16.  Kernels unpack to bf16 in VMEM right
next to the MXU and accumulate in f32.  Group scales are expanded along the
*sublane* axis (broadcast + reshape), which Mosaic lowers natively.

ggml block formats map losslessly:
  Q4_0 -> int4 (G=32, symmetric)        Q4_K -> int4 (G=32, asymmetric)
  Q8_0 -> int8 (per-row renormalized)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import dtypes as _dt


def _use_pallas() -> bool:
    from ..utils.runtime import on_tpu

    return on_tpu()


def _int8_impl() -> str:
    """'pallas' (default) or 'xla' — XLA reads int8 natively via a fused
    convert-into-dot; useful to A/B against the Pallas kernel."""
    import os

    return os.environ.get("MLLM_INT8_IMPL", "xla")


def int4_impl() -> str:
    """'xla' (default): n-axis s4 layout, whole decode step one XLA graph.
    'pallas': canonical planar layout + group-partial kernel (wins per-GEMV
    but custom-call boundaries cost cross-op prefetch at model level)."""
    import os

    return os.environ.get("MLLM_INT4_IMPL", "xla")


# ---------------------------------------------------------------------------
# int8: y = x @ w  with w int8 [K, N] * scales[N]
# ---------------------------------------------------------------------------


def _int8_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # (BM, BK) bf16
    w = w_ref[:]  # (BK, BN) int8
    acc_ref[:] += jax.lax.dot_general(
        x, w.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == nk - 1)
    def _():
        o_ref[:] = acc_ref[:] * s_ref[:]  # (BM, BN) * (1, BN)


def int8_matmul(x: jax.Array, qweight_t: jax.Array, scales: jax.Array,
                *, block_m: int = 256, block_n: int = 512, block_k: int = 512,
                interpret: bool = False) -> jax.Array:
    """y[..., N] = x[..., K] @ (qweight_t[K, N] * scales[None, :]) — f32 out.

    interpret=True runs the Pallas kernel in interpreter mode on any backend
    (CI coverage of the kernel path without a chip)."""
    orig_shape = x.shape
    k, n = qweight_t.shape
    x2 = x.reshape(-1, k)
    m = x2.shape[0]

    if not _use_pallas() and not interpret:  # portable f32 path (CPU / tests)
        y = jax.lax.dot_general(
            x2.astype(jnp.float32), qweight_t.astype(jnp.float32),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ) * scales[None, :]
        return y.reshape(*orig_shape[:-1], n)
    if _int8_impl() == "xla" and not interpret:
        # per-out-channel scales commute past the contraction: let XLA fuse the
        # int8->bf16 convert into the dot read and scale the (small) output.
        # Beats the Pallas kernel at model level (463 vs 312 tok/s on the 2B
        # decode) thanks to XLA's cross-op DMA scheduling.
        y = jax.lax.dot_general(
            x2.astype(jnp.bfloat16), qweight_t.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ) * scales[None, :]
        return y.reshape(*orig_shape[:-1], n)

    bm = min(block_m, m)
    bn = min(block_n, n)
    bk = min(block_k, k)
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), pl.cdiv(k, bk))
    y = pl.pallas_call(
        _int8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda im, jn, ik: (im, ik), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda im, jn, ik: (ik, jn), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda im, jn, ik: (0, jn), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda im, jn, ik: (im, jn), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(x2.astype(jnp.bfloat16), qweight_t, scales.reshape(1, n))
    return y.reshape(*orig_shape[:-1], n)


def int8_matmul_a8(x: jax.Array, qweight_t: jax.Array, scales: jax.Array) -> jax.Array:
    """W8A8: dynamic per-token symmetric int8 activations x static int8
    weights, s8 x s8 -> s32 on the MXU's double-rate int8 path.

    The reference runs exactly this scheme on its NPU prefill backend
    (QNN A8W8, SURVEY.md §2.3 / demo_qwen_npu.cpp hybrid prefill); on a
    v5e the int8 systolic path measures 282 TOP/s vs 165 TFLOP/s for the
    bf16 dot (1.71x), so quantizing activations at prefill shape converts
    the weight-only int8 model's MXU-bound prefill into ~1.7x.

    Per-token scale = amax/127 (f32); the dequant rescale fuses into the
    (small) f32 output.  int32 accumulation is exact: k*127^2 < 2^31 for
    every k in the model zoo (k <= ~130k).  Pure XLA — runs identically on
    CPU for tests."""
    orig_shape = x.shape
    k, n = qweight_t.shape
    x2 = x.reshape(-1, k).astype(jnp.float32)
    amax = jnp.max(jnp.abs(x2), axis=-1, keepdims=True)
    xs = jnp.where(amax > 0, amax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(x2 / xs), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, qweight_t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * xs * scales[None, :]
    return y.reshape(*orig_shape[:-1], n)


# ---------------------------------------------------------------------------
# int4 planar: y = x @ dequant(packed)  — see module docstring for layout
# ---------------------------------------------------------------------------


def _expand_groups(s, group):
    """(NG, BN) -> (NG*group, BN): repeat each sublane row `group` times."""
    ng, bn = s.shape
    return jnp.broadcast_to(s[:, None, :], (ng, group, bn)).reshape(ng * group, bn)


def _int4_gb_kernel(x_lo_ref, x_hi_ref, p_ref, s_lo_ref, s_hi_ref,
                    z_lo_ref, z_hi_ref, o_ref, acc_ref, *, group):
    """Group-partial int4 GEMV/GEMM kernel.

    Per-weight work is nibble unpack ONLY (2 int ops + 1 convert): scales and
    zero-points are applied to per-32-group PARTIAL SUMS, using

        y += sum_g  s[g,n] * (x_g . q_g)  +  z[g,n] * (x_g . 1)

    where q are the raw excess-8 / Q4_K nibbles (0..15).  This is what makes
    int4 decode faster than int8 on the chip (13.2 us vs 16.1 us on the
    flagship's [8,1536]x[1536,8960], ideal 8.5): the earlier per-weight
    dequant (`w = (nib-8)*s` over the whole block) was VPU-bound at ~2.3x
    that.  Replaces the ggml vec_dot int4 microkernels
    (/root/reference/mllm/backends/cpu/third_party/ggml/VecDotQ4.cpp) with an
    MXU/VPU split instead of NEON horizontal adds."""
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p32 = p_ref[:].astype(jnp.int32)
    lo = (p32 & 0x0F).astype(jnp.bfloat16)  # [bj, bn] raw nibbles 0..15
    hi = (p32 >> 4).astype(jnp.bfloat16)
    bj, bn = lo.shape
    ngb = bj // group
    xl = x_lo_ref[:]
    xh = x_hi_ref[:]
    acc = jnp.zeros_like(acc_ref)
    for g in range(ngb):  # static unroll: ngb = bj/32 (24 at bj=768)
        sl = slice(g * group, (g + 1) * group)
        p_lo = jax.lax.dot_general(xl[:, sl], lo[sl, :], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        p_hi = jax.lax.dot_general(xh[:, sl], hi[sl, :], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        xs_l = jnp.sum(xl[:, sl], axis=1, keepdims=True).astype(jnp.float32)
        xs_h = jnp.sum(xh[:, sl], axis=1, keepdims=True).astype(jnp.float32)
        acc = (acc + p_lo * s_lo_ref[g:g + 1, :] + xs_l * z_lo_ref[g:g + 1, :]
               + p_hi * s_hi_ref[g:g + 1, :] + xs_h * z_hi_ref[g:g + 1, :])
    acc_ref[:] += acc

    @pl.when(ik == nk - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _int4_gb_kernel_sym(x_lo_ref, x_hi_ref, p_ref, s_lo_ref, s_hi_ref,
                        o_ref, acc_ref, *, group):
    """Symmetric variant of `_int4_gb_kernel`: zeros == -8*scales (always
    true for weights quantized from float — prepare_int4's excess-8 law),
    so the per-group zero term folds into the scale term,

        y += sum_g  s[g,n] * ((x_g . q_g) - 8 * (x_g . 1)),

    and the [2*khp/G, N] f32 zeros array is never stored or streamed —
    half the kernel's f32 side traffic (≈ scales-sized: 29 MB/step on the
    flagship lm_head alone)."""
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p32 = p_ref[:].astype(jnp.int32)
    lo = (p32 & 0x0F).astype(jnp.bfloat16)  # [bj, bn] raw nibbles 0..15
    hi = (p32 >> 4).astype(jnp.bfloat16)
    bj, bn = lo.shape
    ngb = bj // group
    xl = x_lo_ref[:]
    xh = x_hi_ref[:]
    acc = jnp.zeros_like(acc_ref)
    for g in range(ngb):
        sl = slice(g * group, (g + 1) * group)
        p_lo = jax.lax.dot_general(xl[:, sl], lo[sl, :], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        p_hi = jax.lax.dot_general(xh[:, sl], hi[sl, :], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        xs_l = jnp.sum(xl[:, sl], axis=1, keepdims=True).astype(jnp.float32)
        xs_h = jnp.sum(xh[:, sl], axis=1, keepdims=True).astype(jnp.float32)
        acc = (acc + (p_lo - 8.0 * xs_l) * s_lo_ref[g:g + 1, :]
               + (p_hi - 8.0 * xs_h) * s_hi_ref[g:g + 1, :])
    acc_ref[:] += acc

    @pl.when(ik == nk - 1)
    def _():
        o_ref[:] = acc_ref[:]


_INT4_BJ_CANDIDATES = (768, 512, 256)  # multiples of 8*G=256 (Mosaic sublane rule)


def _pick_int4_pad(khalf: int) -> tuple[int, int]:
    """(block_j, padded khalf): smallest padding first, then largest block."""
    best = None
    for bj in _INT4_BJ_CANDIDATES:
        khp = -(-khalf // bj) * bj
        if best is None or khp < best[1]:
            best = (bj, khp)
    return best


def prepare_int4(packed_t, scales_t, group: int = 32, zeros_t=None):
    """Legacy planar operands -> canonical kernel operands.

    In:  packed [K/2, N] planar (signed two's-complement nibbles when
         zeros_t is None, raw 0..15 Q4_K nibbles otherwise),
         scales/zeros f32 [K/G, N] (lo-half rows then hi-half rows).
    Out: (packed_e8 [khp, N] uint8, scales [2*khp/G, N], zeros [2*khp/G, N])
         with khp = K/2 padded to a kernel block multiple; padded region has
         zero scale/zero so it contributes nothing.  Signed nibbles become
         excess-8 (q^0x88) with zeros = -8*scales, unifying both layouts on
         the affine kernel.  Works on numpy (load time) or jnp (on-device
         quantization) arrays."""
    xp = jnp if isinstance(packed_t, jax.Array) else np
    *lead, kh, n = packed_t.shape
    lead = tuple(lead)  # stacked (lax.scan) models carry a leading layer axis
    if zeros_t is None:
        packed_t = (packed_t ^ 0x88).astype(xp.uint8)
        zeros_t = (-8.0 * scales_t).astype(xp.float32)
    bj, khp = _pick_int4_pad(kh)
    pad = khp - kh
    if pad:
        ng = kh // group
        zc = xp.zeros(lead + (pad // group, n), xp.float32)
        scales_t = xp.concatenate(
            [scales_t[..., :ng, :], zc, scales_t[..., ng:, :], zc], axis=-2)
        zeros_t = xp.concatenate(
            [zeros_t[..., :ng, :], zc, zeros_t[..., ng:, :], zc], axis=-2)
        packed_t = xp.concatenate(
            [packed_t, xp.zeros(lead + (pad, n), xp.uint8)], axis=-2)
    return packed_t, scales_t, zeros_t


def _pick_int4_bn(n: int, cap: int = 2048) -> int:
    """Largest divisor of n that is a multiple of 128 and <= cap (measured
    fastest at the largest such block: 1792 for N=8960)."""
    best = 128
    for d in range(128, cap + 1, 128):
        if n % d == 0:
            best = d
    return best if n % best == 0 else min(n, cap)


def int4_matmul(x: jax.Array, packed_e8: jax.Array, scales_p: jax.Array,
                group: int = 32, zeros_p: jax.Array = None,
                *, block_m: int = 256, block_n: int = 0, block_j: int = 0,
                interpret: bool = False) -> jax.Array:
    """y[..., N] = x[..., K] @ dequant(canonical int4 operands) — f32 out.

    Operands come from `prepare_int4` (packed_e8 [khp>=K/2, N] excess-8 /
    Q4_K nibbles; scales_p/zeros_p f32 [2*khp/G, N]).  Decode shapes
    (m <= 32) run the group-partial Pallas kernel; larger m (prefill) is
    MXU-bound, where dequant + XLA dot wins."""
    orig_shape = x.shape
    k = orig_shape[-1]
    khalf = k // 2
    khp, n = packed_e8.shape
    x2 = x.reshape(-1, k)
    m = x2.shape[0]

    if (not _use_pallas() and not interpret) or m > 32:
        w = dequant_int4_canonical(packed_e8, scales_p, zeros_p, group, k)
        y = x2.astype(jnp.float32) @ w
        return y.reshape(*orig_shape[:-1], n)

    bj = block_j or _pick_int4_pad(khalf)[0]
    if khp % bj:  # operands prepared with a different block quantum
        bj = next(b for b in _INT4_BJ_CANDIDATES if khp % b == 0)
    bn = block_n or _pick_int4_bn(n)
    bm = min(block_m, m)
    ngb = bj // group
    nhb = khp // bj
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), nhb)

    pad = khp - khalf
    xb = x2.astype(jnp.bfloat16)
    if pad:
        zeros_x = jnp.zeros((m, pad), xb.dtype)
        xb = jnp.concatenate([xb[:, :khalf], zeros_x, xb[:, khalf:], zeros_x], axis=1)

    specs = [
        # x lo slab: k = [jk*bj, jk*bj+bj)  in the padded-x layout
        pl.BlockSpec((bm, bj), lambda im, jn, jk: (im, jk), memory_space=pltpu.VMEM),
        # x hi slab: k = khp + [jk*bj, jk*bj+bj)
        pl.BlockSpec((bm, bj), lambda im, jn, jk: (im, jk + nhb),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bj, bn), lambda im, jn, jk: (jk, jn), memory_space=pltpu.VMEM),
        pl.BlockSpec((ngb, bn), lambda im, jn, jk: (jk, jn), memory_space=pltpu.VMEM),
        pl.BlockSpec((ngb, bn), lambda im, jn, jk: (jk + nhb, jn),
                     memory_space=pltpu.VMEM),
    ]
    operands = [xb, xb, packed_e8, scales_p, scales_p]
    if zeros_p is None:  # symmetric: zeros stream elided entirely
        kernel = functools.partial(_int4_gb_kernel_sym, group=group)
    else:
        kernel = functools.partial(_int4_gb_kernel, group=group)
        specs += [
            pl.BlockSpec((ngb, bn), lambda im, jn, jk: (jk, jn), memory_space=pltpu.VMEM),
            pl.BlockSpec((ngb, bn), lambda im, jn, jk: (jk + nhb, jn),
                         memory_space=pltpu.VMEM),
        ]
        operands += [zeros_p, zeros_p]
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((bm, bn), lambda im, jn, jk: (im, jn), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(*operands)
    return y.reshape(*orig_shape[:-1], n)


# ---------------------------------------------------------------------------
# int4 "n-axis" layout: native-XLA streaming path (no Pallas custom calls)
#
# Storage: packed_n uint8 [K, N/2] — byte (k, j) holds the SIGNED two's-
# complement nibbles of out-channels n=2j (low nibble) and n=2j+1 (high).
# In-program `bitcast_convert_type(u8, int4)` yields s4 [K, N/2, 2] with the
# low nibble first, so `reshape(K, N)` restores natural n order with NO
# transpose; the s4->bf16 convert fuses into the dot the way the int8 path's
# convert does.  s4 arrays cannot cross program boundaries on this stack
# (runtime transfer recursion), hence uint8 storage + in-program bitcast.
#
# Dequant law: value = qs * scale + zshift, with qs in [-8, 7] and
# zshift = zero + 8*scale relative to the canonical affine layout
# (value = q*scale + zero, q = qs + 8 in [0, 15]).  Symmetric weights get
# zshift = 0 exactly; Q4_K maps losslessly.
#
# Why this exists: the group-partial Pallas kernel wins per-GEMV, but ~196
# custom-call boundaries per decode step forfeit XLA's cross-op prefetch
# (int8 stays ahead at model level).  This path keeps the whole decode step
# ONE schedulable XLA graph while streaming half the weight bytes of int8.
# ---------------------------------------------------------------------------


def pack_int4_n(qs_t):
    """qs_t int8 [..., K, N] values -8..7 -> packed uint8 [..., K, N/2].
    Works on numpy (load time) or jnp (on-device quantization) arrays."""
    xp = jnp if isinstance(qs_t, jax.Array) else np
    lo = (qs_t[..., 0::2] & 0x0F).astype(xp.uint8)
    hi = (qs_t[..., 1::2] & 0x0F).astype(xp.uint8)
    return lo | (hi << 4)


def canonical_to_n_layout(packed_e8, scales_p, zeros_p, group: int, k: int):
    """Canonical planar operands (prepare_int4) -> n-axis layout.

    Returns (packed_n uint8 [..., K, N/2], scales f32 [..., K/G, N],
    zshift f32 [..., K/G, N]).  Drops the Pallas block padding (the n-axis
    path has no block-size constraint beyond K % G == 0)."""
    xp = jnp if isinstance(packed_e8, jax.Array) else np
    *lead, khp, n = packed_e8.shape
    khalf = k // 2
    ngh = khp // group
    ng = khalf // group
    lo = packed_e8[..., :khalf, :] & 0x0F  # q in 0..15, k = 0..khalf
    hi = packed_e8[..., :khalf, :] >> 4  # k = khalf..k
    q = xp.concatenate([lo, hi], axis=-2).astype(xp.int16)  # [..., K, N]
    qs_t = (q - 8).astype(xp.int8)
    s = xp.concatenate([scales_p[..., :ng, :], scales_p[..., ngh : ngh + ng, :]], axis=-2)
    z = xp.concatenate([zeros_p[..., :ng, :], zeros_p[..., ngh : ngh + ng, :]], axis=-2)
    zshift = (z + 8.0 * s).astype(xp.float32)
    if xp is np and np.all(zshift == 0.0):
        zshift = None  # symmetric weights: skip the correction stream entirely
    return pack_int4_n(qs_t), s.astype(xp.float32), zshift


def unpack_int4_planes(packed_n: jax.Array) -> tuple[jax.Array, jax.Array]:
    """uint8 [..., K, N/2] -> (even, odd) signed-nibble int8 planes.

    Arithmetic unpack (mask / shift / xor sign-fix) instead of
    `bitcast_convert_type(u8, int4)`: on this chip the s4 bitcast does NOT
    fuse into consumers — XLA materializes the [..., K, N/2, 2] s4 array
    with its minor dim padded to the 128-lane tile, a ~64x HBM blowup that
    measured 5-7x slower than int8 at the model level.  The arithmetic form
    stays elementwise-fusible all the way into the dot."""
    lo = ((packed_n & 0x0F).astype(jnp.int8) ^ 8) - 8
    hi = ((packed_n >> 4).astype(jnp.int8) ^ 8) - 8
    return lo, hi


def unpack_int4_n(packed_n: jax.Array) -> jax.Array:
    """uint8 [..., K, N/2] -> s4-valued int8 [..., K, N] (even/odd interleave)."""
    lo, hi = unpack_int4_planes(packed_n)
    q = jnp.stack([lo, hi], axis=-1)  # [..., K, N/2, 2]
    return q.reshape(*packed_n.shape[:-1], packed_n.shape[-1] * 2)


def dequant_int4_n(packed_n, scales_g, zshift_g=None, group: int = 32):
    """n-axis operands -> f32 [K, N] (prefill / fallback path)."""
    q = unpack_int4_n(packed_n).astype(jnp.float32)
    w = q * jnp.repeat(scales_g, group, axis=-2)
    if zshift_g is not None:
        w = w + jnp.repeat(zshift_g, group, axis=-2)
    return w


def int4_xla_matmul(x: jax.Array, packed_n: jax.Array, scales_g: jax.Array,
                    zshift_g=None, group: int = 32) -> jax.Array:
    """y[..., N] = x[..., K] @ dequant(n-axis int4 operands) — f32 out.

    Decode shapes (m <= 32) run a "planar two-dot": the even/odd nibble
    planes are unpacked arithmetically (never materialized interleaved —
    the [K, N/2, 2]->[K, N] reshape relayouts through a 128-lane-padded
    minor dim), group scales are broadcast-multiplied into each [g, G, N/2]
    plane in bf16 (fuses into the dot operand), and the two [m, N/2] f32
    results interleave at the end (free at activation size).  Measured on
    chip: the previous [K/G]-batched s4-bitcast dot ran 5-7x SLOWER than
    int8; this form is the fastest pure-XLA int4 formulation of the six
    benchmarked in scratch/int4_stream.py.  Larger m dequants + single dot
    (MXU-bound there).  zshift_g=None means symmetric weights (zshift is
    identically zero): the correction term and its HBM stream are skipped."""
    orig_shape = x.shape
    k = orig_shape[-1]
    n = packed_n.shape[-1] * 2
    x2 = x.reshape(-1, k)
    m = x2.shape[0]

    if m > 32:
        w = dequant_int4_n(packed_n, scales_g, zshift_g, group)
        y = jax.lax.dot_general(
            x2.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return y.reshape(*orig_shape[:-1], n)

    g = k // group
    nh = n // 2
    lo, hi = unpack_int4_planes(packed_n)  # int8 [K, N/2] each
    sgb = scales_g.astype(jnp.bfloat16)
    se = sgb[:, 0::2].reshape(g, 1, nh)
    so = sgb[:, 1::2].reshape(g, 1, nh)
    we = (lo.astype(jnp.bfloat16).reshape(g, group, nh) * se).reshape(k, nh)
    wo = (hi.astype(jnp.bfloat16).reshape(g, group, nh) * so).reshape(k, nh)
    xb = x2.astype(jnp.bfloat16)
    ye = jax.lax.dot_general(xb, we, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [m, N/2]
    yo = jax.lax.dot_general(xb, wo, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if zshift_g is not None:
        xsum = jnp.sum(x2.astype(jnp.float32).reshape(m, g, group), axis=-1)  # [m, g]
        zs = zshift_g.astype(jnp.float32)
        ye = ye + xsum @ zs[:, 0::2]
        yo = yo + xsum @ zs[:, 1::2]
    y = jnp.stack([ye, yo], axis=-1).reshape(m, n)
    return y.reshape(*orig_shape[:-1], n)


def dequant_int4_canonical(packed_e8, scales_p, zeros_p, group: int, k: int):
    """Dequant canonical operands -> f32 [K, N] (fallback + prefill path).

    zeros_p=None means symmetric weights: zeros == -8*scales identically
    (prepare_int4's excess-8 law), so value = (q - 8) * scale and the zeros
    array need not exist at all — half the f32 side stream."""
    khp, n = packed_e8.shape
    khalf = k // 2
    s_full = jnp.repeat(scales_p, group, axis=0)  # [2*khp, N]
    lo = (packed_e8 & 0x0F).astype(jnp.float32)
    hi = (packed_e8 >> 4).astype(jnp.float32)
    q = jnp.concatenate([lo, hi], axis=0)  # [2*khp, N]
    if zeros_p is None:
        w = (q - 8.0) * s_full
    else:
        w = q * s_full + jnp.repeat(zeros_p, group, axis=0)
    return jnp.concatenate([w[:khalf], w[khp:khp + khalf]], axis=0)  # [K, N]


def dequant_int4(packed_t, scales_t, group: int = 32, zeros_t=None):
    """Reference dequant (XLA/numpy) for the planar int4 layouts -> f32 [K, N].

    zeros_t given  -> unsigned nibbles (0..15), affine;
    zeros_t absent -> signed two's-complement nibbles (-8..7), symmetric.
    """
    khalf, n = packed_t.shape
    s_full = jnp.repeat(scales_t, group, axis=0)
    if zeros_t is not None:
        lo = (packed_t & 0x0F).astype(jnp.float32)
        hi = (packed_t >> 4).astype(jnp.float32)
        q = jnp.concatenate([lo, hi], axis=0)  # [K, N]
        return q * s_full + jnp.repeat(zeros_t, group, axis=0)
    p8 = jax.lax.bitcast_convert_type(packed_t, jnp.int8)
    lo = (jnp.left_shift(p8, 4) >> 4).astype(jnp.float32)
    hi = (p8 >> 4).astype(jnp.float32)
    q = jnp.concatenate([lo, hi], axis=0)
    return q * s_full


# ---------------------------------------------------------------------------
# Load-time repacking: ggml blocks -> TPU layouts (numpy, once per weight)
# ---------------------------------------------------------------------------


def pack_int4_planar(q: np.ndarray) -> np.ndarray:
    """q: uint8 [N, K] values 0..15 -> planar packed, TRANSPOSED: [K/2, N].
    (Unsigned layout — used by the asymmetric/zero-point path.)"""
    n, k = q.shape
    qt = np.ascontiguousarray(q.T)  # [K, N]
    return (qt[: k // 2] | (qt[k // 2 :] << 4)).astype(np.uint8)


def pack_int4_planar_signed(v: np.ndarray) -> np.ndarray:
    """v: int [N, K] values -8..7 -> two's-complement nibbles, [K/2, N].
    (Symmetric layout — the kernel unpacks with arithmetic shifts.)"""
    n, k = v.shape
    vt = np.ascontiguousarray(v.T).astype(np.int8)
    lo = (vt[: k // 2] & 0x0F).astype(np.uint8)
    hi = (vt[k // 2 :] & 0x0F).astype(np.uint8)
    return (lo | (hi << 4)).astype(np.uint8)


def repack_q4_0(raw: np.ndarray, n: int, k: int):
    """ggml Q4_0 rows -> (packed [K/2, N], scales [K/32, N]).  Lossless."""
    blocks = raw.reshape(n, k // 32, 18)
    d = blocks[..., :2].copy().view(np.float16).astype(np.float32)[..., 0]  # [N, K/32]
    qs = blocks[..., 2:]  # [N, K/32, 16] nibbles: lo = elems 0..15, hi = 16..31
    lo = (qs & 0x0F).astype(np.int8) - 8
    hi = (qs >> 4).astype(np.int8) - 8
    v = np.concatenate([lo, hi], axis=-1).reshape(n, k)  # value = v*d, v in -8..7
    return pack_int4_planar_signed(v), np.ascontiguousarray(d.T)


def repack_q4_k(raw: np.ndarray, n: int, k: int):
    """ggml Q4_K rows -> (packed [K/2, N], scales [K/32, N], zeros [K/32, N]).

    Lossless: value = q * (d*sc) - dmin*m  == q*scale + zero per 32-group.
    """
    blocks = raw.reshape(n, k // 256, 144)
    nb = n * (k // 256)
    flat = blocks.reshape(nb, 144)
    d = flat[:, 0:2].copy().view(np.float16).astype(np.float32)[:, 0]
    dmin = flat[:, 2:4].copy().view(np.float16).astype(np.float32)[:, 0]
    sc6, mn6 = _dt._unpack_q4k_scales(flat[:, 4:16])  # [nb, 8] each
    qs = flat[:, 16:144]  # [nb, 128]
    q = np.empty((nb, 256), dtype=np.uint8)
    for chunk in range(4):
        qb = qs[:, chunk * 32 : (chunk + 1) * 32]
        q[:, chunk * 64 : chunk * 64 + 32] = qb & 0x0F
        q[:, chunk * 64 + 32 : chunk * 64 + 64] = qb >> 4
    scales = d[:, None] * sc6.astype(np.float32)  # [nb, 8] per-32 scale
    zeros = -(dmin[:, None] * mn6.astype(np.float32))
    q = q.reshape(n, k)
    scales = scales.reshape(n, k // 32)
    zeros = zeros.reshape(n, k // 32)
    return pack_int4_planar(q), np.ascontiguousarray(scales.T), np.ascontiguousarray(zeros.T)


def repack_q8_0(raw: np.ndarray, n: int, k: int):
    """ggml Q8_0 rows -> int8 layout (values [K, N] int8, scales [N]).

    Q8_0 has per-32 scales; we renormalize to per-row scale (bounded requant
    error ≤ 1/254 of a bin) to hit the per-out-channel int8 kernel.
    """
    blocks = raw.reshape(n, k // 32, 34)
    d = blocks[..., :2].copy().view(np.float16).astype(np.float32)[..., 0]  # [N, K/32]
    qs = blocks[..., 2:].copy().view(np.int8).astype(np.float32)  # [N, K/32, 32]
    w = (qs * d[..., None]).reshape(n, k)
    qv, sc = _dt.quant_q8_per_row_int8(w)
    return np.ascontiguousarray(qv.T), sc


def repack_float_to_int8(w: np.ndarray):
    """float [N, K] -> (values [K, N] int8, scales [N]) per-out-channel."""
    from ..utils import native

    w = np.asarray(w, np.float32)
    out = native.repack_int8(w)
    if out is not None:
        return out
    qv, sc = _dt.quant_q8_per_row_int8(w)
    return np.ascontiguousarray(qv.T), sc


def repack_float_to_int4(w: np.ndarray, group: int = 32):
    """float [N, K] -> planar int4 (packed [K/2, N], scales [K/G, N]), symmetric."""
    from ..utils import native

    w = np.asarray(w, np.float32)
    out = native.repack_int4(w, group)
    if out is not None:
        return out
    n, k = w.shape
    wg = w.reshape(n, k // group, group)
    amax = np.max(np.abs(wg), axis=-1)
    scale = np.where(amax > 0, amax / 7.0, 1.0).astype(np.float32)
    v = np.clip(np.round(wg / scale[..., None]), -8, 7).astype(np.int8)
    return pack_int4_planar_signed(v.reshape(n, k)), np.ascontiguousarray(scale.T)
