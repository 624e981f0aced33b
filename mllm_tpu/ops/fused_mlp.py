"""Fused int4 MLP decode kernel: y = down( act(gate(x)) * up(x) ) in ONE
Pallas launch.

Decode on this relay-attached chip pays a per-kernel-launch gap comparable
to a small GEMV itself, so the three int4 projections of a gated MLP —
the fat majority of a decoder layer's bytes — are fused into a single
kernel: each grid step computes one ff-slice of the hidden activation and
immediately accumulates its contribution to the output GEMM.  HBM traffic
is one pass over gate+up+down int4 weights; the [m, ff] hidden never
leaves VMEM.

Layouts (from `prepare_int4` / `prepare_int4_ff`):
  gate/up: canonical planar excess-8 over K=d (packed [khp, ff]).
  down:    BLOCK-planar excess-8 over K=ff: within each ff block of size
           `block_f`, packed row r holds f = j*F+r (lo nibble) and
           f = j*F+F/2+r (hi); scales/zeros rows follow the same order.
           This keeps the two unpacked slabs contiguous in the hidden
           activation (no strided lane slices in-kernel).

Group scales/zeros are applied to per-32-group partial sums exactly as in
ops/quant_matmul._int4_gb_kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant_matmul import _use_pallas, dequant_int4_canonical

_ACT = {
    "silu": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
}


def pick_block_f(ff: int, cap: int = 2048):
    """Largest F | ff with F a multiple of 256 and <= cap (None if none)."""
    best = None
    for f in range(256, cap + 1, 256):
        if ff % f == 0:
            best = f
    return best


def prepare_int4_ff(packed_t, scales_t, zeros_t, block_f: int):
    """LEGACY planar operands over K=ff -> block-planar excess-8.

    In: packed [ff/2, n] planar (row r: f=r lo nibble, f=r+ff/2 hi);
        signed two's-complement nibbles when zeros_t is None (converted to
        excess-8 with zeros=-8*scales), raw Q4_K nibbles otherwise;
        scales/zeros [ff/G, n] indexed by f//G.
    Out: (packed [ff/2, n], scales [ff/G, n], zeros [ff/G, n]) where block j
        of the kernel grid owns packed rows [j*F/2, (j+1)*F/2) covering
        f in [j*F, (j+1)*F) — lo nibbles f = jF+r, hi f = jF+F/2+r — and
        scale rows [j*F/G, (j+1)*F/G) in the same (natural f) order.
    Leading (stacked-layer) dims pass through."""
    xp = jnp if isinstance(packed_t, jax.Array) else np
    *lead, khp, n = packed_t.shape
    ff = 2 * khp
    assert ff % block_f == 0, (ff, block_f)
    if zeros_t is None:
        packed_t = (packed_t ^ 0x88).astype(xp.uint8)
        zeros_t = (-8.0 * scales_t).astype(xp.float32)
    fh = block_f // 2
    g = 32
    # wanted: block j, row r' (global j*fh + r') -> (f=j*F+r', f=j*F+F/2+r')
    lo_rows = np.concatenate([np.arange(j * block_f, j * block_f + fh)
                              for j in range(ff // block_f)])
    hi_rows = lo_rows + fh
    # source storage: f < ff/2 -> lo nibble of row f; else hi nibble of f-ff/2
    def nib(f):
        row = np.where(f < khp, f, f - khp)
        taken = xp.take(packed_t, row, axis=-2)
        lo_mask = (f < khp)[:, None] if not lead else (f < khp)[None, :, None]
        return xp.where(lo_mask, taken & 0x0F, taken >> 4)

    lo_nib = nib(lo_rows)
    hi_nib = nib(hi_rows)
    out_packed = (lo_nib | (hi_nib << 4)).astype(xp.uint8)

    # scale rows: value f -> source row f//g; output order = natural f order
    # of the block-planar layout, which is just 0..ff — identity!  (block j's
    # values are exactly [jF, (j+1)F) in order), so scales pass through.
    return out_packed, scales_t, zeros_t


def _group_dot(x_slab, nib, s_ref, z_ref, row0, ngb, group, acc):
    """acc += sum_g s[g] * (x_g . nib_g) + z[g] * (x_g . 1).

    z_ref=None is the symmetric form (zeros == -8*scales identically for
    weights quantized from float): the zero term folds into the scale term,
    acc += s[g] * ((x_g . q_g) - 8*(x_g . 1)), and the f32 zeros stream is
    never read from HBM — ~5 MB/layer saved on the flagship MLP."""
    for g in range(ngb):
        sl = slice(g * group, (g + 1) * group)
        p = jax.lax.dot_general(x_slab[:, sl], nib[sl, :], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        xs = jnp.sum(x_slab[:, sl], axis=1, keepdims=True).astype(jnp.float32)
        if z_ref is None:
            acc = acc + (p - 8.0 * xs) * s_ref[row0 + g:row0 + g + 1, :]
        else:
            acc = acc + p * s_ref[row0 + g:row0 + g + 1, :] + xs * z_ref[row0 + g:row0 + g + 1, :]
    return acc


def _fused_mlp_kernel_sym(x_ref, gp_ref, gs_ref, up_ref, us_ref,
                          dp_ref, ds_ref, o_ref, acc_ref, *, group, act,
                          kh_d, nhb_d):
    """Symmetric fused MLP kernel: no zeros operands (see _group_dot)."""
    _fused_mlp_kernel(x_ref, gp_ref, gs_ref, None, up_ref, us_ref, None,
                      dp_ref, ds_ref, None, o_ref, acc_ref, group=group,
                      act=act, kh_d=kh_d, nhb_d=nhb_d)


def _fused_mlp_kernel(x_ref, gp_ref, gs_ref, gz_ref, up_ref, us_ref, uz_ref,
                      dp_ref, ds_ref, dz_ref, o_ref, acc_ref, *, group, act,
                      kh_d, nhb_d):
    """Grid: (ff_blocks,).  Each step: h = act(gate_j(x)) * up_j(x) for one
    ff slab, then acc += down_j(h)."""
    jf = pl.program_id(0)
    nf = pl.num_programs(0)

    @pl.when(jf == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # [m, 2*khp_d] padded-planar layout of the input
    m = x.shape[0]
    ngb_d = kh_d // group  # groups per K-half of the d contraction

    def proj(p_ref, s_ref, z_ref):
        p32 = p_ref[:].astype(jnp.int32)
        lo = (p32 & 0x0F).astype(jnp.bfloat16)
        hi = (p32 >> 4).astype(jnp.bfloat16)
        bf = lo.shape[1]
        acc = jnp.zeros((m, bf), jnp.float32)
        acc = _group_dot(x[:, :kh_d], lo, s_ref, z_ref, 0, ngb_d, group, acc)
        acc = _group_dot(x[:, kh_d:], hi, s_ref, z_ref, ngb_d, ngb_d, group, acc)
        return acc

    gate = proj(gp_ref, gs_ref, gz_ref)
    up = proj(up_ref, us_ref, uz_ref)
    h = (act(gate) * up).astype(jnp.bfloat16)  # [m, F]

    # down: block-planar slab — lo nibbles pair with h[:, :F/2], hi with rest
    d32 = dp_ref[:].astype(jnp.int32)
    dlo = (d32 & 0x0F).astype(jnp.bfloat16)  # [F/2, n_out]
    dhi = (d32 >> 4).astype(jnp.bfloat16)
    fh = dlo.shape[0]
    ngb_f = fh // group
    acc = acc_ref[:]
    acc = _group_dot(h[:, :fh], dlo, ds_ref, dz_ref, 0, ngb_f, group, acc)
    acc = _group_dot(h[:, fh:], dhi, ds_ref, dz_ref, ngb_f, ngb_f, group, acc)
    acc_ref[:] = acc

    @pl.when(jf == nf - 1)
    def _():
        o_ref[:] = acc_ref[:]


def fused_int4_mlp(x, gate_ops, up_ops, down_ops, *, act: str = "silu",
                   group: int = 32, block_f: int = 1280,
                   interpret: bool = False):
    """x [..., d] -> [..., d_out] through the fused int4 gated MLP.

    gate_ops/up_ops: canonical (packed [khp_d, ff], scales, zeros) over K=d.
    down_ops: block-planar (prepare_int4_ff) (packed [ff/2, d_out], ...).
    """
    gp, gs, gz = gate_ops
    up, us, uz = up_ops
    dp, ds, dz = down_ops
    orig_shape = x.shape
    d = orig_shape[-1]
    khp_d, ff = gp.shape
    n_out = dp.shape[1]
    x2 = x.reshape(-1, d)
    m = x2.shape[0]

    if (not _use_pallas() and not interpret) or m > 32:
        w_g = dequant_int4_canonical(gp, gs, gz, group, d)
        w_u = dequant_int4_canonical(up, us, uz, group, d)
        h = _ACT[act](x2.astype(jnp.float32) @ w_g) * (x2.astype(jnp.float32) @ w_u)
        # undo the block-planar permutation via dequant of the full down matrix
        w_d = _dequant_down_blockplanar(dp, ds, dz, group, block_f)
        y = h @ w_d
        return y.reshape(*orig_shape[:-1], n_out)

    kh = d // 2
    pad = khp_d - kh
    xb = x2.astype(jnp.bfloat16)
    if pad:
        zx = jnp.zeros((m, pad), xb.dtype)
        xb = jnp.concatenate([xb[:, :kh], zx, xb[:, kh:], zx], axis=1)

    fh = block_f // 2
    ngb_f2 = 2 * (fh // group)
    grid = (ff // block_f,)
    ngb_d2 = 2 * (khp_d // group)
    sym = gz is None and uz is None and dz is None
    x_spec = pl.BlockSpec((m, 2 * khp_d), lambda j: (0, 0), memory_space=pltpu.VMEM)
    wd_spec = pl.BlockSpec((khp_d, block_f), lambda j: (0, j), memory_space=pltpu.VMEM)
    sd_spec = pl.BlockSpec((ngb_d2, block_f), lambda j: (0, j), memory_space=pltpu.VMEM)
    wf_spec = pl.BlockSpec((fh, n_out), lambda j: (j, 0), memory_space=pltpu.VMEM)
    sf_spec = pl.BlockSpec((ngb_f2, n_out), lambda j: (j, 0), memory_space=pltpu.VMEM)
    if sym:
        kernel = functools.partial(_fused_mlp_kernel_sym, group=group,
                                   act=_ACT[act], kh_d=khp_d, nhb_d=1)
        specs = [x_spec, wd_spec, sd_spec, wd_spec, sd_spec, wf_spec, sf_spec]
        operands = (xb, gp, gs, up, us, dp, ds)
    else:
        kernel = functools.partial(_fused_mlp_kernel, group=group,
                                   act=_ACT[act], kh_d=khp_d, nhb_d=1)
        specs = [x_spec, wd_spec, sd_spec, sd_spec, wd_spec, sd_spec, sd_spec,
                 wf_spec, sf_spec, sf_spec]
        operands = (xb, gp, gs, gz, up, us, uz, dp, ds, dz)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((m, n_out), lambda j: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n_out), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, n_out), jnp.float32)],
        interpret=interpret,
    )(*operands)
    return y.reshape(*orig_shape[:-1], n_out)


def _dequant_down_blockplanar(dp, ds, dz, group, block_f):
    """Block-planar down operands -> f32 [ff, n_out] (fallback path)."""
    fh2, n = dp.shape  # ff/2 rows
    ff = 2 * fh2
    fh = block_f // 2
    lo = (dp & 0x0F).astype(jnp.float32)
    hi = (dp >> 4).astype(jnp.float32)
    s_full = jnp.repeat(ds, group, axis=0)  # [ff, n], natural f order
    nblk = ff // block_f
    # per block j: lo rows then hi rows — which IS the natural f order
    w_rows = []
    for j in range(nblk):
        w_rows.append(lo[j * fh:(j + 1) * fh])
        w_rows.append(hi[j * fh:(j + 1) * fh])
    q = jnp.concatenate(w_rows, axis=0)  # [ff, n] natural f order
    if dz is None:  # symmetric: zeros == -8*scales
        return (q - 8.0) * s_full
    return q * s_full + jnp.repeat(dz, group, axis=0)  # scales already stored in the same order
