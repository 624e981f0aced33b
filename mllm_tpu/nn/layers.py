"""Core layers: TPU-native equivalents of the reference's typed Layer wrappers
(/root/reference/mllm/Layer.hpp:228-1233).

All layers are pytree Modules (see module.py).  Compute conventions for TPU:
  - matmuls run in the activation dtype (bf16 preferred) with float32
    accumulation (`preferred_element_type`), feeding the MXU;
  - normalizations and softmax statistics are computed in float32 on the VPU;
  - no dynamic shapes: sequence lengths are padded/bucketed by callers.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .module import Module, ModuleList

# ---------------------------------------------------------------------------
# Activations (reference ACT_FN map, Layer.hpp:389-395)
# ---------------------------------------------------------------------------


def silu(x):
    return x * jax.nn.sigmoid(x)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def relu(x):
    return jax.nn.relu(x)


def relu2(x):
    r = jax.nn.relu(x)
    return r * r


ACT_FN: dict[str, Callable] = {
    "silu": silu,
    "gelu": gelu,
    "gelu_new": gelu_tanh,
    "gelu_pytorch_tanh": gelu_tanh,
    "quick_gelu": quick_gelu,
    "relu": relu,
    "relu2": relu2,
    "relu^2": relu2,
}


# ---------------------------------------------------------------------------
# Linear / Embedding
# ---------------------------------------------------------------------------


class Linear(Module):
    """y = x @ W^T + b.  Weight stored [out, in] (HF convention).

    Replaces reference Linear (Layer.hpp:228) + CPULinear quant GEMM dispatch
    (backends/cpu/op/CPULinear.cpp): on TPU the dtype dispatch is just the
    dtype of `self.weight`; quantized variants live in QuantLinear.
    """

    def __init__(self, weight: jax.Array, bias: Optional[jax.Array] = None):
        self.weight = weight
        self.bias = bias

    @staticmethod
    def init(key, in_features: int, out_features: int, bias: bool = True, dtype=jnp.float32):
        kw, kb = jax.random.split(key)
        scale = 1.0 / math.sqrt(in_features)
        w = jax.random.uniform(kw, (out_features, in_features), dtype, -scale, scale)
        b = jax.random.uniform(kb, (out_features,), dtype, -scale, scale) if bias else None
        return Linear(w, b)

    def __call__(self, x):
        y = jax.lax.dot_general(
            x,
            self.weight,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if self.bias is not None:
            y = y + self.bias.astype(jnp.float32)
        return y.astype(x.dtype)


class QuantLinear(Module):
    """Linear over int8-quantized weight (TPU-native k-major int8 layout).

    Holds int8 values [in, out] and f32 per-out-channel scales [out].
    Dispatches to the Pallas int8 matmul kernel on TPU; falls back to
    dequant + XLA dot.  ggml-packed formats (Q8_0 etc.) are repacked into
    this layout at load time — see mllm_tpu/ops/quant_matmul.py.
    """

    def __init__(self, qweight_t: jax.Array, scales: jax.Array, bias: Optional[jax.Array] = None):
        self.qweight_t = qweight_t  # int8 [in, out]
        self.scales = scales  # f32 [out]
        self.bias = bias

    def __call__(self, x):
        from ..ops.quant_matmul import int8_matmul

        y = int8_matmul(x, self.qweight_t, self.scales)
        if self.bias is not None:
            y = y + self.bias
        return y.astype(x.dtype)


class QuantLinearA8(QuantLinear):
    """QuantLinear that quantizes ACTIVATIONS too when the call is
    prefill-shaped (W8A8, the reference's QNN-NPU prefill scheme).

    Dispatch is static per trace: the flattened row count m is a trace-time
    constant, so prefill programs (m >= 16) compile the s8 x s8 double-rate
    MXU dot while decode programs (m = batch <= 8) keep the weight-only
    bf16 x int8 dot — decode is HBM-bound, activation quant buys nothing
    there.  Mirrors the reference's NPU-prefill / CPU-decode split
    (demo_qwen_npu.cpp:33-110) as one pytree instead of two backends."""

    def __call__(self, x):
        from ..ops.quant_matmul import int8_matmul, int8_matmul_a8

        m = int(np.prod(x.shape[:-1]))
        # prefill-shaped = many tokens, not many decode slots: a [B, 1, D]
        # decode step with B >= 16 must keep the weight-only dot (decode is
        # HBM-bound; activation quant would change numerics for zero gain)
        seq = x.shape[-2] if x.ndim >= 3 else m
        if m >= 16 and seq > 1:
            y = int8_matmul_a8(x, self.qweight_t, self.scales)
        else:
            y = int8_matmul(x, self.qweight_t, self.scales)
        if self.bias is not None:
            y = y + self.bias
        return y.astype(x.dtype)


class Int4Linear(Module):
    """Linear over int4 group-quantized weight (canonical planar layout).

    Operands come from ops.quant_matmul.prepare_int4: packed_t [khp, out]
    uint8 excess-8/Q4_K nibbles (khp = in//2 padded to the kernel block),
    scales_t/zeros_t f32 [2*khp/G, out].  Decode runs the group-partial
    Pallas kernel (faster than int8 on-chip); prefill dequants + XLA dot.
    """

    def __init__(self, packed_t: jax.Array, scales_t: jax.Array, group: int,
                 zeros_t: jax.Array = None, bias: Optional[jax.Array] = None):
        self.packed_t = packed_t
        self.scales_t = scales_t
        self.group = group
        self.zeros_t = zeros_t
        self.bias = bias

    def __call__(self, x):
        from ..ops.quant_matmul import int4_matmul

        y = int4_matmul(x, self.packed_t, self.scales_t, self.group, self.zeros_t)
        if self.bias is not None:
            y = y + self.bias
        return y.astype(x.dtype)


class Int4LinearXLA(Module):
    """Linear over int4 group-quantized weight, n-axis layout (native XLA).

    Holds packed_n uint8 [in, out/2] (two signed nibbles per byte along the
    OUT axis), scales/zshift f32 [in/G, out]; value = qs*scale + zshift.
    The whole GEMV stays one schedulable XLA graph (in-program bitcast to
    s4 + group-batched dot) — no Pallas custom-call boundary, half the
    weight bytes of int8.  See ops.quant_matmul.int4_xla_matmul.
    """

    def __init__(self, packed_n: jax.Array, scales_g: jax.Array,
                 zshift_g: jax.Array, group: int = 32,
                 bias: Optional[jax.Array] = None):
        self.packed_n = packed_n
        self.scales_g = scales_g
        self.zshift_g = zshift_g
        self.group = group
        self.bias = bias

    def __call__(self, x):
        from ..ops.quant_matmul import int4_xla_matmul

        y = int4_xla_matmul(x, self.packed_n, self.scales_g, self.zshift_g, self.group)
        if self.bias is not None:
            y = y + self.bias
        return y.astype(x.dtype)


class Embedding(Module):
    """Token embedding (reference Layer.hpp:431, CPUEmbedding)."""

    def __init__(self, weight: jax.Array):
        self.weight = weight  # [vocab, dim]

    @staticmethod
    def init(key, vocab_size: int, dim: int, dtype=jnp.float32):
        return Embedding(jax.random.normal(key, (vocab_size, dim), dtype) * 0.02)

    def __call__(self, ids):
        return jnp.take(self.weight, ids, axis=0)

    def as_lm_head(self, x):
        """Tied-embedding lm_head (reference Tensor::mm path, modeling_qwen.hpp:160-164)."""
        y = jax.lax.dot_general(
            x, self.weight,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return y


class ElasticLinear(Module):
    """Width-elastic linear: activate only the first `ratio` fraction of the
    out (and optionally in) features per call.

    Counterpart of the reference's elastic inference (Layer.hpp:295
    ElasticLinear, op/CPUElasticLinear.cpp, demo_elastic_llama.cpp:43-52).
    Ratios are static per call — each distinct ratio compiles one slice-sized
    program (static shapes; the TPU analogue of the reference's per-step
    activate_dims).
    """

    def __init__(self, weight: jax.Array, bias: Optional[jax.Array] = None):
        self.weight = weight  # [out, in]
        self.bias = bias

    def __call__(self, x, out_ratio: float = 1.0, in_ratio: float = 1.0):
        o, i = self.weight.shape
        oa = max(1, int(o * out_ratio))
        ia = max(1, int(i * in_ratio))
        w = self.weight[:oa, :ia]
        xa = x[..., :ia]
        y = jax.lax.dot_general(xa, w, (((xa.ndim - 1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if self.bias is not None:
            y = y + self.bias[:oa].astype(jnp.float32)
        return y.astype(x.dtype)


class PredictorSparseMLP(Module):
    """PowerInfer-style predictor + sparse FFN
    (reference SparseLinear/SparseIdLinear/Predictor, Layer.hpp:269-293,
    models/llama/modeling_sparse_llama.hpp).

    The low-rank predictor scores FFN neurons; inactive neurons are masked.
    On TPU the MXU makes dense-compute-then-mask the fast formulation (the
    reference's gather-style sparse kernels are a CPU-cache optimization);
    semantics are identical: masked neurons contribute exactly zero.
    """

    def __init__(self, pred_down: jax.Array, pred_up: jax.Array,
                 gate_proj, up_proj, down_proj, act: str = "relu",
                 threshold: float = 0.0):
        self.pred_down = pred_down  # [r, in]
        self.pred_up = pred_up  # [ff, r]
        self.gate_proj = gate_proj
        self.up_proj = up_proj
        self.down_proj = down_proj
        self.act = act
        self.threshold = threshold

    def neuron_scores(self, x):
        h = jax.lax.dot_general(x, self.pred_down, (((x.ndim - 1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jax.lax.dot_general(h, self.pred_up, (((h.ndim - 1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def __call__(self, x):
        mask = (self.neuron_scores(x) > self.threshold).astype(x.dtype)
        h = ACT_FN[self.act](self.gate_proj(x))
        if self.up_proj is not None:
            h = h * self.up_proj(x)
        return self.down_proj(h * mask)


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


class RMSNorm(Module):
    """Root-mean-square norm (reference Layer.hpp:766, CPURMSNorm).

    `add_unit_offset` covers Gemma's (1 + w) convention.
    """

    def __init__(self, weight: jax.Array, eps: float = 1e-6, add_unit_offset: bool = False):
        self.weight = weight
        self.eps = eps
        self.add_unit_offset = add_unit_offset

    @staticmethod
    def init(dim: int, eps: float = 1e-6, add_unit_offset: bool = False, dtype=jnp.float32):
        return RMSNorm(jnp.ones((dim,), dtype), eps, add_unit_offset)

    def __call__(self, x):
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + self.eps)
        w = self.weight.astype(jnp.float32)
        if self.add_unit_offset:
            w = 1.0 + w
        return (xf * w).astype(x.dtype)


class LayerNorm(Module):
    """LayerNorm (reference Layer.hpp:752, CPULayerNorm)."""

    def __init__(self, weight: Optional[jax.Array], bias: Optional[jax.Array], eps: float = 1e-5):
        self.weight = weight
        self.bias = bias
        self.eps = eps

    @staticmethod
    def init(dim: int, eps: float = 1e-5, bias: bool = True, dtype=jnp.float32):
        return LayerNorm(jnp.ones((dim,), dtype), jnp.zeros((dim,), dtype) if bias else None, eps)

    def __call__(self, x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.weight is not None:
            xf = xf * self.weight.astype(jnp.float32)
        if self.bias is not None:
            xf = xf + self.bias.astype(jnp.float32)
        return xf.astype(x.dtype)


# ---------------------------------------------------------------------------
# RoPE family (reference Layer.hpp:492-663, op/CPURoPE.cpp, CPUNTKRoPE.cpp)
# ---------------------------------------------------------------------------


def rope_inv_freq(head_dim: int, theta: float = 10000.0, partial: float = 1.0) -> np.ndarray:
    rot_dim = int(head_dim * partial)
    return 1.0 / (theta ** (np.arange(0, rot_dim, 2, dtype=np.float64) / rot_dim))


def llama3_scale_inv_freq(
    inv_freq: np.ndarray,
    factor: float = 8.0,
    low_freq_factor: float = 1.0,
    high_freq_factor: float = 4.0,
    original_max_position: int = 8192,
) -> np.ndarray:
    """LLaMA-3.1 frequency-dependent RoPE scaling (reference Layer.hpp:513-530)."""
    low_freq_wavelen = original_max_position / low_freq_factor
    high_freq_wavelen = original_max_position / high_freq_factor
    wavelen = 2 * math.pi / inv_freq
    scaled = np.where(wavelen > low_freq_wavelen, inv_freq / factor, inv_freq)
    smooth = (original_max_position / wavelen - low_freq_factor) / (high_freq_factor - low_freq_factor)
    mid = (1 - smooth) * inv_freq / factor + smooth * inv_freq
    is_mid = (wavelen <= low_freq_wavelen) & (wavelen >= high_freq_wavelen)
    return np.where(is_mid, mid, scaled)


def ntk_scale_theta(theta: float, head_dim: int, factor: float) -> float:
    """Dynamic-NTK base scaling (reference CPUNTKRoPE)."""
    return theta * factor ** (head_dim / (head_dim - 2))


def longrope_scale(inv_freq: np.ndarray, rope_scaling: dict, max_position: int,
                   theta: float, which: str = "auto") -> tuple[np.ndarray, float]:
    """Phi3 LongRope: per-frequency long/short rescale factors + attention
    scaling (reference op/CPUNTKRoPE.cpp:49-52 get_sin_cos_emb_hf; HF
    _compute_longrope_parameters).  Returns (inv_freq, attention_factor).

    which: 'short' | 'long' | 'auto'.  The reference and HF select long
    factors when the *runtime* seq_len exceeds the original window — callers
    wanting exact parity build both tables and pick per call
    (LongRopeEmbedding); 'auto' keeps the build-time heuristic
    (max_position > orig) for one-table uses.  The attention factor is the
    same for both branches (HF computes it from the config ratio alone)."""
    orig = rope_scaling.get("original_max_position_embeddings", max_position)
    if which == "auto":
        which = "long" if max_position > orig else "short"
    ext = rope_scaling.get(f"{which}_factor")
    if ext is not None:
        ext = np.asarray(ext, np.float64)
        inv_freq = inv_freq / ext
    scale = max_position / orig
    attn = rope_scaling.get("attention_factor")
    if attn is None:
        attn = math.sqrt(1 + math.log(scale) / math.log(orig)) if scale > 1.0 else 1.0
    return inv_freq, float(attn)


def yarn_scale(inv_freq: np.ndarray, rope_scaling: dict, max_position: int,
               theta: float, rot_dim: int) -> tuple[np.ndarray, float]:
    """YaRN frequency blending (HF _compute_yarn_parameters): high-frequency
    bands extrapolate (unscaled), low-frequency bands interpolate (/factor),
    with a linear ramp between beta_fast/beta_slow correction dims and
    sqrt-log attention temperature."""
    factor = float(rope_scaling.get("factor", 1.0))
    orig = rope_scaling.get("original_max_position_embeddings", max_position)
    beta_fast = float(rope_scaling.get("beta_fast", 32.0))
    beta_slow = float(rope_scaling.get("beta_slow", 1.0))

    def correction_dim(num_rot: float) -> float:
        return (rot_dim * math.log(orig / (num_rot * 2 * math.pi))) / (2 * math.log(theta))

    low = max(math.floor(correction_dim(beta_fast)), 0)
    high = min(math.ceil(correction_dim(beta_slow)), rot_dim // 2 - 1)
    ramp = np.clip((np.arange(rot_dim // 2, dtype=np.float64) - low) / max(high - low, 1e-3), 0, 1)
    extrap = 1.0 - ramp  # 1 for high-freq dims, 0 for low-freq dims
    out = (inv_freq / factor) * (1 - extrap) + inv_freq * extrap

    attn = rope_scaling.get("attention_factor")
    if attn is None:
        mscale = rope_scaling.get("mscale")
        def get_mscale(s, m=1.0):
            return 0.1 * m * math.log(s) + 1.0 if s > 1.0 else 1.0
        if mscale is not None:  # deepseek-yarn variant
            attn = get_mscale(factor, mscale) / get_mscale(
                factor, rope_scaling.get("mscale_all_dim", 0.0))
        else:
            attn = get_mscale(factor)
    return out, float(attn)


class RotaryEmbedding(Module):
    """Precomputed sin/cos tables applied by position index.

    style='hf'     : GPT-NeoX half-rotation (rotate_half), reference HFHUBROPE
    style='llama'  : interleaved pairs (x[2i], x[2i+1]), reference LLAMAROPE
    Partial rotary (persimmon/phi-style PERSIMMONROPE) via partial < 1.
    """

    def __init__(self, sin: jax.Array, cos: jax.Array, style: str = "hf", rot_dim: int | None = None):
        self.sin = sin  # [max_pos, rot_dim/2]
        self.cos = cos
        self.style = style
        self.rot_dim = rot_dim if rot_dim is not None else 2 * sin.shape[-1]

    @staticmethod
    def make(
        head_dim: int,
        max_position: int = 32768,
        theta: float = 10000.0,
        style: str = "hf",
        partial: float = 1.0,
        rope_scaling: dict | None = None,
        dtype=jnp.float32,
    ):
        inv = rope_inv_freq(head_dim, theta, partial)
        rot_dim = int(head_dim * partial) // 2 * 2
        attn_scale = 1.0
        if rope_scaling:
            typ = rope_scaling.get("rope_type", rope_scaling.get("type", ""))
            if typ == "llama3":
                inv = llama3_scale_inv_freq(
                    inv,
                    factor=rope_scaling.get("factor", 8.0),
                    low_freq_factor=rope_scaling.get("low_freq_factor", 1.0),
                    high_freq_factor=rope_scaling.get("high_freq_factor", 4.0),
                    original_max_position=rope_scaling.get("original_max_position_embeddings", 8192),
                )
            elif typ in ("dynamic", "ntk"):
                theta2 = ntk_scale_theta(theta, int(head_dim * partial), rope_scaling.get("factor", 1.0))
                inv = rope_inv_freq(head_dim, theta2, partial)
            elif typ == "linear":
                inv = inv / rope_scaling.get("factor", 1.0)
            elif typ == "longrope":
                orig = rope_scaling.get("original_max_position_embeddings", max_position)
                if rope_scaling.get("short_factor") is not None and max_position > orig:
                    # both branches reachable at runtime: build both tables
                    # and select by seq_len per call (HF/reference semantics)
                    inv_s, attn_scale = longrope_scale(inv, rope_scaling, max_position,
                                                       theta, which="short")
                    inv_l, _ = longrope_scale(inv, rope_scaling, max_position,
                                              theta, which="long")
                    t = np.arange(max_position, dtype=np.float64)
                    fs, fl = np.outer(t, inv_s), np.outer(t, inv_l)
                    return LongRopeEmbedding(
                        jnp.asarray(np.sin(fs) * attn_scale, dtype),
                        jnp.asarray(np.cos(fs) * attn_scale, dtype),
                        jnp.asarray(np.sin(fl) * attn_scale, dtype),
                        jnp.asarray(np.cos(fl) * attn_scale, dtype),
                        int(orig), style, rot_dim=rot_dim,
                    )
                inv, attn_scale = longrope_scale(inv, rope_scaling, max_position, theta)
            elif typ == "yarn":
                inv, attn_scale = yarn_scale(inv, rope_scaling, max_position, theta, rot_dim)
        t = np.arange(max_position, dtype=np.float64)
        freqs = np.outer(t, inv)  # [max_pos, rot/2]
        return RotaryEmbedding(
            jnp.asarray(np.sin(freqs) * attn_scale, dtype),
            jnp.asarray(np.cos(freqs) * attn_scale, dtype),
            style,
            rot_dim=rot_dim,
        )

    def __call__(self, x, positions):
        """x: [..., S, H, D] (seq axis = -3); positions: broadcastable to [..., S]."""
        sin = jnp.take(self.sin, positions, axis=0)[..., None, :]  # [..., S, 1, rot/2]
        cos = jnp.take(self.cos, positions, axis=0)[..., None, :]
        return apply_rotary(x, sin, cos, self.style, self.rot_dim)


class LongRopeEmbedding(Module):
    """Phi3 LongRope with runtime long/short selection.

    The reference (op/CPUNTKRoPE.cpp:49-52) and HF
    (modeling_rope_utils.longrope_frequency_update) pick LONG rescale factors
    when the current seq_len (= max position + 1) exceeds the original
    pretraining window, SHORT otherwise — a per-call, data-dependent choice.
    Both sin/cos tables are precomputed; selection is one traced `where`
    (gathers from both tables, negligible next to the attention matmuls)."""

    def __init__(self, sin_short, cos_short, sin_long, cos_long,
                 original_max_position: int, style: str = "hf",
                 rot_dim: int | None = None):
        self.sin_short = sin_short  # [max_pos, rot/2]
        self.cos_short = cos_short
        self.sin_long = sin_long
        self.cos_long = cos_long
        self.original_max_position = original_max_position
        self.style = style
        self.rot_dim = rot_dim if rot_dim is not None else 2 * sin_short.shape[-1]

    def __call__(self, x, positions):
        pos = jnp.asarray(positions)
        use_long = (jnp.max(pos) + 1) > self.original_max_position  # traced scalar
        sin_s = jnp.take(self.sin_short, pos, axis=0)[..., None, :]
        cos_s = jnp.take(self.cos_short, pos, axis=0)[..., None, :]
        sin_l = jnp.take(self.sin_long, pos, axis=0)[..., None, :]
        cos_l = jnp.take(self.cos_long, pos, axis=0)[..., None, :]
        sin = jnp.where(use_long, sin_l, sin_s)
        cos = jnp.where(use_long, cos_l, cos_s)
        return apply_rotary(x, sin, cos, self.style, self.rot_dim)


class IRotaryEmbedding(Module):
    """int8-quantized sin/cos RoPE tables (reference IRoPE, Layer.hpp:639,
    op/CPUIRoPE.cpp: tables stored as round(sin*127), dequantized /127 at
    apply time — the NPU-memory-friendly RoPE used by PhoneLM).

    Same apply semantics as RotaryEmbedding; tables cost 4x less HBM.
    """

    def __init__(self, sin_q: jax.Array, cos_q: jax.Array, style: str = "hf",
                 rot_dim: int | None = None):
        self.sin_q = sin_q  # int8 [max_pos, rot/2]
        self.cos_q = cos_q
        self.style = style
        self.rot_dim = rot_dim if rot_dim is not None else 2 * sin_q.shape[-1]

    @staticmethod
    def make(head_dim: int, max_position: int = 32768, theta: float = 10000.0,
             style: str = "hf", partial: float = 1.0):
        inv = rope_inv_freq(head_dim, theta, partial)
        t = np.arange(max_position, dtype=np.float64)
        freqs = np.outer(t, inv)
        # reference quantization rule: round(v / max_abs * 127); max_abs == 1
        sq = np.clip(np.round(np.sin(freqs) * 127.0), -127, 127).astype(np.int8)
        cq = np.clip(np.round(np.cos(freqs) * 127.0), -127, 127).astype(np.int8)
        return IRotaryEmbedding(jnp.asarray(sq), jnp.asarray(cq), style,
                                rot_dim=int(head_dim * partial) // 2 * 2)

    def __call__(self, x, positions):
        inv127 = jnp.float32(1.0 / 127.0)
        sin = jnp.take(self.sin_q, positions, axis=0)[..., None, :].astype(jnp.float32) * inv127
        cos = jnp.take(self.cos_q, positions, axis=0)[..., None, :].astype(jnp.float32) * inv127
        return apply_rotary(x, sin, cos, self.style, self.rot_dim)


def apply_rotary(x, sin, cos, style: str = "hf", rot_dim: int | None = None):
    """Apply rotary embedding. sin/cos: [..., S, 1, rot/2] broadcast over heads."""
    d = x.shape[-1]
    rot_dim = rot_dim or d
    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    xf = x_rot.astype(jnp.float32)
    sin = sin.astype(jnp.float32)
    cos = cos.astype(jnp.float32)
    if style == "hf":
        half = rot_dim // 2
        x1, x2 = xf[..., :half], xf[..., half:]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.concatenate([o1, o2], axis=-1)
    elif style == "llama":
        x1 = xf[..., 0::2]
        x2 = xf[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.stack([o1, o2], axis=-1).reshape(xf.shape)
    else:
        raise ValueError(f"unknown rope style {style}")
    out = out.astype(x.dtype)
    if rot_dim < d:
        out = jnp.concatenate([out, x_pass], axis=-1)
    return out


class MultimodalRotaryEmbedding(Module):
    """Qwen2-VL M-RoPE: 3-axis (temporal, height, width) position ids with
    per-axis frequency sections (reference Layer.hpp:880 `MultimodalRoPE`,
    op/CPUMultimodalRoPE.cpp).

    mrope_section: e.g. [16, 24, 24] halves of rot_dim/2 per axis.
    positions: [3, B, S].
    """

    def __init__(self, sin: jax.Array, cos: jax.Array, mrope_section: tuple[int, ...]):
        self.sin = sin  # [max_pos, rot/2]
        self.cos = cos
        self.mrope_section = tuple(mrope_section)

    @staticmethod
    def make(head_dim: int, max_position: int, theta: float, mrope_section, dtype=jnp.float32):
        inv = rope_inv_freq(head_dim, theta)
        t = np.arange(max_position, dtype=np.float64)
        freqs = np.outer(t, inv)
        return MultimodalRotaryEmbedding(
            jnp.asarray(np.sin(freqs), dtype), jnp.asarray(np.cos(freqs), dtype), tuple(mrope_section)
        )

    def _gather(self, table, positions):
        # positions [3, B, S] -> per-axis tables [3, B, S, rot/2] then select
        # sections: first sec[0] freqs from axis 0, next sec[1] from axis 1, ...
        per_axis = jnp.take(table, positions, axis=0)  # [3, B, S, rot/2]
        chunks = []
        start = 0
        for ax, sec in enumerate(self.mrope_section):
            chunks.append(per_axis[ax, :, :, start : start + sec])
            start += sec
        return jnp.concatenate(chunks, axis=-1)  # [B, S, rot/2]

    def __call__(self, x, positions):
        """x: [B, S, H, D]; positions: [3, B, S] int32."""
        sin = self._gather(self.sin, positions)[..., None, :]
        cos = self._gather(self.cos, positions)[..., None, :]
        return apply_rotary(x, sin, cos, "hf")


class VisionRotaryEmbedding(Module):
    """Qwen2-VL vision RoPE over (h, w) patch grid (reference Layer.hpp:841)."""

    def __init__(self, inv_freq: jax.Array):
        self.inv_freq = inv_freq  # [dim/4] — half of rot dims per spatial axis

    @staticmethod
    def make(head_dim: int, theta: float = 10000.0, dtype=jnp.float32):
        dim = head_dim // 2
        inv = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
        return VisionRotaryEmbedding(jnp.asarray(inv, dtype))

    def freqs(self, grid_hw: np.ndarray):
        """grid positions [S, 2] (h_idx, w_idx) -> rotary freqs [S, head_dim/2]."""
        h = grid_hw[:, 0].astype(jnp.float32)
        w = grid_hw[:, 1].astype(jnp.float32)
        fh = h[:, None] * self.inv_freq[None, :]
        fw = w[:, None] * self.inv_freq[None, :]
        return jnp.concatenate([fh, fw], axis=-1)  # [S, head_dim/2]


# ---------------------------------------------------------------------------
# Masks & softmax helpers (reference Causalmask/SlidingWindowMask Layer.hpp:444-490)
# ---------------------------------------------------------------------------

NEG_INF = -1e30  # large-but-finite to avoid NaNs in fully-masked rows


def causal_mask_bias(q_len: int, kv_len: int, q_offset, dtype=jnp.float32, window: int | None = None):
    """Additive attention bias [q_len, kv_len]. q_offset = absolute position of q[0].

    window: sliding-window size (reference SlidingWindowMask); None = full causal.
    """
    q_pos = q_offset + jnp.arange(q_len)[:, None]
    k_pos = jnp.arange(kv_len)[None, :]
    ok = k_pos <= q_pos
    if window is not None:
        ok = ok & (k_pos > q_pos - window)
    return jnp.where(ok, 0.0, NEG_INF).astype(dtype)


def softmax_f32(x, axis=-1):
    xf = x.astype(jnp.float32)
    return jax.nn.softmax(xf, axis=axis)


# ---------------------------------------------------------------------------
# Convolutions (reference Layer.hpp:801-838, CPUConvolution2D/3D)
# ---------------------------------------------------------------------------


class Conv2d(Module):
    """NHWC conv; weight stored [out, in, kh, kw] (torch layout) and transposed
    at call into XLA's preferred HWIO."""

    def __init__(self, weight: jax.Array, bias: Optional[jax.Array], stride: tuple[int, int]):
        self.weight = weight
        self.bias = bias
        self.stride = tuple(stride)

    def __call__(self, x):
        # x: [B, H, W, C]
        w = jnp.transpose(self.weight, (2, 3, 1, 0))  # HWIO
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=self.stride, padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        if self.bias is not None:
            y = y + self.bias
        return y.astype(x.dtype)


class Conv3d(Module):
    """3D patch-embed conv (Qwen2-VL patch_embed; reference CPUConvolution3D).

    Since stride == kernel for patch embeds, implemented as an unfold + matmul:
    the MXU-native formulation.
    """

    def __init__(self, weight: jax.Array, bias: Optional[jax.Array], kernel: tuple[int, int, int]):
        self.weight = weight  # [out, in, kt, kh, kw]
        self.bias = bias
        self.kernel = tuple(kernel)

    def __call__(self, patches):
        """patches: [N, in*kt*kh*kw] pre-unfolded patch matrix (the processor
        emits exactly this layout, mirroring processing_qwen2_vl.hpp:119-179)."""
        o = self.weight.shape[0]
        w = self.weight.reshape(o, -1)  # [out, in*kt*kh*kw]
        y = jax.lax.dot_general(
            patches, w, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if self.bias is not None:
            y = y + self.bias
        return y.astype(patches.dtype)
