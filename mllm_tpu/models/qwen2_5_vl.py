"""Qwen2.5-VL — counterpart of /root/reference/mllm/models/qwen2_5_vl/.

Differences from Qwen2-VL (models/qwen2_vl.py):
  - vision blocks use RMSNorm + gated SwiGLU MLP;
  - windowed vision attention: merged tokens are permuted into 8x8-patch
    windows, attention is block-diagonal per window except at
    `fullatt_block_indexes`, then un-permuted after the merger.  The window
    structure is a same-window-id mask (static shapes per image grid).

The LM side (M-RoPE decoder) is shared with Qwen2-VL.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.attention import sdpa
from ..nn.layers import ACT_FN, RMSNorm, Linear
from ..nn.module import Module, ModuleList
from .loading import load_causal_lm
from .qwen2_vl import (
    PatchEmbed,
    PatchMerger,
    Qwen2VLConfig,
    Qwen2VLForConditionalGeneration,
    _apply_vision_rotary,
)


@dataclass(frozen=True)
class Qwen25VLVisionConfig:
    depth: int = 32
    hidden_size: int = 1280  # vision width
    out_hidden_size: int = 2048  # LM hidden
    intermediate_size: int = 3420
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    window_size: int = 112
    fullatt_block_indexes: tuple = (7, 15, 23, 31)
    hidden_act: str = "silu"


def get_window_index(grid_thw: tuple[int, int, int], window_size: int,
                     patch_size: int, merge_size: int):
    """Permutation of MERGED token indices into window order + per-token
    window ids (mirrors HF Qwen2_5_VisionTransformer.get_window_index)."""
    t, h, w = grid_thw
    lh, lw = h // merge_size, w // merge_size  # merged grid
    vit_win = window_size // patch_size // merge_size  # merged tokens per window side
    idx = np.arange(t * lh * lw).reshape(t, lh, lw)
    pad_h = (-lh) % vit_win
    pad_w = (-lw) % vit_win
    padded = np.pad(idx, ((0, 0), (0, pad_h), (0, pad_w)), constant_values=-100)
    nh, nw = padded.shape[1] // vit_win, padded.shape[2] // vit_win
    blocks = padded.reshape(t, nh, vit_win, nw, vit_win).transpose(0, 1, 3, 2, 4)
    flat = blocks.reshape(t * nh * nw, -1)
    window_index = []
    window_ids = []
    for wi, row in enumerate(flat):
        valid = row[row != -100]
        window_index.extend(valid.tolist())
        window_ids.extend([wi] * len(valid))
    return np.asarray(window_index, np.int64), np.asarray(window_ids, np.int32)


class Qwen25VLVisionBlock(Module):
    def __init__(self, norm1, qkv, proj, norm2, gate, up, down, n_heads: int, act: str):
        self.norm1 = norm1
        self.qkv = qkv
        self.proj = proj
        self.norm2 = norm2
        self.gate = gate
        self.up = up
        self.down = down
        self.n_heads = n_heads
        self.act = act

    def __call__(self, x, cos, sin, bias):
        s, d = x.shape
        hd = d // self.n_heads
        h = self.norm1(x)
        qkv = self.qkv(h).reshape(s, 3, self.n_heads, hd)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        q = _apply_vision_rotary(q, cos, sin)
        k = _apply_vision_rotary(k, cos, sin)
        o = sdpa(q[None], jnp.transpose(k, (1, 0, 2))[None],
                 jnp.transpose(v, (1, 0, 2))[None], causal=False, bias=bias)[0]
        x = x + self.proj(o.reshape(s, d))
        h = self.norm2(x)
        x = x + self.down(ACT_FN[self.act](self.gate(h)) * self.up(h))
        return x


class Qwen25VLVisionTower(Module):
    def __init__(self, patch_embed, blocks: ModuleList, merger, inv_freq,
                 cfg: Qwen25VLVisionConfig):
        self.patch_embed = patch_embed
        self.blocks = blocks
        self.merger = merger
        self.inv_freq = inv_freq
        self.cfg = cfg

    def rot_pos_emb(self, grid_thw, window_index):
        """cos/sin in WINDOW order for the pre-merge token stream."""
        t, h, w = grid_thw
        ms = self.cfg.spatial_merge_size
        hpos = np.arange(h)[:, None].repeat(w, axis=1)
        hpos = hpos.reshape(h // ms, ms, w // ms, ms).transpose(0, 2, 1, 3).reshape(-1)
        wpos = np.arange(w)[None, :].repeat(h, axis=0)
        wpos = wpos.reshape(h // ms, ms, w // ms, ms).transpose(0, 2, 1, 3).reshape(-1)
        pos = np.stack([hpos, wpos], axis=-1)
        pos = np.tile(pos, (t, 1))
        # reorder pre-merge tokens by window_index (each merged token = ms^2 rows)
        unit = ms * ms
        pos = pos.reshape(-1, unit, 2)[window_index].reshape(-1, 2)
        posj = jnp.asarray(pos, jnp.float32)
        freqs = posj[:, :, None] * self.inv_freq[None, None, :]
        freqs = freqs.reshape(posj.shape[0], -1)
        emb = jnp.concatenate([freqs, freqs], axis=-1)
        return jnp.cos(emb), jnp.sin(emb)

    def __call__(self, patches, grid_thw: tuple[int, int, int]):
        cfg = self.cfg
        ms = cfg.spatial_merge_size
        unit = ms * ms
        window_index, window_ids = get_window_index(
            grid_thw, cfg.window_size, cfg.patch_size, ms
        )
        cos, sin = self.rot_pos_emb(grid_thw, window_index)

        x = self.patch_embed(patches)  # [S, D] in raster(merge) order
        x = x.reshape(-1, unit, x.shape[-1])[jnp.asarray(window_index)].reshape(-1, x.shape[-1])

        # same-window mask for windowed blocks (pre-merge token granularity)
        tok_win = np.repeat(window_ids, unit)
        same = tok_win[:, None] == tok_win[None, :]
        win_bias = jnp.asarray(np.where(same, 0.0, -1e30), jnp.float32)

        for i, blk in enumerate(self.blocks):
            bias = None if i in cfg.fullatt_block_indexes else win_bias
            x = blk(x, cos, sin, bias)
        x = self.merger(x)  # [S/unit, out_hidden]
        # un-permute merged tokens back to raster order
        reverse = np.argsort(window_index)
        return x[jnp.asarray(reverse)]


def _lin(loader, prefix, out_f, in_f, dtype):
    w = jnp.asarray(loader.load(prefix + ".weight", (out_f, in_f)), dtype)
    b = None
    if prefix + ".bias" in loader:
        b = jnp.asarray(loader.load(prefix + ".bias", (out_f,)), dtype)
    return Linear(w, b)


def load_qwen2_5_vl(loader, cfg: Qwen2VLConfig, vcfg: Qwen25VLVisionConfig,
                    dtype=jnp.bfloat16, quant=None):
    d = vcfg.hidden_size
    patch_in = vcfg.in_channels * vcfg.temporal_patch_size * vcfg.patch_size**2
    pw = jnp.asarray(loader.load("visual.patch_embed.proj.weight", (d, patch_in)), dtype)
    blocks = []
    for i in range(vcfg.depth):
        p = f"visual.blocks.{i}."
        blocks.append(Qwen25VLVisionBlock(
            RMSNorm(jnp.asarray(loader.load(p + "norm1.weight", (d,)), dtype), 1e-6),
            _lin(loader, p + "attn.qkv", 3 * d, d, dtype),
            _lin(loader, p + "attn.proj", d, d, dtype),
            RMSNorm(jnp.asarray(loader.load(p + "norm2.weight", (d,)), dtype), 1e-6),
            _lin(loader, p + "mlp.gate_proj", vcfg.intermediate_size, d, dtype),
            _lin(loader, p + "mlp.up_proj", vcfg.intermediate_size, d, dtype),
            _lin(loader, p + "mlp.down_proj", d, vcfg.intermediate_size, dtype),
            vcfg.num_heads, vcfg.hidden_act,
        ))
    merge_dim = d * vcfg.spatial_merge_size**2
    merger = PatchMerger(
        RMSNorm(jnp.asarray(loader.load("visual.merger.ln_q.weight", (d,)), dtype), 1e-6),
        _lin(loader, "visual.merger.mlp.0", merge_dim, merge_dim, dtype),
        _lin(loader, "visual.merger.mlp.2", vcfg.out_hidden_size, merge_dim, dtype),
        merge_dim,
    )
    head_quarter = (d // vcfg.num_heads) // 4
    inv = 1.0 / (10000.0 ** (np.arange(0, head_quarter * 2, 2, dtype=np.float64) / (head_quarter * 2)))
    visual = Qwen25VLVisionTower(PatchEmbed(pw), ModuleList(blocks), merger,
                                 jnp.asarray(inv, jnp.float32), vcfg)
    lm = load_causal_lm(loader, cfg.text, dtype, quant)
    return Qwen2VLForConditionalGeneration(visual, lm, cfg)


def qwen2_5_vl_configs_from_hf(path_or_dict):
    import json, os

    c = path_or_dict
    if not isinstance(c, dict):
        p = os.fspath(c)
        if os.path.isdir(p):
            p = os.path.join(p, "config.json")
        with open(p) as f:
            c = json.load(f)
    from .qwen2_vl import qwen2_vl_config_from_hf

    base = qwen2_vl_config_from_hf(c)
    v = c.get("vision_config", {})
    vcfg = Qwen25VLVisionConfig(
        depth=v.get("depth", 32),
        hidden_size=v.get("hidden_size", 1280),
        out_hidden_size=v.get("out_hidden_size", c.get("hidden_size", 2048)),
        intermediate_size=v.get("intermediate_size", 3420),
        num_heads=v.get("num_heads", 16),
        in_channels=v.get("in_channels", 3),
        patch_size=v.get("patch_size", 14),
        temporal_patch_size=v.get("temporal_patch_size", 2),
        spatial_merge_size=v.get("spatial_merge_size", 2),
        window_size=v.get("window_size", 112),
        fullatt_block_indexes=tuple(v.get("fullatt_block_indexes", (7, 15, 23, 31))),
        hidden_act=v.get("hidden_act", "silu"),
    )
    return base, vcfg
