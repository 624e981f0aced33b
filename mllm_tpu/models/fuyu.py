"""Fuyu — Persimmon LM with linear patch embedding (no vision tower).

Counterpart of /root/reference/mllm/models/fuyu/ (modeling_fuyu.hpp, the
FuyuGatherEmbd op): raw image patches project straight into the LM embedding
space and splice at |SPEAKER| (image placeholder) positions.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import TextConfig, from_hf_config
from ..kv.cache import KVCache
from ..nn.layers import Linear
from ..nn.module import Module
from .loading import NameMap, load_causal_lm
from .transformer import CausalLM


class PersimmonNameMap(NameMap):
    """Persimmon/Fuyu weight names (language_model.* prefix, fused
    interleaved qkv, dense_h_to_4h MLP)."""

    token_embd = "language_model.model.embed_tokens.weight"
    final_norm = "language_model.model.final_layernorm"
    lm_head = "language_model.lm_head.weight"
    blk = "language_model.model.layers.{i}."
    attn_qkv_interleaved = "self_attn.query_key_value"
    attn_o = "self_attn.dense"
    q_norm = "self_attn.q_layernorm.weight"
    k_norm = "self_attn.k_layernorm.weight"
    gate = "mlp.dense_h_to_4h"
    up = "__none__"
    down = "mlp.dense_4h_to_h"


def load_fuyu(loader, cfg: FuyuConfig, dtype=jnp.float32, quant=None):
    lm = load_causal_lm(loader, cfg.text, dtype, quant, names=PersimmonNameMap())
    pin = cfg.num_channels * cfg.patch_size**2
    w = jnp.asarray(loader.load("vision_embed_tokens.weight", (cfg.text.hidden_size, pin)), dtype)
    b = None
    if "vision_embed_tokens.bias" in loader:
        b = jnp.asarray(loader.load("vision_embed_tokens.bias", (cfg.text.hidden_size,)), dtype)
    return FuyuForCausalLM(Linear(w, b), lm, cfg)


@dataclass(frozen=True)
class FuyuConfig:
    text: TextConfig = TextConfig()
    patch_size: int = 30
    num_channels: int = 3
    image_token_id: int = 71011  # |SPEAKER|


class FuyuForCausalLM(Module):
    def __init__(self, vision_embed: Linear, lm: CausalLM, cfg: FuyuConfig):
        self.vision_embed = vision_embed  # [hidden, C*ps*ps]
        self.lm = lm
        self.cfg = cfg

    def init_cache(self, batch, max_len, dtype=jnp.bfloat16) -> KVCache:
        return self.lm.init_cache(batch, max_len, dtype)

    def __call__(self, input_ids, cache, image_patches=None, last_only=True):
        """image_patches: [P, C*ps*ps] flattened patch rows (reference
        FuyuPreProcess patchify)."""
        x = self.lm.embed_tokens(input_ids)
        if image_patches is not None:
            emb = self.vision_embed(image_patches)  # [P, hidden]
            is_img = input_ids == self.cfg.image_token_id
            idx = jnp.clip(jnp.cumsum(is_img.astype(jnp.int32), axis=-1) - 1, 0, emb.shape[0] - 1)
            x = jnp.where(is_img[..., None], emb[idx].astype(x.dtype), x)
        hidden, cache = self.lm.hidden_states(None, cache, inputs_embeds=x)
        if last_only:
            hidden = hidden[:, -1:, :]
        return self.lm.logits(hidden), cache


def fuyu_config_from_hf(path_or_dict) -> FuyuConfig:
    import json, os

    c = path_or_dict
    if not isinstance(c, dict):
        p = os.fspath(c)
        if os.path.isdir(p):
            p = os.path.join(p, "config.json")
        with open(p) as f:
            c = json.load(f)
    t = dict(c.get("text_config", {}))
    for k in ("vocab_size", "hidden_size", "intermediate_size", "num_hidden_layers",
              "num_attention_heads", "num_key_value_heads", "max_position_embeddings",
              "rope_theta", "hidden_act", "partial_rotary_factor", "layer_norm_eps"):
        if k in c and k not in t:
            t[k] = c[k]
    text = from_hf_config(t, model_type=t.get("model_type", "persimmon"))
    text = text.replace(
        norm_type="layernorm",
        rope_partial=float(t.get("partial_rotary_factor", 0.5)),
        attention_bias=True, o_proj_bias=True, mlp_bias=True,
        rms_norm_eps=float(t.get("layer_norm_eps", 1e-5)),
        hidden_act=t.get("hidden_act", "relu2"),
        qk_norm=bool(t.get("qk_layernorm", True)),
    )
    return FuyuConfig(
        text=text,
        patch_size=c.get("patch_size", 30),
        num_channels=c.get("num_channels", 3),
        image_token_id=c.get("image_token_id", 71011),
    )


def patchify_image(img_chw: np.ndarray, patch: int = 30) -> np.ndarray:
    """[C, H, W] -> [nH*nW, C*ps*ps] (reference FuyuPreProcess patch layout)."""
    c, h, w = img_chw.shape
    nh, nw = h // patch, w // patch
    x = img_chw[:, : nh * patch, : nw * patch].reshape(c, nh, patch, nw, patch)
    x = x.transpose(1, 3, 2, 4, 0)  # nh, nw, ps, ps, C
    return x.reshape(nh * nw, patch * patch * c)
