"""Coverage round-out: base tokenizer surface, config edge cases, runtime
switches, quantize_model skip rules."""

import numpy as np
import jax.numpy as jnp
import pytest

from mllm_tpu.core.config import from_hf_config
from mllm_tpu.tokenizers.base import Tokenizer


class _Stub(Tokenizer):
    def encode_ordinary(self, text):
        return [len(w) for w in text.split()]


def test_tokenizer_base_surface():
    t2i = {"<eos>": 0, "a": 1}
    tok = _Stub(t2i, ["<eos>", "a"], {"<eos>": 0})
    tok.bos_token_id = 1
    ids = tok.encode("ab abc<eos>x", bos=True)
    assert ids[0] == 1 and 0 in ids
    arr = tok.tokens2input([1, 2, 3])
    assert arr.shape == (1, 3) and arr.dtype == np.int32
    assert tok.vocab_size == 2
    # chat template fallback
    s = tok.apply_chat_template([{"role": "user", "content": "hi"}])
    assert "user" in s and s.endswith("assistant\n")


def test_from_hf_config_eos_list_and_head_dim():
    cfg = from_hf_config({"model_type": "llama", "eos_token_id": [1, 2],
                          "hidden_size": 64, "num_attention_heads": 4})
    assert cfg.eos_token_id == (1, 2)
    assert cfg.head_dim_ == 16
    cfg2 = from_hf_config({"model_type": "llama", "head_dim": 32,
                           "hidden_size": 64, "num_attention_heads": 4})
    assert cfg2.head_dim_ == 32


def test_runtime_env_overrides(monkeypatch):
    from mllm_tpu.utils import runtime

    monkeypatch.setenv("MLLM_FORCE_XLA", "1")
    assert runtime.on_tpu() is False
    monkeypatch.delenv("MLLM_FORCE_XLA")
    monkeypatch.setenv("MLLM_FORCE_PALLAS", "1")
    assert runtime.on_tpu() is True


def test_quantize_model_skip_rules():
    import jax
    from mllm_tpu.nn.layers import Linear, QuantLinear
    from mllm_tpu.nn.module import Module
    from mllm_tpu.ops.quantize_model import quantize_model

    class M(Module):
        def __init__(self, big, small):
            self.big = big
            self.small = small

    rng = np.random.default_rng(0)
    m = M(
        Linear(jnp.asarray(rng.standard_normal((512, 256)).astype(np.float32)), None),
        Linear(jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32)), None),
    )
    q = quantize_model(m, "int8", min_size=1 << 14, quant_embed_head=False)
    assert isinstance(q.big, QuantLinear)
    assert isinstance(q.small, Linear)  # below min_size: stays dense


def test_quant_kv_reset_and_advance():
    from mllm_tpu.kv.cache import QuantKVCache

    c = QuantKVCache.init(1, 1, 8, 1, 4)
    c = c.advance(5)
    assert int(c.pos) == 5
    c = c.reset()
    assert int(c.pos) == 0
    # max_len rounds up to 128 (fused decode kernel tile alignment)
    assert c.max_len == 128 and c.n_layers == 1


def test_logging(capsys, monkeypatch):
    import importlib
    import mllm_tpu.utils.log as L

    monkeypatch.setenv("MLLM_LOG_JSON", "1")
    importlib.reload(L)
    L.log_info("engine up", batch=8, model="qwen2")
    err = capsys.readouterr().err
    import json as _json

    rec = _json.loads(err.strip().splitlines()[-1])
    assert rec["msg"] == "engine up" and rec["batch"] == 8
    monkeypatch.delenv("MLLM_LOG_JSON")
    importlib.reload(L)


def test_init_stacked_unstack_roundtrip():
    """init_stacked (O(1)-trace vmapped init) must interoperate with the
    unrolled path: unstack -> stack preserves every leaf bit-for-bit and the
    forward runs."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mllm_tpu.core.config import TextConfig
    from mllm_tpu.models.transformer import CausalLM

    cfg = TextConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=3, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=64,
                     eos_token_id=-5)
    m = CausalLM.init_stacked(jax.random.PRNGKey(0), cfg)
    assert getattr(m, "stacked_blocks", None) is not None
    un = m.unstack()
    assert len(un.blocks.mods) == 3
    assert un.blocks.mods[1].attn.layer_idx == 1
    re = un.stack()
    for a, b in zip(jax.tree.leaves(m), jax.tree.leaves(re)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ids = np.arange(6, dtype=np.int32)[None, :] % 64
    cache_s = m.init_cache(1, 16, jnp.float32)
    ls, _ = m(ids, cache_s)
    cache_u = un.init_cache(1, 16, jnp.float32)
    lu, _ = un(ids, cache_u)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(lu), atol=1e-5)


def test_fuse_projections_exact():
    """Fused qkv/gateup must be bit-compatible with split projections, both
    in float and after int8/int4 quantization (per-output-channel scales
    commute with output concatenation)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mllm_tpu.core.config import TextConfig
    from mllm_tpu.models.transformer import CausalLM
    from mllm_tpu.ops.quantize_model import fuse_projections, quantize_model

    cfg = TextConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=64,
                     eos_token_id=-5)
    m = CausalLM.init(jax.random.PRNGKey(1), cfg)
    fused = fuse_projections(m)
    assert fused.blocks.mods[0].attn.qkv_proj is not None
    assert fused.blocks.mods[0].mlp.gateup_proj is not None

    ids = np.arange(10, dtype=np.int32)[None, :] % 64

    def logits(mm):
        cache = mm.init_cache(1, 16, jnp.float32)
        out, _ = mm(ids, cache, last_only=False)
        return np.asarray(out)

    np.testing.assert_allclose(logits(fused), logits(m), rtol=0, atol=1e-6)

    for mode in ("int8", "int4"):
        qs = quantize_model(m, mode, min_size=1)
        qf = quantize_model(fused, mode, min_size=1)
        np.testing.assert_allclose(logits(qf), logits(qs), rtol=0, atol=1e-5)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_int4_tied_embed_head(impl, monkeypatch):
    """quant_embed_head=True on a tied-embedding model quantizes the lm_head
    projection under BOTH int4 impls: the n-axis XLA head and the Pallas
    group-kernel head (vocab padded to 512, padded logits sliced off).
    Logits must track the float head within int4 group-quant error and the
    embedding lookup table must stay float-exact."""
    import jax
    from mllm_tpu.core.config import TextConfig
    from mllm_tpu.models.transformer import CausalLM
    from mllm_tpu.ops.quantize_model import (Int4EmbedHead,
                                             Int4EmbedHeadPallas,
                                             quantize_model)

    monkeypatch.setenv("MLLM_INT4_IMPL", impl)
    cfg = TextConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=1, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=64,
                     eos_token_id=-5)
    m = CausalLM.init(jax.random.PRNGKey(3), cfg)
    assert m.lm_head is None  # tied
    q = quantize_model(m, "int4", min_size=1, quant_embed_head=True)
    want = Int4EmbedHead if impl == "xla" else Int4EmbedHeadPallas
    assert type(q.embed_tokens) is want

    ids = np.arange(12, dtype=np.int32)[None, :] % 96
    np.testing.assert_array_equal(np.asarray(q.embed_tokens(ids)),
                                  np.asarray(m.embed_tokens(ids)))
    x = np.asarray(m.embed_tokens(ids), np.float32)
    ref = np.asarray(m.embed_tokens.as_lm_head(jnp.asarray(x)))
    got = np.asarray(q.embed_tokens.as_lm_head(jnp.asarray(x)))
    assert got.shape == ref.shape  # pallas pad sliced back to true vocab
    err = np.abs(got - ref).max()
    scale = np.abs(ref).max()
    assert err < 0.05 * scale, (err, scale)


def test_int4_mixed_placement(monkeypatch):
    """attn_quant="int8" quantizes attention projections to int8 (no Pallas
    call boundary on TPU) while the MLP/head go int4 — logits must track the
    all-int8 model within group-quant error, and the class placement must be
    exactly int8-in-attention / int4-elsewhere."""
    import jax
    from mllm_tpu.core.config import TextConfig
    from mllm_tpu.models.transformer import CausalLM
    from mllm_tpu.nn.layers import Int4Linear, QuantLinear
    from mllm_tpu.ops import quantize_model as qmod
    from mllm_tpu.ops.quantize_model import fuse_projections, quantize_model

    monkeypatch.setenv("MLLM_INT4_IMPL", "pallas")
    # tiny fixture: disable the size-based int8 fallback so placement is
    # decided by attn_quant alone (at flagship size INT4_MIN_PARAMS already
    # routes the attention projections to int8 on the Pallas path)
    monkeypatch.setattr(qmod, "INT4_MIN_PARAMS", 1)
    cfg = TextConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=64,
                     eos_token_id=-5)
    m = fuse_projections(CausalLM.init(jax.random.PRNGKey(2), cfg))
    q = quantize_model(m, "int4", min_size=1, attn_quant="int8",
                       quant_embed_head=False)
    attn = q.blocks.mods[0].attn
    assert type(attn.qkv_proj) is QuantLinear
    assert type(attn.o_proj) is QuantLinear
    mlp = q.blocks.mods[0].mlp
    down = getattr(mlp, "down_proj", None)
    assert down is None or type(down) is Int4Linear \
        or type(mlp).__name__ == "FusedInt4MLP"

    ids = np.arange(10, dtype=np.int32)[None, :] % 64
    def logits(mm):
        cache = mm.init_cache(1, 16, jnp.float32)
        out, _ = mm(ids, cache, last_only=False)
        return np.asarray(out)
    ref = logits(quantize_model(m, "int8", min_size=1, quant_embed_head=False))
    got = logits(q)
    err = np.abs(got - ref).max()
    assert err < 0.15 * max(np.abs(ref).max(), 1e-6), err


def test_ci_smoke_tool():
    """tools/ci.py (device-farm smoke runner counterpart) runs all stages
    green on the test backend and emits one JSON report on stdout."""
    import contextlib
    import importlib.util
    import io
    import json
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "mllm_ci", pathlib.Path(__file__).parent.parent / "tools" / "ci.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = mod.main([])
    report = json.loads(buf.getvalue())
    assert rc == 0 and report["ok"], report
    assert set(report["stages"]) >= {"device", "build", "generate",
                                     "int8_decode", "tokenizer",
                                     "image_preprocess", "kv_cache"}
