"""MoE routing parity vs transformers (Mixtral + Qwen2-MoE tiny configs) —
covers the reference's MiniCPM-MoE/Ling routing capability (SURVEY §2.6)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from mllm_tpu.generation.generate import generate
from mllm_tpu.generation.sampling import SamplingConfig
from mllm_tpu.models.registry import auto_model


def _save_tiny_moe(tmp_path, kind):
    import transformers

    torch.manual_seed(0)
    if kind == "mixtral":
        cfg = transformers.MixtralConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
            num_local_experts=4, num_experts_per_tok=2, rope_theta=10000.0,
        )
        model = transformers.MixtralForCausalLM(cfg)
    else:
        cfg = transformers.Qwen2MoeConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
            num_experts=4, num_experts_per_tok=2, moe_intermediate_size=48,
            shared_expert_intermediate_size=64, norm_topk_prob=False,
            decoder_sparse_step=1, mlp_only_layers=[], rope_theta=10000.0,
        )
        model = transformers.Qwen2MoeForCausalLM(cfg)
    model = model.eval()
    d = tmp_path / kind
    model.save_pretrained(d)
    return model, d


@pytest.mark.parametrize("kind", ["mixtral", "qwen2_moe"])
def test_moe_logits_and_greedy_parity(tmp_path, kind):
    hf, d = _save_tiny_moe(tmp_path, kind)
    ours, _, cfg = auto_model(str(d), dtype=jnp.float32, with_tokenizer=False)
    assert cfg.num_experts == 4

    ids = np.array([[3, 17, 42, 99, 7, 23, 56, 11]], np.int64)
    with torch.no_grad():
        hf_logits = hf(torch.from_numpy(ids)).logits.numpy()
    cache = ours.init_cache(1, 32, jnp.float32)
    our_logits, _ = ours(jnp.asarray(ids, jnp.int32), cache, last_only=False)
    np.testing.assert_allclose(np.asarray(our_logits), hf_logits, rtol=3e-3, atol=3e-3)

    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(ids), max_new_tokens=6, do_sample=False,
                             eos_token_id=None, pad_token_id=0)[0, ids.shape[1]:].numpy()
    cache = ours.init_cache(1, 32, jnp.float32)
    res, _ = generate(ours, ids.astype(np.int32), cache, SamplingConfig(max_new_tokens=6),
                      eos_token_id={-1}, bucket=8)
    np.testing.assert_array_equal(np.asarray(res.tokens), hf_out)


def test_moe_decode_single_token(tmp_path):
    """Decode path (T=1) exercises ragged_dot with tiny group sizes."""
    hf, d = _save_tiny_moe(tmp_path, "mixtral")
    ours, _, cfg = auto_model(str(d), dtype=jnp.float32, with_tokenizer=False)
    cache = ours.init_cache(1, 16, jnp.float32)
    lg, cache = ours(jnp.asarray([[5, 7, 9]], jnp.int32), cache, last_only=True)
    lg2, cache = ours(jnp.asarray([[int(np.argmax(np.asarray(lg)))]], jnp.int32), cache)
    assert np.isfinite(np.asarray(lg2)).all()


def test_quant_moe_matches_dequant_oracle():
    """QuantMoEMLP == MoEMLP run on the dequantized int8 expert weights."""
    import jax

    from mllm_tpu.core.config import TextConfig
    from mllm_tpu.models.moe import MoEMLP, QuantMoEMLP

    cfg = TextConfig(vocab_size=64, hidden_size=64, intermediate_size=96,
                     num_hidden_layers=1, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=64,
                     eos_token_id=-2, num_experts=8, num_experts_per_tok=2,
                     moe_shared_expert_size=32)
    moe = MoEMLP.init(jax.random.PRNGKey(3), cfg, jnp.float32)
    qmoe = QuantMoEMLP.from_moe(moe)

    # oracle: base MoE over the dequantized weights
    deq = moe.replace(
        w_gate=qmoe.w_gate.astype(jnp.float32) * qmoe.s_gate[:, None, :],
        w_up=qmoe.w_up.astype(jnp.float32) * qmoe.s_up[:, None, :],
        w_down=qmoe.w_down.astype(jnp.float32) * qmoe.s_down[:, None, :],
    )
    x = jnp.asarray(np.random.default_rng(7).standard_normal((2, 5, 64)), jnp.float32)
    got = np.asarray(qmoe(x))
    ref = np.asarray(deq(x))
    # both paths route identically (same router); bf16 ragged_dot inputs are
    # the only loss vs the f32 oracle
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_quantize_model_quantizes_moe_experts():
    """quantize_model swaps MoEMLP -> QuantMoEMLP (int8 experts) and the
    quantized model still decodes."""
    import jax

    from mllm_tpu.core.config import TextConfig
    from mllm_tpu.models.moe import MoEMLP, QuantMoEMLP
    from mllm_tpu.models.transformer import CausalLM
    from mllm_tpu.nn.module import ModuleList
    from mllm_tpu.ops.quantize_model import quantize_model

    cfg = TextConfig(vocab_size=64, hidden_size=64, intermediate_size=96,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=64,
                     eos_token_id=-2, num_experts=4, num_experts_per_tok=2)
    model = CausalLM.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    model = model.replace(blocks=ModuleList([
        b.replace(mlp=MoEMLP.init(jax.random.fold_in(jax.random.PRNGKey(1), i),
                                  cfg, jnp.float32))
        for i, b in enumerate(model.blocks.mods)]))
    q = quantize_model(model, "int8", min_size=1, quant_embed_head=False)
    mlps = [b.mlp for b in q.blocks.mods]
    assert any(isinstance(m, QuantMoEMLP) for m in mlps), [type(m) for m in mlps]
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 64, (1, 6)), jnp.int32)
    logits, _ = q(ids, q.init_cache(1, 32, jnp.float32))
    assert np.isfinite(np.asarray(logits)).all()


def test_moe_load_with_quant(tmp_path):
    """auto_model(quant='int8') on a MoE checkpoint quantizes the expert
    stacks (QuantMoEMLP) and the logits stay close to the bf16 load."""
    from mllm_tpu.models.moe import QuantMoEMLP

    hf, d = _save_tiny_moe(tmp_path, "qwen2_moe")
    ours, _, cfg = auto_model(str(d), dtype=jnp.float32, with_tokenizer=False)
    q, _, _ = auto_model(str(d), dtype=jnp.float32, quant="int8", with_tokenizer=False)
    assert all(isinstance(b.mlp, QuantMoEMLP) for b in q.blocks.mods), \
        [type(b.mlp).__name__ for b in q.blocks.mods]
    ids = np.array([[3, 17, 42, 99, 7, 23, 56, 11]], np.int32)
    lf, _ = ours(jnp.asarray(ids), ours.init_cache(1, 32, jnp.float32), last_only=False)
    lq, _ = q(jnp.asarray(ids), q.init_cache(1, 32, jnp.float32), last_only=False)
    agree = float(jnp.mean((jnp.argmax(lf, -1) == jnp.argmax(lq, -1)).astype(jnp.float32)))
    assert agree >= 0.75, agree
