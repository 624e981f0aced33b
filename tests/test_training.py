"""Training subsystem: optax train step, LoRA adapters, orbax checkpoints."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from mllm_tpu.core.config import TextConfig
from mllm_tpu.models.transformer import CausalLM
from mllm_tpu.training import (LoRALinear, TrainState, add_lora,
                               lora_params_filter, make_train_step,
                               merge_lora, restore_checkpoint,
                               save_checkpoint)


def _tiny():
    cfg = TextConfig(
        vocab_size=101, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=64,
        eos_token_id=-5,
    )
    return CausalLM.init(jax.random.PRNGKey(0), cfg)


def _batch(seed=0, b=2, s=12):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, 101, (b, s)), jnp.int32)
    return ids, jnp.roll(ids, -1, axis=1)


def test_full_finetune_loss_decreases():
    model = _tiny()
    tx = optax.adamw(3e-3)
    state = TrainState.create(model, tx)
    step = make_train_step(tx)
    ids, tgt = _batch()
    losses = []
    for _ in range(6):
        state, loss = step(state, ids, tgt)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert int(state.step) == 6


def test_lora_starts_identical_and_trains_only_adapters():
    model = _tiny()
    lora = add_lora(model, jax.random.PRNGKey(7), rank=4)
    assert any(isinstance(b.attn.q_proj, LoRALinear) for b in lora.blocks)
    ids, tgt = _batch(1)
    # B = 0 -> wrapped model starts exactly equal to the base
    np.testing.assert_allclose(float(lora.loss(ids, tgt)), float(model.loss(ids, tgt)),
                               rtol=1e-6)

    tx = optax.adamw(5e-3)
    state = TrainState.create(lora, tx, trainable=lora_params_filter)
    step = make_train_step(tx, trainable=lora_params_filter)
    l0 = float(lora.loss(ids, tgt))
    for _ in range(8):
        state, loss = step(state, ids, tgt)
    assert float(loss) < l0  # adapters learned something

    # frozen base is bit-identical; adapters moved
    base_w0 = np.asarray(model.blocks[0].attn.q_proj.weight)
    np.testing.assert_array_equal(
        np.asarray(state.model.blocks[0].attn.q_proj.weight), base_w0)
    assert np.abs(np.asarray(state.model.blocks[0].attn.q_proj.lora_b)).max() > 0

    # merge: plain-Linear model with the same loss as the adapted one
    merged = merge_lora(state.model)
    assert not any(isinstance(b.attn.q_proj, LoRALinear) for b in merged.blocks)
    np.testing.assert_allclose(float(merged.loss(ids, tgt)),
                               float(state.model.loss(ids, tgt)), rtol=1e-5, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    model = _tiny()
    tx = optax.adamw(1e-3)
    state = TrainState.create(model, tx)
    step = make_train_step(tx)
    ids, tgt = _batch(2)
    state, _ = step(state, ids, tgt)
    save_checkpoint(str(tmp_path / "ckpt"), state)

    template = TrainState.create(_tiny(), tx)
    restored = restore_checkpoint(str(tmp_path / "ckpt"), template)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training resumes identically from the restored state
    s1, l1 = step(state, ids, tgt)
    s2, l2 = step(restored, ids, tgt)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_save_safetensors_roundtrip(tmp_path):
    """Fine-tune -> merge -> save -> auto_model reload: the redeploy loop.
    Saved checkpoint loads like any HF dir and reproduces the merged
    model's logits."""
    import torch
    import transformers

    from mllm_tpu.core.param_loader import save_safetensors_model
    from mllm_tpu.models.registry import auto_model

    torch.manual_seed(3)
    hf_cfg = transformers.Qwen2Config(
        vocab_size=101, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=64,
        rope_theta=10000.0, tie_word_embeddings=False, bos_token_id=0, eos_token_id=1)
    transformers.Qwen2ForCausalLM(hf_cfg).save_pretrained(tmp_path / "src")
    model, _, _ = auto_model(str(tmp_path / "src"), dtype=jnp.float32,
                             with_tokenizer=False)

    lora = add_lora(model, jax.random.PRNGKey(1), rank=4)
    tx = optax.adamw(5e-3)
    state = TrainState.create(lora, tx, trainable=lora_params_filter)
    step = make_train_step(tx, trainable=lora_params_filter)
    ids, tgt = _batch(4)
    for _ in range(3):
        state, _ = step(state, ids, tgt)
    merged = merge_lora(state.model)

    save_safetensors_model(str(tmp_path / "out"), merged, str(tmp_path / "src"))
    reloaded, _, _ = auto_model(str(tmp_path / "out"), dtype=jnp.float32,
                                with_tokenizer=False)
    want, _ = merged(ids, merged.init_cache(2, 32, jnp.float32), last_only=False)
    got, _ = reloaded(ids, reloaded.init_cache(2, 32, jnp.float32), last_only=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_remat_grads_match():
    """jax.checkpoint rematerialization: identical loss AND gradients on
    both the unrolled and lax.scan-stacked trunks (memory-for-FLOPs trade
    must not change the math)."""
    model = _tiny()
    ids, tgt = _batch(5)

    def g(m, remat):
        return jax.grad(lambda mm: mm.loss(ids, tgt, remat=remat))(m)

    for m in (model, model.stack()):
        l0 = float(m.loss(ids, tgt))
        l1 = float(m.loss(ids, tgt, remat=True))
        np.testing.assert_allclose(l0, l1, rtol=1e-6)
        g0, g1 = g(m, False), g(m, True)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
