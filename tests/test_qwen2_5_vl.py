"""Qwen2.5-VL parity vs transformers: windowed vision tower + e2e logits."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

IMG = 151655


@pytest.fixture(scope="module")
def tiny_vl25(tmp_path_factory):
    import transformers

    torch.manual_seed(0)
    cfg = transformers.Qwen2_5_VLConfig(
        vocab_size=151936, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        rope_theta=10000.0, tie_word_embeddings=False,
        rope_scaling={"type": "mrope", "mrope_section": [1, 1, 2]},
        vision_config=dict(depth=3, hidden_size=32, out_hidden_size=32,
                           intermediate_size=48, num_heads=4, in_channels=3,
                           patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
                           window_size=56, fullatt_block_indexes=[1]),
    )
    model = transformers.Qwen2_5_VLForConditionalGeneration(cfg).eval()
    d = tmp_path_factory.mktemp("q25vl")
    model.save_pretrained(d)
    return model, str(d)


def _ours(d):
    from mllm_tpu.core.param_loader import SafetensorsLoader
    from mllm_tpu.models.qwen2_5_vl import load_qwen2_5_vl, qwen2_5_vl_configs_from_hf

    base, vcfg = qwen2_5_vl_configs_from_hf(d)
    return load_qwen2_5_vl(SafetensorsLoader(d), base, vcfg, jnp.float32), base


def test_window_index_shape():
    from mllm_tpu.models.qwen2_5_vl import get_window_index

    # window 56px / 14 patch / merge 2 => 2 merged tokens per side
    wi, wid = get_window_index((1, 6, 8), 56, 14, 2)
    assert len(wi) == 3 * 4  # merged grid
    assert sorted(wi.tolist()) == list(range(12))
    assert wid.max() + 1 == 2 * 2  # ceil(3/2) * ceil(4/2)


def test_vision_tower_parity(tiny_vl25):
    hf, d = tiny_vl25
    ours, _ = _ours(d)
    rng = np.random.default_rng(0)
    grid = (1, 6, 8)  # h, w patches: windowed (2x2 merged windows) + remainder
    patches = rng.standard_normal((48, 3 * 2 * 14 * 14)).astype(np.float32)
    with torch.no_grad():
        ref = hf.model.visual(torch.from_numpy(patches),
                              grid_thw=torch.tensor([list(grid)])).numpy()
    out = np.asarray(ours.visual(jnp.asarray(patches), grid))
    np.testing.assert_allclose(out, ref, rtol=3e-3, atol=3e-3)


def test_e2e_logits_parity(tiny_vl25):
    from mllm_tpu.models.qwen2_vl import get_rope_index

    hf, d = tiny_vl25
    ours, cfg = _ours(d)
    rng = np.random.default_rng(1)
    grid = (1, 4, 4)
    patches = rng.standard_normal((16, 3 * 2 * 14 * 14)).astype(np.float32)
    ids = np.array([[10, 20] + [IMG] * 4 + [30]], np.int64)
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids),
                 pixel_values=torch.from_numpy(patches),
                 image_grid_thw=torch.tensor([list(grid)])).logits.numpy()
    pos, delta = get_rope_index(ids[0], [grid], IMG, 151656, 2)
    cache = ours.init_cache(1, 32, jnp.float32)
    logits, _ = ours(jnp.asarray(ids, jnp.int32), cache, patches=jnp.asarray(patches),
                     grid_thw=grid, positions=jnp.asarray(pos[:, None, :]), last_only=False)
    np.testing.assert_allclose(np.asarray(logits), out, rtol=3e-3, atol=3e-3)


def test_vl25_continuous_engine_serving(tiny_vl25):
    """Qwen2.5-VL (windowed vision tower) serves through the continuous
    engine exactly like Qwen2-VL: token-exact vs the offline greedy path."""
    import jax
    from mllm_tpu.generation.engine import ContinuousEngine, collect
    from mllm_tpu.models.qwen2_vl import get_rope_index
    from mllm_tpu.processor.qwen2_vl import Qwen2VLProcessorOutput

    hf, d = tiny_vl25
    ours, _ = _ours(d)
    rng = np.random.default_rng(4)
    grid = (1, 4, 4)
    patches = rng.standard_normal((16, 3 * 2 * 14 * 14)).astype(np.float32)
    ids = np.array([[10, 20, 151652] + [IMG] * 4 + [30, 40, 50]], np.int64)
    pos, delta = get_rope_index(ids[0], [grid], IMG, 151656, 2)

    cache = ours.init_cache(1, 64, jnp.float32)
    logits, cache = ours(jnp.asarray(ids, jnp.int32), cache,
                         patches=jnp.asarray(patches), grid_thw=grid,
                         positions=jnp.asarray(pos[:, None, :]), last_only=True)
    want = []
    next_pos = ids.shape[1] + delta
    for i in range(4):
        t = int(np.argmax(np.asarray(logits)[0, 0]))
        want.append(t)
        p = np.full((3, 1, 1), next_pos + i, np.int32)
        logits, cache = ours(jnp.asarray([[t]], jnp.int32), cache,
                             positions=jnp.asarray(p), last_only=True)

    eng = ContinuousEngine(ours, slots=2, max_len=64, prompt_bucket=16,
                           kv_dtype=jnp.float32, start_thread=False,
                           eos_token_id=-7)
    proc_out = Qwen2VLProcessorOutput(
        input_ids=ids.astype(np.int32), patches=patches, grid_thw=grid,
        position_ids=pos[:, None, :], mrope_delta=delta)
    q = eng.submit_vl(proc_out, 4)
    for _ in range(8):
        eng.step()
    assert collect(q, timeout=5) == want
