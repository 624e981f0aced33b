"""ImageBind tri-modal pipeline: tower shapes, normalization, cross-modal
scoring (reference demo_imagebind flow, SURVEY §2.6)."""

import numpy as np
import jax
import jax.numpy as jnp

from mllm_tpu.models.imagebind import (
    ImageBindConfig,
    ImageBindModel,
    patchify_video,
)

TINY = ImageBindConfig(
    vision_hidden=32, vision_heads=4, vision_ffn=64, patch=14, patch_time=2,
    img_hw=28, time_frames=2, vision_blocks=2,
    text_hidden=32, text_heads=4, text_ffn=64, vocab_size=100, max_positions=16,
    text_blocks=2,
    audio_hidden=32, audio_heads=4, audio_ffn=64, audio_kernel=16, audio_stride=10,
    audio_h=128, audio_w=204, audio_blocks=2, audio_clips=3,
    head_dim=24,
)


def test_tri_modal_scoring():
    model = ImageBindModel.init(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(0)

    # 2 videos (B, C, T, H, W) -> patches
    frames = rng.standard_normal((2, 3, 2, 28, 28)).astype(np.float32)
    patches = patchify_video(frames, 14, 2)
    assert patches.shape == (2, TINY.vision_seq - 1, 3 * 2 * 14 * 14)

    ids = np.array([[5, 9, 2, 99, 0, 0], [7, 3, 99, 0, 0, 0]], np.int32)
    eot = np.array([3, 2], np.int32)

    fb = rng.standard_normal((2 * 3, 1, 128, 204)).astype(np.float32)

    vt, va = model(jnp.asarray(ids), jnp.asarray(eot), jnp.asarray(patches), jnp.asarray(fb))
    assert vt.shape == (2, 2) and va.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(vt).sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(va).sum(-1), 1.0, rtol=1e-5)


def test_tower_embeddings_normalized():
    model = ImageBindModel.init(jax.random.PRNGKey(1), TINY)
    rng = np.random.default_rng(1)
    patches = jnp.asarray(rng.standard_normal((1, TINY.vision_seq - 1, 3 * 2 * 14 * 14)).astype(np.float32))
    v = model.vision_model(patches)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=-1), 1.0, rtol=1e-5)

    ids = jnp.asarray(np.array([[5, 9, 99]], np.int32))
    t = model.text_model(ids, jnp.asarray([2]))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(t), axis=-1), 1.0, rtol=1e-5)

    fb = jnp.asarray(rng.standard_normal((3, 1, 128, 204)).astype(np.float32))
    a = model.audio_model(fb)
    assert a.shape == (1, TINY.head_dim)
    # mean over 3 clips of 20-scaled unit vectors: norm <= 20
    assert np.linalg.norm(np.asarray(a)) <= 20.0 + 1e-4


def test_audio_seq_geometry():
    # (128-16)/10+1=12, (204-16)/10+1=19 -> 228+1
    assert TINY.audio_seq == 12 * 19 + 1
