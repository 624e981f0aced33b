"""Vision stack parity: processors and CLIP vs transformers (torch CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch


def test_clip_image_processor_matches_hf():
    from transformers import CLIPImageProcessor as HFProc

    from mllm_tpu.processor.image import ClipImageProcessor

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (93, 157, 3), dtype=np.uint8)
    hf = HFProc(size={"shortest_edge": 224}, crop_size={"height": 224, "width": 224},
                do_convert_rgb=True, resample=3)
    expected = hf(images=img, return_tensors="np")["pixel_values"]
    ours = ClipImageProcessor()(img)
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-4)


def test_qwen2vl_processor_matches_hf():
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import Qwen2VLImageProcessor as HFProc

    from mllm_tpu.processor.image import Qwen2VLImageProcessor

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (120, 200, 3), dtype=np.uint8)
    hf = HFProc(min_pixels=4 * 28 * 28, max_pixels=16384 * 28 * 28)
    out = hf(images=[img], return_tensors="np")
    expected = out["pixel_values"]
    grid = out["image_grid_thw"][0]
    patches, thw = Qwen2VLImageProcessor()(img)
    assert tuple(grid) == thw
    np.testing.assert_allclose(patches, expected, rtol=2e-2, atol=2e-2)


def test_smart_resize():
    from mllm_tpu.processor.image import smart_resize

    h, w = smart_resize(120, 200)
    assert h % 28 == 0 and w % 28 == 0
    # huge image gets scaled down under max_pixels
    h, w = smart_resize(8000, 8000)
    assert h * w <= 16384 * 28 * 28


@pytest.fixture(scope="module")
def tiny_clip(tmp_path_factory):
    import transformers

    torch.manual_seed(0)
    cfg = transformers.CLIPConfig(
        text_config_dict=dict(vocab_size=99, hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=4,
                              max_position_embeddings=16, eos_token_id=98),
        vision_config_dict=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                                num_attention_heads=4, image_size=28, patch_size=14),
        projection_dim=24,
    )
    model = transformers.CLIPModel(cfg).eval()
    d = tmp_path_factory.mktemp("clip")
    model.save_pretrained(d)
    return model, str(d)


def test_clip_model_parity(tiny_clip):
    from mllm_tpu.core.param_loader import SafetensorsLoader
    from mllm_tpu.models.clip import clip_config_from_hf, load_clip

    hf, d = tiny_clip
    cfg = clip_config_from_hf(d)
    ours = load_clip(SafetensorsLoader(d), cfg, jnp.float32)

    rng = np.random.default_rng(2)
    pixel = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    ids = np.array([[5, 9, 2, 98, 0, 0], [7, 7, 7, 7, 7, 98]], np.int64)

    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids), pixel_values=torch.from_numpy(pixel),
                 attention_mask=torch.ones_like(torch.from_numpy(ids)))
    ours_logits = ours(jnp.asarray(ids, jnp.int32), jnp.asarray(pixel))
    np.testing.assert_allclose(
        np.asarray(ours_logits), out.logits_per_image.numpy(), rtol=2e-3, atol=2e-3
    )


def test_native_resize_bicubic_bitexact_pil():
    """native/mllm_native.cpp resize_bicubic_u8 reproduces PIL's fixed-point
    resampler bit-for-bit (the reference preprocesses with a CPU bicubic too:
    /root/reference/mllm/models/qwen2_vl/processing_qwen2_vl.hpp)."""
    from PIL import Image

    from mllm_tpu.utils import native

    if not native.available():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(7)
    for ih, iw, oh, ow in [(1024, 1024, 532, 532), (93, 157, 224, 224),
                           (64, 48, 130, 250), (300, 300, 300, 300)]:
        img = rng.integers(0, 256, (ih, iw, 3), dtype=np.uint8)
        ref = np.asarray(Image.fromarray(img).resize((ow, oh), Image.BICUBIC))
        out = native.resize_bicubic(img, oh, ow)
        assert out is not None
        assert np.array_equal(ref, out), (ih, iw, oh, ow)


def test_device_resize_bicubic_matches_pil():
    """On-device bicubic (two coefficient matmuls, PIL-quantized weights) is
    within 1 u8 LSB of PIL on <0.5% of pixels — f32 accumulation vs PIL's
    int32 fixed point is the only difference."""
    from PIL import Image

    from mllm_tpu.processor.image import bicubic_coeff_matrix, device_resize_bicubic

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
    oh, ow = 140, 196
    ref = np.asarray(Image.fromarray(img).resize((ow, oh), Image.BICUBIC)).astype(np.int32)
    v = jnp.asarray(bicubic_coeff_matrix(img.shape[0], oh))
    h = jnp.asarray(bicubic_coeff_matrix(img.shape[1], ow))
    out = np.asarray(device_resize_bicubic(jnp.asarray(img), v, h)).astype(np.int32)
    diff = np.abs(out - ref)
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.005


def test_fixed_resolution_pins_grid():
    """Serving mode: fixed_resolution resizes every image to one shape so
    all requests share ONE compiled vision/admission program."""
    from mllm_tpu.processor.image import Qwen2VLImageProcessor

    import numpy as np

    proc = Qwen2VLImageProcessor(fixed_resolution=(56, 56))
    rng = np.random.default_rng(0)
    for shape in [(30, 99, 3), (400, 200, 3), (56, 56, 3)]:
        patches, grid = proc(rng.integers(0, 255, shape).astype(np.uint8))
        assert grid == (1, 4, 4)
        assert patches.shape == (16, 3 * 2 * 14 * 14)
    import pytest

    with pytest.raises(ValueError):
        Qwen2VLImageProcessor(fixed_resolution=(50, 56))(
            rng.integers(0, 255, (64, 64, 3)).astype(np.uint8))


def test_yuv420_roundtrip_and_payload():
    """I420 wire format: grayscale is near-lossless (U=V=128), smooth color
    images survive chroma subsampling within a few LSB, and the payload is
    exactly half of RGB."""
    from mllm_tpu.processor.image import rgb_to_yuv420, yuv420_to_rgb

    g = np.repeat(np.arange(256, dtype=np.uint8)[None, :], 8, 0)
    gray = np.stack([g, g, g], -1)
    y, u, v = rgb_to_yuv420(gray)
    assert np.abs(u.astype(int) - 128).max() <= 1
    assert np.abs(v.astype(int) - 128).max() <= 1
    back = np.asarray(yuv420_to_rgb(y, u, v))
    assert np.abs(back.astype(int) - gray.astype(int)).max() <= 2

    hh, ww = 64, 64
    xx, yy2 = np.meshgrid(np.linspace(0, 255, ww), np.linspace(0, 255, hh))
    img = np.stack([xx, yy2, (xx + yy2) / 2], -1).astype(np.uint8)
    y, u, v = rgb_to_yuv420(img)
    assert y.shape == (hh, ww) and u.shape == (hh // 2, ww // 2)
    assert (y.size + u.size + v.size) * 2 == img.size  # 1.5 vs 3 bytes/px
    back = np.asarray(yuv420_to_rgb(y, u, v))
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 6


def test_yuv420_odd_dims_rejected():
    from mllm_tpu.processor.image import rgb_to_yuv420

    with pytest.raises(ValueError):
        rgb_to_yuv420(np.zeros((7, 8, 3), np.uint8))
