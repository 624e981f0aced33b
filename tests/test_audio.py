"""Audio frontend tests: WAV IO, resampling, kaldi fbank properties,
ImageBind clip pipeline shapes (reference AudioProcess.cpp behavior)."""

import math
import wave

import numpy as np
import pytest

from mllm_tpu.processor.audio import (
    FbankConfig,
    ImageBindAudioProcessor,
    fbank,
    get_clip_timepoints,
    inverse_mel_scale,
    kaldi_mel_banks,
    mel_scale,
    read_wav,
    resample_poly,
)
from fractions import Fraction


def _write_wav(path, data_int16, sr):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(np.asarray(data_int16, "<i2").tobytes())


def test_wav_roundtrip(tmp_path):
    sr = 16000
    t = np.arange(sr) / sr
    x = (np.sin(2 * np.pi * 440 * t) * 16000).astype(np.int16)
    _write_wav(tmp_path / "a.wav", x, sr)
    y, sr2 = read_wav(tmp_path / "a.wav")
    assert sr2 == sr
    np.testing.assert_allclose(y, x.astype(np.float32), atol=0.5)


def test_resample_tone_preserved():
    sr0, sr1, f = 48000, 16000, 440.0
    t = np.arange(sr0) / sr0
    x = np.sin(2 * np.pi * f * t).astype(np.float32)
    y = resample_poly(x, sr1, sr0)
    assert abs(len(y) - sr1) <= 2
    # dominant frequency must stay at 440 Hz
    spec = np.abs(np.fft.rfft(y[:sr1]))
    peak = np.argmax(spec[10:]) + 10
    assert abs(peak - f) < 3


def test_mel_scale_inverse():
    f = np.array([20.0, 440.0, 8000.0])
    np.testing.assert_allclose(inverse_mel_scale(mel_scale(f)), f, rtol=1e-6)


def test_mel_banks_partition():
    banks = kaldi_mel_banks(80, 512, 16000)
    assert banks.shape == (80, 257)
    # every bank nonnegative with a single peak region
    assert (banks >= 0).all()
    assert (banks.sum(axis=1) > 0).all()


def test_fbank_tone_peak_bin():
    sr = 16000
    t = np.arange(sr) / sr
    for f in [300.0, 1000.0, 4000.0]:
        x = np.sin(2 * np.pi * f * t).astype(np.float32) * 10000
        feats = fbank(x, FbankConfig(num_bins=80, sample_rate=sr))
        assert feats.shape == (98, 80)  # 1 + (16000-400)//160
        peak_bin = np.argmax(feats.mean(axis=0))
        # expected mel bin for frequency f
        mel_low, mel_high = mel_scale(20.0), mel_scale(sr / 2)
        delta = (mel_high - mel_low) / 81
        expect = (mel_scale(f) - mel_low) / delta - 1
        assert abs(peak_bin - expect) <= 2, (f, peak_bin, expect)


def test_clip_timepoints():
    pts = get_clip_timepoints(Fraction(2), Fraction(3), Fraction(10))
    assert len(pts) == 3
    assert pts[0] == (0, 2)
    assert pts[-1] == (8, 10)
    # audio shorter than one clip: all clips at 0
    pts = get_clip_timepoints(Fraction(2), Fraction(3), Fraction(1))
    assert all(s == 0 for s, _ in pts)


def test_imagebind_pipeline_shapes(tmp_path):
    sr = 22050  # force resampling
    x = (np.random.default_rng(0).standard_normal(sr * 5) * 8000).astype(np.int16)
    _write_wav(tmp_path / "b.wav", x, sr)
    out = ImageBindAudioProcessor()(tmp_path / "b.wav")
    assert out.shape == (3, 1, 128, 204)
    assert np.isfinite(out).all()
