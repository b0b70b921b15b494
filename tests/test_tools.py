"""Preprocessing tool geometry + audio utilities."""

import numpy as np
import pytest

from syncvsr_tpu.data.audio import AddNoise, pcm_to_float
from syncvsr_tpu.tools.roi import (
    clamp_bbox,
    crop_fixed,
    face_center_crop,
    lip_bbox_from_landmarks,
    vox2_center_crop,
)


def test_lip_bbox_geometry():
    rng = np.random.RandomState(0)
    lm = np.full((478, 3), 0.5, np.float32) + rng.randn(478, 3) * 0.01
    bbox = lip_bbox_from_landmarks(lm, 256, 256)
    l, t, r, b = bbox
    assert r - l == 112 and b - t == 96
    assert abs((l + r) / 2 - 128) < 10 and abs((t + b) / 2 - 128) < 10


def test_clamp_bbox():
    assert clamp_bbox([-5, 10, 107, 106]) == [0.0, 10.0, 112.0, 106.0]
    assert clamp_bbox([150, -3, 262, 93]) == [144.0, 0.0, 256.0, 96.0]


def test_crop_fixed():
    frame = np.arange(256 * 256 * 3, dtype=np.uint8).reshape(256, 256, 3)
    out = crop_fixed(frame, [10, 20, 122, 116])
    assert out.shape == (96, 112, 3)
    out2 = crop_fixed(frame, [-10, 20, 102, 116])  # clamps left
    assert out2.shape == (96, 112, 3)
    with pytest.raises(ValueError):
        crop_fixed(frame, [10, 20, 50, 50])


def test_face_center_crop():
    frame = np.zeros((300, 400, 3), np.uint8)
    out = face_center_crop(frame, 200, 100, 80)
    assert out.shape == (128, 128, 3)
    # clamped at corners
    out2 = face_center_crop(frame, 0, 0, 10)
    assert out2.shape == (128, 128, 3)


def test_vox2_center_crop():
    frame = np.zeros((224, 224, 3), np.uint8)
    assert vox2_center_crop(frame).shape == (128, 128, 3)


def test_pcm_to_float():
    x = np.asarray([0, 16384, -16384, 32767], np.int16).tobytes()
    f = pcm_to_float(x)
    np.testing.assert_allclose(f, [0.0, 0.5, -0.5, 1.0], atol=1e-4)


def test_add_noise_snr():
    rng = np.random.RandomState(0)
    speech = rng.randn(16000).astype(np.float32)
    noise = rng.randn(64000).astype(np.float32)
    an = AddNoise(noise, rng=np.random.RandomState(1))
    noisy = an(speech, snr_target=0.0)
    resid = noisy - speech
    snr = 10 * np.log10(np.mean(speech ** 2) / np.mean(resid ** 2))
    assert abs(snr) < 0.5  # ~0 dB
    clean = an(speech, snr_target=999999)
    np.testing.assert_array_equal(clean, speech)
