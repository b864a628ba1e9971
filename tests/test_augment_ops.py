"""Augmentation ops vs cv2 oracles."""

import numpy as np
import pytest

import cv2

from comic_text_detector_tpu.data import augment as aug


@pytest.mark.parametrize("seed", range(3))
def test_bgr_hsv_roundtrip_matches_cv2(seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    h, s, v = aug._bgr_to_hsv_u8(img)
    ref = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
    # hue is circular mod 180; saturation/value direct
    dh = np.minimum(np.abs(h.astype(int) - ref[..., 0].astype(int)),
                    180 - np.abs(h.astype(int) - ref[..., 0].astype(int)))
    assert np.median(dh) <= 1 and (dh <= 2).mean() > 0.97
    assert np.abs(s.astype(int) - ref[..., 1].astype(int)).max() <= 2
    np.testing.assert_array_equal(v, ref[..., 2])
    back = aug._hsv_to_bgr_u8(ref[..., 0], ref[..., 1], ref[..., 2])
    ref_back = cv2.cvtColor(ref, cv2.COLOR_HSV2BGR)
    assert np.abs(back.astype(int) - ref_back.astype(int)).max() <= 3


def test_augment_hsv_close_to_cv2_pipeline(rng):
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    gains = np.array([1.1, 0.9, 1.05])

    # oracle: the reference algorithm with cv2 (seg_dataset.py:37-50)
    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
    x = np.arange(0, 256, dtype=np.float64)
    lut_hue = ((x * gains[0]) % 180).astype(np.uint8)
    lut_sat = np.clip(x * gains[1], 0, 255).astype(np.uint8)
    lut_val = np.clip(x * gains[2], 0, 255).astype(np.uint8)
    im_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val)))
    ref = cv2.cvtColor(im_hsv, cv2.COLOR_HSV2BGR)

    class FixedRng:
        def uniform(self, a, b, n):
            return gains - 1  # with hgain=sgain=vgain=1, r == gains

    got = img.copy()
    aug.augment_hsv(got, hgain=1, sgain=1, vgain=1, rng=FixedRng())
    d = np.abs(got.astype(int) - ref.astype(int))
    assert np.median(d) <= 2 and (d <= 6).mean() > 0.95


def test_flip_and_negate(rng):
    img = rng.integers(0, 256, (8, 10, 3), dtype=np.uint8)
    np.testing.assert_array_equal(aug.flip_lr(img), img[:, ::-1])
    np.testing.assert_array_equal(aug.negate(img), 255 - img)


def test_rotate_image_and_polys():
    img = np.zeros((60, 80, 3), np.uint8)
    img[20:30, 30:50] = 255
    ann = np.array([[[30 / 80, 20 / 60], [50 / 80, 20 / 60], [50 / 80, 30 / 60], [30 / 80, 30 / 60]]])
    out, ann2 = aug.rotate_image_and_polys(img, ann, 45)
    assert out.shape[0] > 60 and out.shape[1] > 80  # expanded
    assert ann2.min() >= 0 and ann2.max() <= 1.0 + 1e-6
    # rotated poly still covers the white patch centroid
    ys, xs = np.nonzero(out[..., 0] > 127)
    cx, cy = xs.mean() / out.shape[1], ys.mean() / out.shape[0]
    pc = ann2[0].mean(0)
    assert abs(pc[0] - cx) < 0.08 and abs(pc[1] - cy) < 0.08
