"""Device thresholding ops vs the parity-tested host implementations."""

import numpy as np

import jax.numpy as jnp

from comic_text_detector_tpu.ops import thresholding as dev
from comic_text_detector_tpu.utils import imgproc as host


def test_histogram_matches_numpy(rng):
    img = rng.integers(0, 256, (64, 80), dtype=np.uint8)
    got = np.asarray(dev.histogram256(jnp.asarray(img)))
    ref = np.bincount(img.reshape(-1), minlength=256)
    np.testing.assert_array_equal(got, ref)
    mask = rng.random((64, 80)) > 0.5
    got_m = np.asarray(dev.histogram256(jnp.asarray(img), jnp.asarray(mask)))
    ref_m = np.bincount(img[mask], minlength=256)
    np.testing.assert_array_equal(got_m, ref_m)


def test_otsu_matches_host(rng):
    img = np.concatenate([rng.normal(70, 9, 2500), rng.normal(200, 11, 2500)])
    img = img.clip(0, 255).astype(np.uint8).reshape(50, 100)
    t_host, b_host = host.otsu_threshold(img)
    t_dev, b_dev = dev.otsu_threshold(jnp.asarray(img))
    assert abs(int(t_dev) - t_host) <= 1
    assert (np.asarray(b_dev) == b_host).mean() > 0.999


def test_in_range_and_gray_and_xor(rng):
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(dev.in_range(jnp.asarray(img[..., 0]), 50, 180)),
        host.in_range(img[..., 0], 50, 180),
    )
    np.testing.assert_array_equal(np.asarray(dev.bgr2gray(jnp.asarray(img))), host.bgr2gray(img))
    a = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    b = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    assert int(dev.xor_sum(jnp.asarray(a), jnp.asarray(b))) == int(np.bitwise_xor(a, b).sum())
