"""Pallas kernels (interpret mode on CPU) vs scipy/XLA oracles."""

import numpy as np
import pytest

import jax.numpy as jnp
from scipy import ndimage

from comic_text_detector_tpu.ops import pallas_kernels as pk


@pytest.mark.parametrize("seed", range(3))
def test_erode_dilate_match_scipy(seed):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 256, (64, 128), dtype=np.uint8)
    er = np.asarray(pk.erode3x3(jnp.asarray(x)))
    dl = np.asarray(pk.dilate3x3(jnp.asarray(x)))
    ref_er = ndimage.minimum_filter(x, size=3, mode="nearest")
    ref_dl = ndimage.maximum_filter(x, size=3, mode="nearest")
    np.testing.assert_array_equal(er, ref_er)
    np.testing.assert_array_equal(dl, ref_dl)


def test_erode_ellipse_matches_scipy(rng):
    x = rng.integers(0, 256, (32, 64), dtype=np.uint8)
    fp = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool)
    ref = ndimage.minimum_filter(x, footprint=fp, mode="nearest")
    got = np.asarray(pk.erode3x3_ellipse(jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref)


def test_mask_to_u8_truncates(rng):
    m = rng.random((16, 128), dtype=np.float32)
    got = np.asarray(pk.mask_to_u8(jnp.asarray(m)))
    np.testing.assert_array_equal(got, (m * 255).astype(np.uint8))


def test_binarize(rng):
    x = rng.random((16, 128), dtype=np.float32)
    got = np.asarray(pk.binarize(jnp.asarray(x), 0.3))
    np.testing.assert_array_equal(got, (x > 0.3).astype(np.uint8))
