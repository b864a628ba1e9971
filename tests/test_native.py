"""ctdnative C++ kernels vs scipy / host-geometry oracles."""

import numpy as np
import pytest
from scipy import ndimage

from comic_text_detector_tpu.native import available, get_native
from comic_text_detector_tpu.ops import geometry as geo

pytestmark = pytest.mark.skipif(not available(), reason="ctdnative not built")


@pytest.mark.parametrize("connectivity", [4, 8])
@pytest.mark.parametrize("seed", range(4))
def test_label_components_matches_scipy(seed, connectivity):
    rng = np.random.default_rng(seed)
    mask = (rng.random((64, 96)) > 0.6).astype(np.uint8)
    native = get_native()
    labels, n = native.label_components(mask, connectivity)
    structure = np.ones((3, 3)) if connectivity == 8 else None
    ref, n_ref = ndimage.label(mask, structure=structure)
    assert n == n_ref
    pairs = {}
    m = mask > 0
    for a, b in zip(labels[m], ref[m]):
        assert pairs.setdefault(a, b) == b
    assert len(pairs) == n_ref
    assert (labels[~m] == 0).all()


@pytest.mark.parametrize("seed", range(4))
def test_component_rects_match_geometry(seed):
    rng = np.random.default_rng(seed)
    mask = np.zeros((128, 128), np.uint8)
    prob = np.zeros((128, 128), np.float32)
    for _ in range(3):
        x, y = rng.integers(5, 70, 2)
        w, h = rng.integers(10, 40, 2)
        mask[y : y + h, x : x + w] = 1
        prob[y : y + h, x : x + w] = 0.8
    native = get_native()
    labels, n = native.label_components(mask, 8)
    boxes, ssides, scores = native.component_min_area_rects(labels, n, prob, 1.5)
    assert boxes.shape == (n, 4, 2)
    for i in range(1, n + 1):
        ys, xs = np.nonzero(labels == i)
        pts = np.stack([xs, ys], 1).astype(np.float64)
        ref_box, sside = geo.mini_box(pts)
        _, (rw, rh) = geo.min_area_rect(pts)
        d = rw * rh * 1.5 / (2 * (rw + rh))
        ref_grown = geo.order_rect_points(geo.inflate_rect(ref_box, d))
        got = geo.order_rect_points(boxes[i - 1])
        assert np.abs(got - ref_grown).max() < 1.0, f"comp {i}\n{got}\n{ref_grown}"
        assert abs(ssides[i - 1] - sside) < 1e-6
        assert abs(scores[i - 1] - 0.8) < 1e-5


def test_native_speed_sanity():
    """Native CC at 1024² should run in single-digit ms on this host."""
    import time

    rng = np.random.default_rng(0)
    mask = (rng.random((1024, 1024)) > 0.6).astype(np.uint8)
    native = get_native()
    native.label_components(mask, 8)
    t0 = time.perf_counter()
    labels, n = native.label_components(mask, 8)
    dt = time.perf_counter() - t0
    assert dt < 0.25, f"native CC too slow: {dt*1e3:.1f} ms"
