"""Geometry vs cv2 oracles; device connected components vs scipy oracle."""

import numpy as np
import pytest

import cv2
import jax.numpy as jnp
from scipy import ndimage

from comic_text_detector_tpu.ops import cc as tcc
from comic_text_detector_tpu.ops import geometry as geo


@pytest.mark.parametrize("seed", range(8))
def test_min_area_rect_matches_cv2(seed):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, 200, (rng.integers(4, 40), 2)).astype(np.float32)
    (cx, cy), (w, h), ang = cv2.minAreaRect(pts)
    ref_area = w * h
    corners, (gw, gh) = geo.min_area_rect(pts)
    got_area = gw * gh
    assert abs(got_area - ref_area) <= 1e-2 * max(ref_area, 1.0)
    # corners enclose all points
    hull = geo.convex_hull(pts)
    region = corners
    for p in hull:
        # point-in-convex-quad with tolerance
        a = geo.clip_polygon_convex(np.array([p + [-1e-3, 0], p + [1e-3, 0], p + [0, 1e-3]]), region)
        assert len(a) > 0


@pytest.mark.parametrize("seed", range(4))
def test_order_rect_points_matches_reference_rule(seed):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, 100, (10, 2)).astype(np.float32)
    box, sside = geo.mini_box(pts)
    # invariants of the reference ordering: p0 left of p1, p3 below-or-equal p0 pairwise by x-sort
    assert box.shape == (4, 2)
    xs = sorted(box[:, 0])
    assert box[0, 0] <= box[1, 0] + 1e-6 and box[3, 0] <= box[2, 0] + 1e-6


def test_inflate_rect_equals_offset_minarearect():
    box = geo.order_rect_points(np.array([[10, 10], [50, 20], [45, 40], [5, 30]], np.float64))
    d = 7.0
    grown = geo.inflate_rect(box, d)
    # oracle: round-join offset then min_area_rect
    off = geo.offset_polygon(box, d, arc_step=np.pi / 45)
    corners, (w, h) = geo.min_area_rect(off)
    _, (w0, h0) = geo.min_area_rect(box)
    assert abs(w - (w0 + 2 * d)) < 0.1 and abs(h - (h0 + 2 * d)) < 0.1
    _, (gw, gh) = geo.min_area_rect(grown)
    assert abs(gw - (w0 + 2 * d)) < 1e-6 and abs(gh - (h0 + 2 * d)) < 1e-6


def test_offset_polygon_shrink_area():
    quad = np.array([[0, 0], [100, 0], [100, 50], [0, 50]], np.float64)
    shrunk = geo.offset_polygon(quad, -10)
    assert len(shrunk) >= 3
    assert abs(abs(geo.shoelace_area(shrunk)) - 80 * 30) < 1.0
    gone = geo.offset_polygon(quad, -30)
    assert len(gone) == 0


def test_intersection_and_sat():
    a = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float64)
    b = a + 5
    assert abs(geo.intersection_area_convex(a, b) - 25) < 1e-9
    assert geo.convex_polygons_intersect(a, b)
    assert not geo.convex_polygons_intersect(a, a + 20)
    assert abs(geo.iou_convex(a, a) - 1.0) < 1e-9


@pytest.mark.parametrize("seed", range(6))
def test_fill_polygon_close_to_cv2(seed):
    rng = np.random.default_rng(seed)
    quad = rng.uniform(5, 55, (4, 2))
    quad = geo.order_rect_points(geo.min_area_rect(quad)[0])
    ref = np.zeros((64, 64), np.uint8)
    cv2.fillPoly(ref, [quad.astype(np.int32).reshape(1, 4, 2)], 1)
    got = geo.fill_polygon(quad.astype(np.int32), 64, 64)
    inter = np.logical_and(ref, got).sum()
    union = np.logical_or(ref, got).sum()
    assert union == 0 or inter / union > 0.9


@pytest.mark.parametrize("connectivity", [4, 8])
@pytest.mark.parametrize("seed", range(4))
def test_connected_components_matches_scipy(seed, connectivity):
    rng = np.random.default_rng(seed)
    mask = rng.random((48, 64)) > 0.6
    labels = np.asarray(tcc.connected_components(jnp.asarray(mask), connectivity))
    structure = np.ones((3, 3)) if connectivity == 8 else None
    ref, n_ref = ndimage.label(mask, structure=structure)
    # same partition: bijection between label sets
    assert (labels > 0).sum() == (ref > 0).sum()
    pairs = {}
    for a, b in zip(labels[mask], ref[mask]):
        if a in pairs:
            assert pairs[a] == b
        else:
            pairs[a] = b
    assert len(pairs) == n_ref
    assert len(set(pairs.values())) == n_ref


def test_connected_components_spiral():
    """A serpentine component stresses propagation depth."""
    m = np.zeros((32, 32), bool)
    for i in range(0, 32, 4):
        m[i, :] = True
        if (i // 4) % 2 == 0:
            m[i : i + 4, -1] = True
        else:
            m[i : i + 4, 0] = True
    labels = np.asarray(tcc.connected_components(jnp.asarray(m), 8))
    vals = np.unique(labels[m])
    assert len(vals) == 1


def test_component_stats():
    mask = np.zeros((32, 32), bool)
    mask[2:5, 3:9] = True  # area 18
    mask[20:30, 20:25] = True  # area 50
    values = np.zeros((32, 32), np.float32)
    values[2:5, 3:9] = 0.5
    values[20:30, 20:25] = 1.0
    labels = tcc.connected_components(jnp.asarray(mask), 8)
    st = tcc.component_stats(labels, jnp.asarray(values), capacity=16)
    assert int(st.count) == 2
    areas = sorted(np.asarray(st.area)[1:3].tolist())
    assert areas == [18, 50]
    # bbox of the 18-px comp
    i = int(np.argwhere(np.asarray(st.area) == 18)[0][0])
    assert (int(st.xmin[i]), int(st.ymin[i]), int(st.xmax[i]), int(st.ymax[i])) == (3, 2, 8, 4)
    assert abs(float(st.value_sum[i]) - 9.0) < 1e-5
