"""Host imgproc utils vs cv2/torch oracles."""

import numpy as np
import pytest

import cv2

from comic_text_detector_tpu.utils import imgproc as ip


def test_perspective_matrix_matches_cv2(rng):
    src = rng.uniform(0, 100, (4, 2)).astype(np.float32)
    dst = np.array([[0, 0], [63, 0], [63, 31], [0, 31]], np.float32)
    M_ref = cv2.getPerspectiveTransform(src, dst)
    M = ip.perspective_transform_matrix(src, dst)
    np.testing.assert_allclose(M / M[2, 2], M_ref / M_ref[2, 2], rtol=1e-5, atol=1e-6)


def test_warp_perspective_close_to_cv2(rng):
    img = rng.integers(0, 256, (80, 100, 3), dtype=np.uint8)
    src = np.array([[10, 10], [90, 15], [85, 70], [5, 65]], np.float32)
    dst = np.array([[0, 0], [63, 0], [63, 31], [0, 31]], np.float32)
    M = cv2.getPerspectiveTransform(src, dst)
    ref = cv2.warpPerspective(img, M, (64, 32))
    got = ip.warp_perspective(img, M, (64, 32))
    # interior pixels match within rounding; borders may differ by a pixel
    d = np.abs(ref[2:-2, 2:-2].astype(int) - got[2:-2, 2:-2].astype(int))
    assert np.median(d) <= 1 and (d <= 2).mean() > 0.97


def test_otsu_matches_cv2(rng):
    img = np.concatenate(
        [rng.normal(60, 10, 3000), rng.normal(190, 12, 2000)]
    ).clip(0, 255).astype(np.uint8).reshape(50, 100)
    t_ref, ref = cv2.threshold(img, 1, 255, cv2.THRESH_OTSU + cv2.THRESH_BINARY)
    t_got, got = ip.otsu_threshold(img)
    assert abs(t_got - t_ref) <= 1
    assert (got == ref).mean() > 0.999


def test_grey_morphology_matches_cv2(rng):
    img = rng.integers(0, 256, (40, 60), dtype=np.uint8)
    ref_e = cv2.erode(img, np.ones((3, 3), np.uint8), iterations=1)
    got_e = ip.grey_erode(img, ip.KERNEL_RECT3)
    assert (ref_e == got_e).mean() > 0.99  # border handling differs by <=1px ring
    ref_d = cv2.dilate(img, np.ones((3, 3), np.uint8), iterations=2)
    got_d = ip.grey_dilate(img, ip.KERNEL_RECT3, iterations=2)
    assert (ref_d == got_d).mean() > 0.98


def test_cc_stats_matches_cv2(rng):
    mask = (rng.random((60, 80)) > 0.7).astype(np.uint8) * 255
    n_ref, l_ref, s_ref, c_ref = cv2.connectedComponentsWithStats(mask, 8, cv2.CV_32S)
    n_got, l_got, s_got, c_got = ip.connected_components_with_stats(mask, 8)
    assert n_got == n_ref
    # identical partitions + identical stats rows up to label permutation
    perm = {}
    for a, b in zip(l_got[mask > 0], l_ref[mask > 0]):
        assert perm.setdefault(a, b) == b
    for g, r in perm.items():
        np.testing.assert_array_equal(s_got[g], s_ref[r])


def test_box_converters_roundtrip(rng):
    xyxy = np.array([[10, 20, 110, 90], [5, 5, 50, 60]], np.float64)
    yolo = ip.xyxy2yolo(xyxy, 200, 100)
    back = ip.yolo_xywh2xyxy(yolo.copy(), 200, 100, to_int=False)
    np.testing.assert_allclose(back, xyxy, rtol=1e-9)
    poly = ip.xywh2xyxypoly(np.array([[10, 20, 30, 40]]))
    assert poly.tolist() == [[10, 20, 40, 20, 40, 60, 10, 60]]
    assert ip.intersect_area([0, 0, 10, 10], [5, 5, 20, 20]) == 25
    assert ip.intersect_area([0, 0, 1, 1], [5, 5, 6, 6]) == -1
