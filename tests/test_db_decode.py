"""DB decode vs a cv2-based oracle reproducing the reference algorithm
(cv2.findContours + minAreaRect; unclip via the closed-form rect inflation
that pyclipper's round-join offset + minAreaRect reduces to)."""

import math

import numpy as np
import pytest

import cv2
import jax.numpy as jnp

from comic_text_detector_tpu.postproc.db_rep import SegDetectorRepresenter


def _oracle_boxes(prob: np.ndarray, thresh=0.3, unclip_ratio=1.5):
    """Reference algorithm via cv2 (boxes_from_bitmap, db_utils.py:123-166)."""
    bitmap = (prob > thresh).astype(np.uint8)
    h, w = bitmap.shape
    contours, _ = cv2.findContours(bitmap * 255, cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE)
    out = []
    for contour in contours:
        pts = contour.reshape(-1, 2)
        rect = cv2.minAreaRect(pts)
        (cx, cy), (rw, rh), ang = rect
        if min(rw, rh) < 2:
            continue
        # score: mean prob inside the filled contour
        m = np.zeros_like(bitmap)
        cv2.fillPoly(m, [pts.reshape(-1, 1, 2)], 1)
        score = float(prob[m > 0].mean())
        per = 2 * (rw + rh)
        d = rw * rh * unclip_ratio / per if per > 0 else 0
        grown = ((cx, cy), (rw + 2 * d, rh + 2 * d), ang)
        box = cv2.boxPoints(grown)
        box[:, 0] = np.clip(np.round(box[:, 0]), 0, w)
        box[:, 1] = np.clip(np.round(box[:, 1]), 0, h)
        out.append((box, score))
    return out


def _synthetic_probmap(seed=0, h=160, w=224, n=5):
    rng = np.random.default_rng(seed)
    prob = np.zeros((h, w), np.float32)
    rects = []
    for _ in range(n):
        rw, rh = rng.integers(20, 60), rng.integers(6, 16)
        x = rng.integers(0, w - rw)
        y = rng.integers(0, h - rh)
        val = rng.uniform(0.5, 0.95)
        prob[y : y + rh, x : x + rw] = np.maximum(prob[y : y + rh, x : x + rw], val)
        rects.append((x, y, rw, rh))
    prob += rng.random((h, w)).astype(np.float32) * 0.1
    return np.clip(prob, 0, 1)


def _match_box(box, candidates):
    """Find candidate with closest centroid; return (idx, centroid_dist)."""
    c = box.mean(0)
    ds = [np.linalg.norm(cand.mean(0) - c) for cand in candidates]
    i = int(np.argmin(ds))
    return i, ds[i]


@pytest.mark.parametrize("seed", range(4))
def test_quad_boxes_match_cv2_oracle(seed):
    prob = _synthetic_probmap(seed)
    rep = SegDetectorRepresenter(thresh=0.3)
    (boxes,), (scores,) = rep(None, jnp.asarray(prob)[None, :, :, None])
    ref = _oracle_boxes(prob)
    assert len(boxes) == len(ref), f"{len(boxes)} vs {len(ref)} components"
    for rbox, rscore in ref:
        i, d = _match_box(rbox, list(boxes))
        assert d < 3.0, f"no matching box within 3px (closest {d:.1f})"
        got = boxes[i].astype(np.float64)
        # same rect up to corner ordering: compare sorted corner sets
        a = got[np.lexsort((got[:, 1], got[:, 0]))]
        b = rbox[np.lexsort((rbox[:, 1], rbox[:, 0]))]
        assert np.abs(a - b).max() <= 2.0, f"corners differ\n{a}\n{b}"
        assert abs(scores[i] - rscore) < 0.05


def test_nchw_and_nhwc_inputs_agree():
    prob = _synthetic_probmap(1)
    rep = SegDetectorRepresenter(thresh=0.3)
    (b1,), (s1,) = rep(None, jnp.asarray(prob)[None, :, :, None])
    two_ch = np.stack([prob, prob * 0.5], axis=0)[None]  # (1,2,H,W) NCHW
    (b2,), (s2,) = rep(None, jnp.asarray(two_ch))
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_polygon_mode_runs():
    prob = _synthetic_probmap(2)
    rep = SegDetectorRepresenter(thresh=0.3, box_thresh=0.5)
    (polys,), (scores,) = rep(None, jnp.asarray(prob)[None, :, :, None], is_output_polygon=True)
    assert len(polys) >= 1
    for p in polys:
        assert p.ndim == 2 and p.shape[1] == 2 and len(p) >= 4


def test_empty_map():
    prob = np.zeros((64, 64), np.float32)
    rep = SegDetectorRepresenter(thresh=0.3)
    (boxes,), (scores,) = rep(None, jnp.asarray(prob)[None, :, :, None])
    assert len(boxes) == 0 and len(scores) == 0


@pytest.mark.parametrize("shape,mb", [((64, 128), 8192), ((128, 128), 8192), ((64, 128), 64)])
def test_db_decode_rank_ids_matches_label_path(rng, shape, mb):
    """The TPU routing of db_decode_full_device (fused CC+rank kernel ids +
    scatter-free MXU stats) must match the label+LUT formulation exactly —
    including boundary-table truncation (small max_boundary) and component
    counts past capacity."""
    from comic_text_detector_tpu.ops.db_decode import db_decode_full_device

    # blobby multi-component probability map
    h, w = shape
    base = rng.random((h // 8, w // 8)).astype(np.float32)
    m = np.kron(base, np.ones((8, 8), np.float32))
    for args in [(m, 0.55), (m, 0.75)]:
        shrink, th = args
        a = db_decode_full_device(jnp.asarray(shrink), th, 64, 30, mb, False)
        b = db_decode_full_device(jnp.asarray(shrink), th, 64, 30, mb, True)
        av, bv = np.asarray(a[2]), np.asarray(b[2])
        np.testing.assert_array_equal(bv, av)
        np.testing.assert_allclose(np.asarray(b[1])[av], np.asarray(a[1])[av], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(b[0])[av], np.asarray(a[0])[av], rtol=1e-4, atol=1e-3)
