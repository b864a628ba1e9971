"""On-device min-area rects (angle scan) vs the host-exact calipers path."""

import numpy as np
import pytest

import jax.numpy as jnp

from comic_text_detector_tpu.ops.db_decode import (
    boxes_from_device_rects,
    boxes_from_stats,
    db_decode_full_device,
    db_device_decode,
)
from comic_text_detector_tpu.ops.geometry import iou_convex


def _probmap_with_rotated_bars(seed=0, h=160, w=224, n=4):
    rng = np.random.default_rng(seed)
    prob = np.zeros((h, w), np.float32)
    for _ in range(n):
        cx, cy = rng.integers(40, w - 40), rng.integers(30, h - 30)
        bw, bh = rng.integers(24, 60), rng.integers(6, 14)
        ang = rng.uniform(0, np.pi / 2)
        ca, sa = np.cos(ang), np.sin(ang)
        ys, xs = np.mgrid[0:h, 0:w]
        u = (xs - cx) * ca + (ys - cy) * sa
        v = -(xs - cx) * sa + (ys - cy) * ca
        inside = (np.abs(u) < bw / 2) & (np.abs(v) < bh / 2)
        prob[inside] = rng.uniform(0.6, 0.95)
    return prob


@pytest.mark.parametrize("seed", range(4))
def test_device_rects_match_host_exact(seed):
    prob = _probmap_with_rotated_bars(seed)
    h, w = prob.shape

    stats = db_device_decode(jnp.asarray(prob), 0.3)
    host_boxes, host_scores = boxes_from_stats(stats, w, h, w, h)

    boxes, scores, valid = db_decode_full_device(jnp.asarray(prob), 0.3, 256, 90)
    dev_boxes, dev_scores = boxes_from_device_rects(
        np.asarray(boxes), np.asarray(scores), np.asarray(valid), w, h, w, h
    )

    assert len(dev_boxes) == len(host_boxes)
    for hb, hs in zip(host_boxes, host_scores):
        # match by centroid
        d = [np.linalg.norm(db.mean(0) - hb.mean(0)) for db in dev_boxes]
        i = int(np.argmin(d))
        assert d[i] < 3.0
        iou = iou_convex(dev_boxes[i].astype(np.float64), hb.astype(np.float64))
        assert iou > 0.92, f"device-vs-exact rect IoU {iou:.3f}"
        assert abs(dev_scores[i] - hs) < 1e-3


def test_device_rects_empty():
    prob = np.zeros((64, 64), np.float32)
    boxes, scores, valid = db_decode_full_device(jnp.asarray(prob), 0.3, 64, 90)
    assert not bool(np.asarray(valid).any())
