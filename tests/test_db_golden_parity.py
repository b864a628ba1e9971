"""Golden parity: DB polygon extraction + GT map generation vs the
reference's utils/db_utils.py executed directly (pyclipper/shapely replaced
by geometry-backed stubs; cv2 is real)."""

import numpy as np
import pytest

import jax.numpy as jnp

from comic_text_detector_tpu.data.maps import MakeBorderMap, MakeShrinkMap
from comic_text_detector_tpu.ops.geometry import iou_convex
from comic_text_detector_tpu.postproc.db_rep import SegDetectorRepresenter

from tests import oracles
from tests.test_db_decode import _synthetic_probmap


@pytest.fixture(scope="module")
def ref_db():
    oracles.load_reference()
    import utils.db_utils as rdb  # type: ignore

    return rdb


@pytest.mark.parametrize("seed", range(3))
def test_boxes_match_reference_representer(ref_db, seed):
    import torch

    prob = _synthetic_probmap(seed)
    ref_rep = ref_db.SegDetectorRepresenter(thresh=0.3)
    (ref_boxes,), (ref_scores,) = ref_rep(None, torch.from_numpy(prob)[None, None])

    rep = SegDetectorRepresenter(thresh=0.3)
    (boxes,), (scores,) = rep(None, jnp.asarray(prob)[None, :, :, None])

    ref_valid = [(b, s) for b, s in zip(ref_boxes, ref_scores) if s > 0]
    got_valid = [(b, s) for b, s in zip(boxes, scores) if s > 0]
    assert len(got_valid) == len(ref_valid)
    for rb, rs in ref_valid:
        d = [np.linalg.norm(gb.astype(float).mean(0) - rb.astype(float).mean(0)) for gb, _ in got_valid]
        i = int(np.argmin(d))
        gb, gs = got_valid[i]
        assert d[i] < 3.0
        iou = iou_convex(gb.astype(np.float64), rb.astype(np.float64))
        assert iou > 0.95, f"box IoU vs reference {iou:.3f}"
        assert abs(gs - rs) < 0.05


@pytest.mark.parametrize("seed", range(2))
def test_shrink_map_matches_reference(ref_db, seed):
    rng = np.random.default_rng(seed)
    img = np.zeros((160, 200, 3), np.uint8)
    polys = []
    for _ in range(3):
        x, y = rng.integers(5, 120), rng.integers(5, 100)
        w, h = rng.integers(30, 70), rng.integers(12, 30)
        polys.append([[x, y], [x + w, y], [x + w, y + h], [x, y + h]])
    polys = np.array(polys, np.float32)  # reference contourArea needs f32

    ref = ref_db.MakeShrinkMap(shrink_ratio=0.4)(
        {"imgs": img, "text_polys": polys.copy(), "ignore_tags": [False] * 3}
    )
    got = MakeShrinkMap(shrink_ratio=0.4)(
        {"imgs": img, "text_polys": polys.copy(), "ignore_tags": [False] * 3}
    )
    inter = np.logical_and(ref["shrink_map"] > 0, got["shrink_map"] > 0).sum()
    union = np.logical_or(ref["shrink_map"] > 0, got["shrink_map"] > 0).sum()
    assert union > 0 and inter / union > 0.93, f"shrink map IoU {inter/union:.3f}"
    np.testing.assert_array_equal(ref["shrink_mask"], got["shrink_mask"])


@pytest.mark.filterwarnings("ignore::RuntimeWarning")  # reference's own div-by-zero
def test_border_map_matches_reference(ref_db):
    img = np.zeros((120, 160, 3), np.uint8)
    polys = np.array([[[30, 30], [120, 32], [118, 60], [28, 58]]], np.float64)
    ref = ref_db.MakeBorderMap(shrink_ratio=0.4)(
        {"imgs": img, "text_polys": polys.copy(), "ignore_tags": [False]}
    )
    got = MakeBorderMap(shrink_ratio=0.4)(
        {"imgs": img, "text_polys": polys.copy(), "ignore_tags": [False]}
    )
    # threshold maps agree closely inside the border band
    band = ref["threshold_mask"] > 0
    if band.any():
        diff = np.abs(ref["threshold_map"][band] - got["threshold_map"][band])
        assert np.median(diff) < 0.02 and diff.mean() < 0.04, f"border map diff {diff.mean():.4f}"
    inter = np.logical_and(ref["threshold_mask"] > 0, got["threshold_mask"] > 0).sum()
    union = np.logical_or(ref["threshold_mask"] > 0, got["threshold_mask"] > 0).sum()
    assert inter / union > 0.9
