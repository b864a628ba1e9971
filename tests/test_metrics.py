"""Detection metrics: QuadMetric/DetectionIoUEvaluator behavior + iou_rotate."""

import numpy as np

from comic_text_detector_tpu.training.metrics import (
    AverageMeter,
    DetectionIoUEvaluator,
    QuadMetric,
    iou_rotate,
    pixel_prf1,
)


def _quad(x, y, w, h):
    return np.array([[x, y], [x + w, y], [x + w, y + h], [x, y + h]], np.float64)


def test_evaluator_perfect_match():
    ev = DetectionIoUEvaluator()
    gt = [dict(points=_quad(10, 10, 40, 20), ignore=False)]
    pred = [dict(points=_quad(11, 10, 40, 20))]
    m = ev.evaluate_image(gt, pred)
    assert m["recall"] == 1.0 and m["precision"] == 1.0 and m["hmean"] == 1.0


def test_evaluator_miss_and_dontcare():
    ev = DetectionIoUEvaluator()
    gt = [
        dict(points=_quad(10, 10, 40, 20), ignore=False),
        dict(points=_quad(100, 100, 30, 10), ignore=True),
    ]
    pred = [dict(points=_quad(200, 200, 20, 20)), dict(points=_quad(100, 100, 30, 10))]
    m = ev.evaluate_image(gt, pred)
    assert m["recall"] == 0.0
    assert m["detCare"] == 1  # the don't-care-overlapping det is excluded
    combo = ev.combine_results([m, ev.evaluate_image(gt[:1], [dict(points=_quad(10, 10, 40, 20))])])
    assert 0 < combo["hmean"] < 1


def test_quad_metric_gather():
    qm = QuadMetric()
    batch = {
        "text_polys": [[_quad(10, 10, 40, 20)]],
        "ignore_tags": [[False]],
    }
    output = ([np.stack([_quad(10, 10, 40, 20)])], [np.array([0.9])])
    raw = qm.validate_measure(batch, output)
    res = qm.gather_measure([raw])
    assert res["fmeasure"].avg > 0.99


def test_iou_rotate():
    a = _quad(0, 0, 10, 10)
    assert abs(iou_rotate(a, a) - 1.0) < 1e-9
    b = _quad(5, 0, 10, 10)
    assert abs(iou_rotate(a, b) - 1 / 3) < 1e-6
    assert abs(iou_rotate(a, b, method="intersection") - 0.5) < 1e-6
    assert iou_rotate(a, _quad(50, 50, 5, 5)) == 0.0


def test_pixel_prf1_and_meter():
    r, p, f1 = pixel_prf1(50, 100, 50)
    assert r == 0.5 and p == 1.0 and abs(f1 - 2 / 3) < 1e-9
    m = AverageMeter().update(1.0, 2).update(0.0, 2)
    assert m.avg == 0.5


def test_per_class_ap50_known_values():
    """Hand-computed AP check: class 0 has one TP@0.9 and one FP@0.8 over
    two GT boxes (continuous AP = 0.5); class 1 is a single perfect match
    (AP = 1.0); mAP = 0.75."""
    from comic_text_detector_tpu.training.metrics import per_class_ap50

    gts = [np.array([
        [0, 0, 0, 10, 10],
        [0, 20, 20, 30, 30],
        [1, 50, 50, 60, 60],
    ], np.float64)]
    preds = [np.array([
        [0.5, 0.5, 9.5, 9.5, 0.9, 0],     # TP (IoU ~0.82)
        [40, 0, 45, 5, 0.8, 0],           # FP
        [50, 50, 60, 60, 0.7, 1],         # exact TP
    ], np.float64)]
    out = per_class_ap50(preds, gts, nc=2)
    assert abs(out["ap50"][0] - 0.5) < 1e-9
    assert abs(out["ap50"][1] - 1.0) < 1e-9
    assert abs(out["map50"] - 0.75) < 1e-9
    assert list(out["n_gt"]) == [2, 1]


def test_per_class_ap50_duplicate_and_lowconf():
    """A duplicate detection on an already-matched GT counts as FP; classes
    with no GT are excluded from the mean."""
    from comic_text_detector_tpu.training.metrics import per_class_ap50

    gts = [np.array([[0, 0, 0, 10, 10]], np.float64)]
    preds = [np.array([
        [0, 0, 10, 10, 0.9, 0],
        [0.1, 0.1, 10, 10, 0.8, 0],  # duplicate -> FP
        [0, 0, 10, 10, 0.95, 1],     # class with no GT
    ], np.float64)]
    out = per_class_ap50(preds, gts, nc=2)
    assert abs(out["ap50"][0] - 1.0) < 1e-9  # envelope: full recall at p=1
    assert out["n_gt"][1] == 0
    assert abs(out["map50"] - 1.0) < 1e-9
