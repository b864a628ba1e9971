"""Evaluation metrics.

* pixel precision/recall/F1 for the mask head (reference train_seg.py:31-55)
* ICDAR-style detection matching at IoU >= 0.5 (DetectionIoUEvaluator,
  reference utils/db_utils.py:233-435) and its QuadMetric wrapper (:437-499),
  using this framework's convex polygon IoU (ops/geometry.py) in place of
  shapely / cv2.rotatedRectangleIntersection.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from comic_text_detector_tpu.ops import geometry as geo


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0
        self.avg = 0
        self.sum = 0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count
        return self


def iou_rotate(box_a: np.ndarray, box_b: np.ndarray, method: str = "union") -> float:
    """IoU of the min-area rotated rects of two point sets (reference
    utils/db_utils.py iou_rotate :11-30, sans cv2.rotatedRectangleIntersection)."""
    ra, _ = geo.min_area_rect(np.asarray(box_a, np.float64))
    rb, _ = geo.min_area_rect(np.asarray(box_b, np.float64))
    inter = geo.intersection_area_convex(ra, rb)
    area_a = abs(geo.shoelace_area(np.asarray(box_a, np.float64)))
    area_b = abs(geo.shoelace_area(np.asarray(box_b, np.float64)))
    if inter == 0:
        return 0.0
    if method == "union":
        union = area_a + area_b - inter
        return inter / union if union > 0 else 0.0
    if method == "intersection":
        m = min(area_a, area_b)
        return inter / m if m > 0 else 0.0
    raise NotImplementedError(method)


def _poly_valid(points: np.ndarray) -> bool:
    points = np.asarray(points, np.float64)
    return len(points) >= 3 and abs(geo.shoelace_area(points)) > 0


class DetectionIoUEvaluator:
    """Greedy 1:1 matching of predictions to GT at IoU >= iou_constraint,
    with don't-care handling."""

    def __init__(self, is_output_polygon: bool = False, iou_constraint: float = 0.5, area_precision_constraint: float = 0.5):
        self.is_output_polygon = is_output_polygon
        self.iou_constraint = iou_constraint
        self.area_precision_constraint = area_precision_constraint

    def evaluate_image(self, gt: List[Dict], pred: List[Dict]) -> Dict:
        gt_pols, gt_dontcare = [], []
        for g in gt:
            pts = np.asarray(g["points"], np.float64)
            if not _poly_valid(pts):
                continue
            gt_pols.append(pts)
            if g.get("ignore", False):
                gt_dontcare.append(len(gt_pols) - 1)

        det_pols, det_dontcare = [], []
        for p in pred:
            pts = np.asarray(p["points"], np.float64)
            if not _poly_valid(pts):
                continue
            det_pols.append(pts)
            for dc in gt_dontcare:
                inter = geo.intersection_area_convex(gt_pols[dc], pts)
                area = abs(geo.shoelace_area(pts))
                if area > 0 and inter / area > self.area_precision_constraint:
                    det_dontcare.append(len(det_pols) - 1)
                    break

        det_matched = 0
        pairs = []
        if gt_pols and det_pols:
            gt_used = np.zeros(len(gt_pols), bool)
            det_used = np.zeros(len(det_pols), bool)
            iou_mat = np.zeros((len(gt_pols), len(det_pols)))
            for gi, gp in enumerate(gt_pols):
                for di, dp in enumerate(det_pols):
                    iou_mat[gi, di] = geo.iou_convex(dp, gp)
            for gi in range(len(gt_pols)):
                for di in range(len(det_pols)):
                    if (
                        not gt_used[gi]
                        and not det_used[di]
                        and gi not in gt_dontcare
                        and di not in det_dontcare
                        and iou_mat[gi, di] > self.iou_constraint
                    ):
                        gt_used[gi] = det_used[di] = True
                        det_matched += 1
                        pairs.append({"gt": gi, "det": di})

        num_gt_care = len(gt_pols) - len(gt_dontcare)
        num_det_care = len(det_pols) - len(det_dontcare)
        if num_gt_care == 0:
            recall = 1.0
            precision = 0.0 if num_det_care > 0 else 1.0
        else:
            recall = det_matched / num_gt_care
            precision = 0.0 if num_det_care == 0 else det_matched / num_det_care
        hmean = 0.0 if precision + recall == 0 else 2 * precision * recall / (precision + recall)
        return {
            "precision": precision,
            "recall": recall,
            "hmean": hmean,
            "pairs": pairs,
            "gtCare": num_gt_care,
            "detCare": num_det_care,
            "detMatched": det_matched,
        }

    def combine_results(self, results: List[Dict]) -> Dict:
        num_gt = sum(r["gtCare"] for r in results)
        num_det = sum(r["detCare"] for r in results)
        matched = sum(r["detMatched"] for r in results)
        recall = 0.0 if num_gt == 0 else matched / num_gt
        precision = 0.0 if num_det == 0 else matched / num_det
        hmean = 0.0 if recall + precision == 0 else 2 * recall * precision / (recall + precision)
        return {"precision": precision, "recall": recall, "hmean": hmean}


class QuadMetric:
    def __init__(self, is_output_polygon: bool = False):
        self.is_output_polygon = is_output_polygon
        self.evaluator = DetectionIoUEvaluator(is_output_polygon=is_output_polygon)

    def measure(self, batch: Dict, output, box_thresh: float = 0.6) -> List[Dict]:
        results = []
        gt_polygons_batch = batch["text_polys"]
        ignore_tags_batch = batch["ignore_tags"]
        pred_polygons_batch, pred_scores_batch = output
        for polygons, pred_polygons, pred_scores, ignore_tags in zip(
            gt_polygons_batch, pred_polygons_batch, pred_scores_batch, ignore_tags_batch
        ):
            gt = [
                dict(points=np.int64(polygons[i]), ignore=bool(ignore_tags[i]))
                for i in range(len(polygons))
            ]
            if self.is_output_polygon:
                pred = [dict(points=pred_polygons[i]) for i in range(len(pred_polygons))]
            else:
                pred = [
                    dict(points=pred_polygons[i].astype(np.int64))
                    for i in range(len(pred_polygons))
                    if pred_scores[i] >= box_thresh
                ]
            results.append(self.evaluator.evaluate_image(gt, pred))
        return results

    def validate_measure(self, batch, output, box_thresh: float = 0.6):
        return self.measure(batch, output, box_thresh)

    def gather_measure(self, raw_metrics: List) -> Dict:
        raw = [m for batch_metrics in raw_metrics for m in batch_metrics]
        result = self.evaluator.combine_results(raw)
        precision = AverageMeter().update(result["precision"], n=len(raw))
        recall = AverageMeter().update(result["recall"], n=len(raw))
        fmeasure = AverageMeter().update(
            2 * precision.val * recall.val / (precision.val + recall.val + 1e-8)
        )
        return {"precision": precision, "recall": recall, "fmeasure": fmeasure}


def pixel_prf1(tp: float, gt_sum: float, pred_sum: float):
    """Pixel metrics from accumulated sums (reference eval, train_seg.py:46-55)."""
    recall = tp / gt_sum if gt_sum > 0 else 0.0
    precision = tp / pred_sum if pred_sum > 0 else 0.0
    f1 = 2 * recall * precision / (recall + precision) if recall + precision > 0 else 0.0
    return recall, precision, f1
