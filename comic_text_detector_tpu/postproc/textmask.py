"""Color-model mask refinement.

Behavioral re-implementation of the reference's utils/textmask.py: per-block
windows are re-thresholded with top-k grey-histogram bands and per-channel
Otsu, and connected components of each candidate are greedily merged when
they reduce the byte-XOR distance to the predicted mask (:16-132); blocks of
raw mask the detector missed are rescued via CC overlap (:135-156).

All uint8/byte semantics (0/255 masks XORed against the *grayscale*
predicted mask) are preserved — the greedy objective operates on raw bytes.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from comic_text_detector_tpu.constants import REFINEMASK_INPAINT
from comic_text_detector_tpu.postproc.textblock import TextBlock
from comic_text_detector_tpu.ops.geometry import fill_polygons
from comic_text_detector_tpu.utils.imgproc import (
    KERNEL_ELLIPSE3,
    KERNEL_RECT3,
    bgr2gray,
    connected_components_with_stats,
    expand_textwindow,
    grey_dilate,
    grey_erode,
    in_range,
    intersect_area,
    otsu_threshold,
    threshold_binary,
)

WHITE = (255, 255, 255)
BLACK = (0, 0, 0)


def get_topk_color(color_list, bins, k: int = 3, color_var: int = 10, bin_tol: float = 0.001):
    """Pick up to k dominant grey levels at least ``color_var`` apart
    (reference :16-27)."""
    idx = np.argsort(bins * -1)
    color_list, bins = color_list[idx], bins[idx]
    top_colors = [color_list[0]]
    bin_tol = np.sum(bins) * bin_tol
    if len(color_list) > 1:
        for color, b in zip(color_list[1:], bins[1:]):
            if np.abs(np.array(top_colors) - color).min() > color_var:
                top_colors.append(color)
            if len(top_colors) >= k or b < bin_tol:
                break
    return top_colors


def _xor_sum(a: np.ndarray, b: np.ndarray) -> int:
    return int(np.bitwise_xor(a, b).sum())


def minxor_thresh(threshed: np.ndarray, mask: np.ndarray, dilate: bool = False):
    """Pick the polarity of a thresholded mask that better matches the
    predicted mask under byte-XOR (reference :29-41)."""
    neg_threshed = 255 - threshed
    if dilate:
        neg_threshed = grey_dilate(neg_threshed, KERNEL_RECT3)
        threshed = grey_dilate(threshed, KERNEL_RECT3)
    neg_xor_sum = _xor_sum(neg_threshed, mask)
    xor_sum = _xor_sum(threshed, mask)
    if neg_xor_sum < xor_sum:
        return neg_threshed, neg_xor_sum
    return threshed, xor_sum


def get_otsuthresh_masklist(img: np.ndarray, pred_mask: np.ndarray, per_channel: bool = False):
    """Per-BGR-channel Otsu candidates, best-XOR first (reference :43-54)."""
    mask_list = []
    for c in range(3):
        _, threshed = otsu_threshold(img[..., c])
        threshed, xs = minxor_thresh(threshed, pred_mask, dilate=False)
        mask_list.append([threshed, xs])
    mask_list.sort(key=lambda x: x[1])
    return mask_list if per_channel else [mask_list[0]]


def get_topk_masklist(im_grey: np.ndarray, pred_mask: np.ndarray):
    """Grey-histogram band candidates around the top-k text colors
    (reference :56-71)."""
    if im_grey.ndim == 3 and im_grey.shape[-1] == 3:
        im_grey = bgr2gray(im_grey)
    msk = np.ascontiguousarray(pred_mask)
    eroded = grey_erode(msk, KERNEL_RECT3)
    candidate_grey_px = im_grey[eroded > 127]
    if candidate_grey_px.size == 0:
        candidate_grey_px = im_grey.reshape(-1)
    bins, his = np.histogram(candidate_grey_px, bins=255)
    topk_color = get_topk_color(his, bins, color_var=10, k=3)
    color_range = 30
    mask_list = []
    for color in topk_color:
        c_top = min(color + color_range, 255)
        c_bottom = c_top - 2 * color_range
        threshed = in_range(im_grey, c_bottom, c_top)
        threshed, xs = minxor_thresh(threshed, msk)
        mask_list.append([threshed, xs])
    return mask_list


def merge_mask_list(
    mask_list,
    pred_mask: np.ndarray,
    blk: Optional[TextBlock] = None,
    pred_thresh: int = 30,
    text_window=None,
    filter_with_lines: bool = False,
    refine_mode: int = REFINEMASK_INPAINT,
) -> np.ndarray:
    """Greedy XOR-minimizing merge of candidate-mask components, then a
    hole-filling pass (reference :73-132)."""
    mask_list.sort(key=lambda x: x[1])
    linemask = None
    if blk is not None and filter_with_lines:
        lines = blk.lines_array(dtype=np.int64).copy()
        lines[..., 0] -= text_window[0]
        lines[..., 1] -= text_window[1]
        linemask = fill_polygons(lines, pred_mask.shape[0], pred_mask.shape[1]) * 255
        linemask = grey_dilate(linemask, KERNEL_RECT3, iterations=3)

    if pred_thresh > 0:
        pred_mask = grey_erode(pred_mask, KERNEL_ELLIPSE3)
        pred_mask = threshold_binary(pred_mask, 60)
    mask_merged = np.zeros_like(pred_mask)
    for candidate_mask, _xs in mask_list:
        num_labels, labels, stats, _cent = connected_components_with_stats(candidate_mask, 8)
        for label_index in range(1, num_labels):
            x, y, w, h, area = stats[label_index]
            if w * h < 3:
                continue
            x1, y1, x2, y2 = x, y, x + w, y + h
            label_local = labels[y1:y2, x1:x2]
            tmp = np.where(label_local == label_index, np.uint8(255), np.uint8(0))
            tmp_merged = np.bitwise_or(mask_merged[y1:y2, x1:x2], tmp)
            xor_merged = _xor_sum(tmp_merged, pred_mask[y1:y2, x1:x2])
            xor_origin = _xor_sum(mask_merged[y1:y2, x1:x2], pred_mask[y1:y2, x1:x2])
            if xor_merged < xor_origin:
                mask_merged[y1:y2, x1:x2] = tmp_merged

    if refine_mode == REFINEMASK_INPAINT:
        mask_merged = grey_dilate(mask_merged, KERNEL_RECT3, iterations=1)

    # hole filling: adopt small holes that reduce the XOR distance
    num_labels, labels, stats, _cent = connected_components_with_stats(255 - mask_merged, 8)
    sorted_area = np.sort(stats[:, -1])
    area_thresh = sorted_area[-2] if len(sorted_area) > 1 else sorted_area[-1]
    for label_index in range(num_labels):
        x, y, w, h, area = stats[label_index]
        if area < area_thresh:
            x1, y1, x2, y2 = x, y, x + w, y + h
            label_local = labels[y1:y2, x1:x2]
            tmp = np.where(label_local == label_index, np.uint8(255), np.uint8(0))
            tmp_merged = np.bitwise_or(mask_merged[y1:y2, x1:x2], tmp)
            xor_merged = _xor_sum(tmp_merged, pred_mask[y1:y2, x1:x2])
            xor_origin = _xor_sum(mask_merged[y1:y2, x1:x2], pred_mask[y1:y2, x1:x2])
            if xor_merged < xor_origin:
                mask_merged[y1:y2, x1:x2] = tmp_merged
    return mask_merged


def refine_mask(
    img: np.ndarray,
    pred_mask: np.ndarray,
    blk_list: List[TextBlock],
    refine_mode: int = REFINEMASK_INPAINT,
) -> np.ndarray:
    """Per-block color-model refit of the predicted mask (reference :159-169)."""
    mask_refined = np.zeros_like(pred_mask)
    for blk in blk_list:
        bx1, by1, bx2, by2 = expand_textwindow(img.shape, blk.xyxy, expand_r=16)
        im = np.ascontiguousarray(img[by1:by2, bx1:bx2])
        msk = np.ascontiguousarray(pred_mask[by1:by2, bx1:bx2])
        if im.size == 0 or msk.size == 0:
            continue
        mask_list = get_topk_masklist(im, msk)
        mask_list += get_otsuthresh_masklist(im, msk, per_channel=False)
        mask_merged = merge_mask_list(
            mask_list, msk, blk=blk, text_window=[bx1, by1, bx2, by2], refine_mode=refine_mode
        )
        mask_refined[by1:by2, bx1:bx2] = np.bitwise_or(mask_refined[by1:by2, bx1:bx2], mask_merged)
    return mask_refined


def refine_undetected_mask(
    img: np.ndarray,
    mask_pred: np.ndarray,
    mask_refined: np.ndarray,
    blk_list: List[TextBlock],
    refine_mode: int = REFINEMASK_INPAINT,
) -> np.ndarray:
    """Rescue raw-mask components not covered by any block (reference :135-156)."""
    mask_pred = mask_pred.copy()
    mask_pred[mask_refined > 30] = 0
    pred_mask_t = threshold_binary(mask_pred, 30)
    num_labels, labels, stats, _cent = connected_components_with_stats(pred_mask_t, 4)
    valid_labels = np.where(stats[:, -1] > 50)[0]
    seg_blk_list = []
    if len(valid_labels) > 0:
        for lab_index in valid_labels[1:]:
            x, y, w, h, area = stats[lab_index]
            bbox = [x, y, x + w, y + h]
            bbox_score = -1
            for blk in blk_list:
                s = intersect_area(blk.xyxy, bbox)
                if s > bbox_score:
                    bbox_score = s
            if bbox_score / w / h < 0.5:
                seg_blk_list.append(TextBlock(bbox))
    if len(seg_blk_list) > 0:
        extra = refine_mask(img, mask_pred, seg_blk_list, refine_mode=refine_mode)
        mask_refined = np.bitwise_or(mask_refined, extra)
    return mask_refined
