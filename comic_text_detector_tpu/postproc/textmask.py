"""Color-model mask refinement (host path).

Behavioral contract: reference utils/textmask.py.  Per text block, the
predicted segmentation is refit against the actual page colors: candidate
masks come from grey-histogram bands around the dominant text colors
(:56-71) and per-channel Otsu thresholds (:43-54); connected components of
each candidate are absorbed when they reduce the byte-XOR distance to the
prediction (:73-110); small holes that help are adopted (:113-131); and raw
mask regions no block covers are rescued through the same machinery
(:135-156).

The implementation is this framework's own: the reference's per-component
Python loop is replaced by vectorized ``np.bincount`` accept tests — the
component decisions are independent (components are disjoint and each test
only reads already-merged state at its own pixels), so the batched form
computes the identical result orders of magnitude faster on a 1-vCPU host.
The TPU-resident version of this whole module is ops/refine.py; this host
path is the bit-level parity reference (tests/test_textmask_parity.py runs
the reference itself as the oracle).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from comic_text_detector_tpu.constants import REFINEMASK_INPAINT
from comic_text_detector_tpu.postproc.textblock import TextBlock
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

# a candidate mask is (thresholded uint8 0/255 map, byte-XOR score vs the
# predicted mask) — lower scores are applied first
Candidate = Tuple[np.ndarray, int]


def _byte_xor(a: np.ndarray, b: np.ndarray) -> int:
    return int(np.bitwise_xor(a, b).sum())


def _best_polarity(threshed: np.ndarray, target: np.ndarray) -> Candidate:
    """Keep whichever polarity of a binary map is closer to ``target`` under
    byte-XOR (reference minxor_thresh :29-41)."""
    inverted = 255 - threshed
    score = _byte_xor(threshed, target)
    score_inv = _byte_xor(inverted, target)
    return (inverted, score_inv) if score_inv < score else (threshed, score)


def _dominant_grey_levels(
    counts: np.ndarray, levels: np.ndarray, k: int = 3, min_gap: int = 10, rel_tol: float = 0.001
) -> List[float]:
    """Up to ``k`` histogram peaks at least ``min_gap`` grey levels apart,
    scanned in count order; the scan stops at bins under ``rel_tol`` of the
    total mass (reference get_topk_color :16-27, including its
    append-then-break order)."""
    order = np.argsort(-counts)
    peaks = [levels[order[0]]]
    floor = counts.sum() * rel_tol
    for idx in order[1:]:
        if min(abs(p - levels[idx]) for p in peaks) > min_gap:
            peaks.append(levels[idx])
        if len(peaks) >= k or counts[idx] < floor:
            break
    return peaks


def get_topk_masklist(im_grey: np.ndarray, pred_mask: np.ndarray) -> List[Candidate]:
    """Grey-band candidates around the dominant text colors (reference :56-71).

    The histogram is taken over pixels the eroded prediction marks as text
    (falling back to the whole window when erosion empties it), with
    np.histogram's 255 data-range bins.
    """
    if im_grey.ndim == 3 and im_grey.shape[-1] == 3:
        im_grey = bgr2gray(im_grey)
    target = np.ascontiguousarray(pred_mask)
    core = grey_erode(target, KERNEL_RECT3)
    text_px = im_grey[core > 127]
    if text_px.size == 0:
        text_px = im_grey.reshape(-1)
    counts, edges = np.histogram(text_px, bins=255)
    peaks = _dominant_grey_levels(counts, edges)

    half_band = 30
    out: List[Candidate] = []
    for level in peaks:
        hi = min(level + half_band, 255)
        lo = hi - 2 * half_band
        out.append(_best_polarity(in_range(im_grey, lo, hi), target))
    return out


def get_otsuthresh_masklist(
    img: np.ndarray, pred_mask: np.ndarray, per_channel: bool = False
) -> List[Candidate]:
    """Per-BGR-channel Otsu candidates, best-XOR first (reference :43-54)."""
    out = [
        _best_polarity(otsu_threshold(img[..., ch])[1], pred_mask) for ch in range(3)
    ]
    out.sort(key=lambda c: c[1])
    return out if per_channel else out[:1]


def _component_tables(binary: np.ndarray, connectivity: int):
    """(labels, stats) of a 0/255 map's components."""
    _n, labels, stats, _cent = connected_components_with_stats(binary, connectivity)
    return labels, stats


def _absorb_matching_components(
    merged: np.ndarray, candidate: np.ndarray, target: np.ndarray
) -> np.ndarray:
    """Vectorized candidate-component merge (reference :95-110).

    A component joins ``merged`` iff its not-yet-merged pixels agree with the
    binarized prediction more than they disagree — exactly the reference's
    per-component ``xor_merged < xor_origin`` bbox test, whose delta reduces
    to that vote (components are disjoint, so batching preserves the result).
    Components with a bounding box under 3 px (singletons, straight pairs)
    are skipped like the reference.
    """
    labels, stats = _component_tables(candidate, connectivity=8)
    n = len(stats)
    if n <= 1:
        return merged
    new = merged == 0
    hit = target > 0
    votes_for = np.bincount(labels[new & hit].reshape(-1), minlength=n)
    votes_against = np.bincount(labels[new & ~hit].reshape(-1), minlength=n)
    accept = votes_for > votes_against
    accept[0] = False
    accept &= (stats[:, 2] * stats[:, 3]) >= 3  # bbox w*h >= 3
    out = merged.copy()
    out[accept[labels]] = 255
    return out


def _adopt_small_holes(merged: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Hole-filling pass (reference :113-131): components of the inverse mask
    smaller than the second-largest area are adopted when they reduce the
    XOR objective.  cv2's label 0 (the merged region itself) participates in
    the area ranking but can never change the result, matching the reference.
    """
    labels, stats = _component_tables(255 - merged, connectivity=8)
    areas = stats[:, 4]
    area_cap = np.sort(areas)[-2] if len(areas) > 1 else areas[-1]
    hit = target > 0
    n = len(stats)
    votes_for = np.bincount(labels[hit].reshape(-1), minlength=n)
    votes_against = np.bincount(labels[~hit].reshape(-1), minlength=n)
    # label-0 pixels are already merged: adopting them is a no-op, and their
    # vote test can only fail (they XOR-match by construction)
    accept = (votes_for > votes_against) & (areas < area_cap)
    accept[0] = False
    out = merged.copy()
    out[accept[labels]] = 255
    return out


def merge_mask_list(
    mask_list: Sequence,
    pred_mask: np.ndarray,
    blk: Optional[TextBlock] = None,
    pred_thresh: int = 30,
    text_window=None,
    filter_with_lines: bool = False,
    refine_mode: int = REFINEMASK_INPAINT,
) -> np.ndarray:
    """Fuse candidate masks into one refined mask (reference :73-132).

    Candidates apply in ascending XOR order against an eroded+binarized
    prediction target; an INPAINT-mode dilation widens the result before
    hole adoption.  (``blk``/``text_window``/``filter_with_lines`` are
    accepted for API parity; the reference computes a line mask from them
    and then never uses it — :78-88.)
    """
    ordered = sorted(mask_list, key=lambda c: c[1])
    target = pred_mask
    if pred_thresh > 0:
        target = threshold_binary(grey_erode(target, KERNEL_ELLIPSE3), 60)

    merged = np.zeros_like(target)
    for candidate, _score in ordered:
        merged = _absorb_matching_components(merged, candidate, target)
    if refine_mode == REFINEMASK_INPAINT:
        merged = grey_dilate(merged, KERNEL_RECT3, iterations=1)
    return _adopt_small_holes(merged, target)


def refine_mask(
    img: np.ndarray,
    pred_mask: np.ndarray,
    blk_list: List[TextBlock],
    refine_mode: int = REFINEMASK_INPAINT,
) -> np.ndarray:
    """Per-block color-model refit of the predicted mask (reference :159-169)."""
    refined = np.zeros_like(pred_mask)
    for blk in blk_list:
        x1, y1, x2, y2 = expand_textwindow(img.shape, blk.xyxy, expand_r=16)
        window = np.ascontiguousarray(img[y1:y2, x1:x2])
        window_pred = np.ascontiguousarray(pred_mask[y1:y2, x1:x2])
        if window.size == 0 or window_pred.size == 0:
            continue
        candidates = get_topk_masklist(window, window_pred)
        candidates += get_otsuthresh_masklist(window, window_pred)
        merged = merge_mask_list(
            candidates, window_pred, blk=blk, text_window=[x1, y1, x2, y2], refine_mode=refine_mode
        )
        refined[y1:y2, x1:x2] = np.bitwise_or(refined[y1:y2, x1:x2], merged)
    return refined


def refine_undetected_mask(
    img: np.ndarray,
    mask_pred: np.ndarray,
    mask_refined: np.ndarray,
    blk_list: List[TextBlock],
    refine_mode: int = REFINEMASK_INPAINT,
) -> np.ndarray:
    """Rescue raw-mask components no block covers (reference :135-156):
    sizeable leftover components whose best block overlap is under half
    their bbox become synthetic blocks and go through refine_mask."""
    leftover = mask_pred.copy()
    leftover[mask_refined > 30] = 0
    labels_map, stats = _component_tables(threshold_binary(leftover, 30), connectivity=4)
    rescued: List[TextBlock] = []
    big_enough = np.where(stats[:, 4] > 50)[0]
    for li in big_enough[1:] if len(big_enough) else []:
        x, y, w, h, _area = stats[li]
        bbox = [x, y, x + w, y + h]
        best = max((intersect_area(blk.xyxy, bbox) for blk in blk_list), default=-1)
        if best / w / h < 0.5:
            rescued.append(TextBlock(bbox))
    if rescued:
        extra = refine_mask(img, leftover, rescued, refine_mode=refine_mode)
        mask_refined = np.bitwise_or(mask_refined, extra)
    return mask_refined
