"""Golden parity: mask refinement vs the reference's textmask.py executed
directly (it depends only on cv2 + numpy, both present)."""

import numpy as np
import pytest

from comic_text_detector_tpu.postproc.textblock import TextBlock
from comic_text_detector_tpu.postproc.textmask import (
    get_otsuthresh_masklist,
    get_topk_masklist,
    merge_mask_list,
    refine_mask,
    refine_undetected_mask,
)

from tests import oracles


def _synthetic_page(seed=0, h=160, w=200):
    """Page with dark text-ish strokes on light bubbles + a noisy pred mask."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w, 3), 230, np.uint8)
    img += rng.integers(0, 12, (h, w, 3), dtype=np.uint8)
    pred = np.zeros((h, w), np.uint8)
    blocks = []
    for bx, by in [(20, 20), (110, 70)]:
        for li in range(3):
            y = by + li * 14
            img[y : y + 8, bx : bx + 60] = rng.integers(0, 40)
            pred[y - 1 : y + 9, bx - 1 : bx + 61] = rng.integers(160, 255)
        blocks.append([bx - 4, by - 4, bx + 64, by + 40])
    return img, pred, blocks


@pytest.fixture(scope="module")
def ref_textmask():
    oracles.load_reference()
    import utils.textmask as rtm  # type: ignore
    import utils.textblock as rtb  # type: ignore

    return rtm, rtb


@pytest.mark.parametrize("seed", range(3))
def test_candidate_masklists_match_reference(ref_textmask, seed):
    rtm, _ = ref_textmask
    img, pred, _ = _synthetic_page(seed)
    ref_topk = rtm.get_topk_masklist(img.copy(), pred.copy())
    got_topk = get_topk_masklist(img.copy(), pred.copy())
    assert len(ref_topk) == len(got_topk)
    for (rm, rx), (gm, gx) in zip(ref_topk, got_topk):
        same = (rm == gm).mean()
        assert same > 0.99, f"topk mask agreement {same:.4f}"
        assert abs(int(rx) - int(gx)) <= 0.02 * max(int(rx), 1)
    ref_otsu = rtm.get_otsuthresh_masklist(img.copy(), pred.copy())
    got_otsu = get_otsuthresh_masklist(img.copy(), pred.copy())
    for (rm, rx), (gm, gx) in zip(ref_otsu, got_otsu):
        assert (rm == gm).mean() > 0.99


@pytest.mark.parametrize("mode", [0, 1])
@pytest.mark.parametrize("seed", range(2))
def test_refine_mask_matches_reference(ref_textmask, seed, mode):
    rtm, rtb = ref_textmask
    img, pred, blocks = _synthetic_page(seed)
    ref_blks = [rtb.TextBlock(b) for b in blocks]
    my_blks = [TextBlock(b) for b in blocks]
    ref = rtm.refine_mask(img.copy(), pred.copy(), ref_blks, refine_mode=mode)
    got = refine_mask(img.copy(), pred.copy(), my_blks, refine_mode=mode)
    inter = np.logical_and(ref > 0, got > 0).sum()
    union = np.logical_or(ref > 0, got > 0).sum()
    iou = inter / union if union else 1.0
    assert iou > 0.95, f"refine_mask IoU vs reference {iou:.4f}"


def test_refine_undetected_matches_reference(ref_textmask):
    rtm, rtb = ref_textmask
    img, pred, blocks = _synthetic_page(1)
    # add an undetected mask region (no block covers it)
    img[120:140, 20:70] = 20
    pred[118:142, 18:72] = 200
    ref_blks = [rtb.TextBlock(b) for b in blocks]
    my_blks = [TextBlock(b) for b in blocks]
    ref_refined = rtm.refine_mask(img.copy(), pred.copy(), ref_blks, refine_mode=1)
    got_refined = refine_mask(img.copy(), pred.copy(), my_blks, refine_mode=1)
    ref = rtm.refine_undetected_mask(img.copy(), pred.copy(), ref_refined, ref_blks, refine_mode=1)
    got = refine_undetected_mask(img.copy(), pred.copy(), got_refined, my_blks, refine_mode=1)
    inter = np.logical_and(ref > 0, got > 0).sum()
    union = np.logical_or(ref > 0, got > 0).sum()
    iou = inter / union if union else 1.0
    assert iou > 0.9, f"undetected-rescue IoU vs reference {iou:.4f}"
