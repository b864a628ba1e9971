"""Same-weights golden parity with the TRAINED flagship checkpoint.

The trained synthetic checkpoint (data/flagship_r2.npz) exports back into
the reference's torch format (models/convert.py::export_torch_checkpoint)
and the reference TextDetector runs it on the real example page at 1024px —
the strongest end-to-end check: realistic detection counts through every
order-dependent host path, asserted at the BASELINE targets."""

import os
import os.path as osp

import numpy as np
import pytest

import jax

from comic_text_detector_tpu.config import YOLOV5S_CFG
from comic_text_detector_tpu.models.convert import (
    convert_combined_checkpoint,
    export_torch_checkpoint,
)
from comic_text_detector_tpu.pipeline import TextDetector
from comic_text_detector_tpu.training.checkpoint import load_compact

from tests import oracles

EXAMPLE = "/root/reference/data/examples/AisazuNihaIrarenai-003.jpg"
# CTD_PARITY_CKPT overrides the checkpoint under test (e.g. a freshly
# assembled flagship_r3.npz before promoting it to the bench default)
CKPT = os.environ.get(
    "CTD_PARITY_CKPT",
    osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "data", "flagship_r2.npz"),
)

needs_ckpt = pytest.mark.skipif(not osp.exists(CKPT), reason="flagship checkpoint not built")


@needs_ckpt
def test_export_torch_roundtrip():
    """variables -> torch ckpt -> variables is the identity (layouts invert
    exactly); spot-check a forward too."""
    import jax.numpy as jnp

    variables = load_compact(CKPT)
    ckpt = export_torch_checkpoint(variables, YOLOV5S_CFG)
    back, cfg = convert_combined_checkpoint(ckpt)
    flat_a = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_flatten_with_path(variables)[0]}
    flat_b = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_flatten_with_path(back)[0]}
    assert set(flat_a) == set(flat_b)
    for k, v in flat_a.items():
        np.testing.assert_array_equal(np.asarray(flat_b[k]), np.asarray(v), err_msg=k)


@pytest.fixture(scope="module")
def flagship_pair(tmp_path_factory):
    import torch

    oracles.load_reference()
    variables = load_compact(CKPT)
    ckpt = export_torch_checkpoint(variables, YOLOV5S_CFG)
    # the reference's cfg format eval()s module-name strings
    ckpt["blk_det"]["cfg"] = oracles.torch_cfg(YOLOV5S_CFG)
    path = tmp_path_factory.mktemp("flagship") / "textdetector.pt"
    torch.save(ckpt, str(path))

    import inference as ref_inference  # type: ignore

    ref_det = ref_inference.TextDetector(model_path=str(path), input_size=1024, device="cpu", act="leaky")
    my_det = TextDetector(variables=variables, input_size=1024, act="leaky", refine_backend="host")
    return ref_det, my_det, variables


@needs_ckpt
@pytest.mark.slow
def test_flagship_1024_golden(flagship_pair):
    import cv2

    ref_det, my_det, _ = flagship_pair
    img = cv2.imread(EXAMPLE)

    ref_mask, ref_refined, ref_blks = ref_det(img.copy())
    my_mask, my_refined, my_blks = my_det(img.copy())

    # --- raw mask parity (BASELINE: IoU >= 0.99) ---
    a, b = my_mask > 76, ref_mask > 76
    iou = np.logical_and(a, b).sum() / max(np.logical_or(a, b).sum(), 1)
    assert iou >= 0.99, f"mask IoU {iou:.4f}"

    # --- refined mask parity (0.991 measured; gate at the achieved margin
    # so regressions can't hide in a loose band) ---
    ar, br = my_refined > 0, ref_refined > 0
    iou_r = np.logical_and(ar, br).sum() / max(np.logical_or(ar, br).sum(), 1)
    assert iou_r >= 0.985, f"refined IoU {iou_r:.4f}"

    # --- block list: IoU-matched geometry + reading order ------------------
    # Detections whose conf sits within float noise of conf_thresh (0.4) can
    # flip between frameworks (torch 0.40129 vs XLA 0.39977 measured on this
    # page); allow at most one such boundary flip per side, and require all
    # matched blocks to agree in geometry (<=2 px), language, orientation,
    # and relative (manga reading) order.
    def iou(a, b):
        ix = max(0, min(a[2], b[2]) - max(a[0], b[0]))
        iy = max(0, min(a[3], b[3]) - max(a[1], b[1]))
        inter = ix * iy
        ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
        return inter / max(ua, 1)

    pairs = []
    used = set()
    for gi, g in enumerate(my_blks):
        best, bj = 0.0, -1
        for rj, r in enumerate(ref_blks):
            if rj in used:
                continue
            v = iou(g.xyxy, r.xyxy)
            if v > best:
                best, bj = v, rj
        if best > 0.5:
            pairs.append((gi, bj))
            used.add(bj)
    assert len(my_blks) - len(pairs) <= 1, "more than one unmatched block (mine)"
    assert len(ref_blks) - len(pairs) <= 1, "more than one unmatched block (ref)"
    ref_order = [bj for _, bj in pairs]
    assert ref_order == sorted(ref_order), "matched blocks out of reading order"
    for gi, rj in pairs:
        g, r = my_blks[gi], ref_blks[rj]
        assert g.language == r.language
        assert bool(g.vertical) == bool(r.vertical)
        assert np.abs(np.array(g.xyxy) - np.array(r.xyxy)).max() <= 2, f"{g.xyxy} vs {r.xyxy}"


@needs_ckpt
@pytest.mark.slow
def test_flagship_1024_bench_configuration_golden(flagship_pair):
    """The EXACT configuration bench.py measures — refine_backend='device',
    mask_transfer='packed' — golden-gated against the executed reference,
    through BOTH the single-page TextDetector and the BatchTextDetector
    volume path (which refines at original page resolution with cross-page
    window packing).  Reference behavior: utils/textmask.py:159-169 at
    original resolution + inference.py:142-178."""
    import cv2

    from comic_text_detector_tpu.pipeline.batch import BatchTextDetector

    ref_det, _my_host, variables = flagship_pair
    img = cv2.imread(EXAMPLE)
    ref_mask, ref_refined, ref_blks = ref_det(img.copy())

    my_det = TextDetector(
        variables=variables, input_size=1024, act="leaky",
        refine_backend="device", mask_transfer="packed",
    )
    my_mask, my_refined, my_blks = my_det(img.copy())

    br = ref_refined > 0
    for label, refined, blks in [("single", my_refined, my_blks)]:
        ar = refined > 0
        iou_r = np.logical_and(ar, br).sum() / max(np.logical_or(ar, br).sum(), 1)
        assert iou_r >= 0.985, f"{label}: refined IoU {iou_r:.4f}"
        assert abs(len(blks) - len(ref_blks)) <= 1

    # packed raw-mask parity: binarized-at-30 vs the reference's grey mask
    a, b = my_mask > 0, ref_mask > 30
    iou = np.logical_and(a, b).sum() / max(np.logical_or(a, b).sum(), 1)
    assert iou >= 0.99, f"packed raw mask IoU {iou:.4f}"

    bdet = BatchTextDetector(
        variables, batch_size=2, input_size=1024, half=False,
        refine_backend="device", mask_transfer="packed",
    )
    results = bdet.process_batch([img.copy(), img.copy()])
    assert len(results) == 2
    for bi, (bmask, brefined, bblks) in enumerate(results):
        ar = brefined > 0
        iou_r = np.logical_and(ar, br).sum() / max(np.logical_or(ar, br).sum(), 1)
        assert iou_r >= 0.985, f"batch page {bi}: refined IoU {iou_r:.4f}"
        assert len(bblks) == len(my_blks)
        # batch and single-page paths share one semantics (original-res
        # refine): identical canvases for identical inputs
        np.testing.assert_array_equal(brefined, my_refined)


@needs_ckpt
@pytest.mark.slow
def test_flagship_annotation_mode_golden(flagship_pair):
    """model2annotations' production configuration — REFINEMASK_ANNOTATION +
    keep_undetected_mask (reference inference.py:35, textmask.py:135-169)
    — golden-gated against the executed reference through BOTH refine
    backends.  Gates sit just under the measured margins (host 0.9955,
    device 0.9830 refined IoU on this page) so regressions surface."""
    import cv2

    from comic_text_detector_tpu.constants import REFINEMASK_ANNOTATION

    ref_det, my_host, variables = flagship_pair
    img = cv2.imread(EXAMPLE)
    _, ref_refined, ref_blks = ref_det(
        img.copy(), refine_mode=REFINEMASK_ANNOTATION, keep_undetected_mask=True
    )
    br = ref_refined > 0

    my_dev = TextDetector(
        variables=variables, input_size=1024, act="leaky",
        refine_backend="device", mask_transfer="packed",
    )
    for label, det, gate in [("host", my_host, 0.99), ("device", my_dev, 0.982)]:
        _, refined, blks = det(
            img.copy(), refine_mode=REFINEMASK_ANNOTATION, keep_undetected_mask=True
        )
        ar = refined > 0
        iou_r = np.logical_and(ar, br).sum() / max(np.logical_or(ar, br).sum(), 1)
        assert iou_r >= gate, f"{label}: annotation-mode refined IoU {iou_r:.4f}"
        assert abs(len(blks) - len(ref_blks)) <= 1


@needs_ckpt
@pytest.mark.slow
def test_rotated_vertical_page_golden(flagship_pair, tmp_path):
    """Rotated/vertical-dense synthetic page (VERDICT round-1: rotated-text
    coverage was absent): same-weights parity of blocks/lines/mask on a page
    the renderer lays out with vertical and rotated text."""
    from comic_text_detector_tpu.data.render import ComicTextRenderer
    from comic_text_detector_tpu.utils.io import imread, imwrite

    rng = np.random.default_rng(7)
    bg = np.full((768, 640, 3), 235, np.uint8)
    bg[::40] = 210
    renderer = ComicTextRenderer(seed=9)
    out = renderer.render_page(bg)
    img = out["img"]

    ref_det, my_det, _ = flagship_pair
    ref_mask, ref_refined, ref_blks = ref_det(img.copy())
    my_mask, my_refined, my_blks = my_det(img.copy())

    a, b = my_mask > 76, ref_mask > 76
    union = np.logical_or(a, b).sum()
    if union > 500:
        iou = np.logical_and(a, b).sum() / union
        assert iou >= 0.99, f"mask IoU {iou:.4f}"
    assert len(my_blks) == len(ref_blks)
    for g, r in zip(my_blks, ref_blks):
        assert bool(g.vertical) == bool(r.vertical)
        assert len(g.lines) == len(r.lines)
        assert np.abs(np.array(g.xyxy) - np.array(r.xyxy)).max() <= 3


@needs_ckpt
@pytest.mark.slow
def test_ja_majority_page_reading_order_golden(flagship_pair):
    """ja-majority vertical page: same-weights parity of the manga
    reading-order sort incl. the right-to-left flip the reference applies
    when predicted-ja blocks dominate (reference utils/textblock.py:267-300,
    rtl grid weights :295).  The r4 renderer draws kana-like glyph columns
    (data/render.py::draw_kana_block) so the page's texture is non-latin."""
    from comic_text_detector_tpu.data.render import ComicTextRenderer

    bg = np.full((900, 640, 3), 240, np.uint8)
    bg[:, ::64] = 215
    renderer = ComicTextRenderer(seed=11, bubble_prob=0.4, blocks_per_page=(5, 8))
    renderer.blocks.ja_prob = 1.0  # all-kana page, mostly vertical columns
    img = renderer.render_page(bg)["img"]

    ref_det, my_det, _ = flagship_pair
    _, _, ref_blks = ref_det(img.copy())
    _, _, my_blks = my_det(img.copy())

    assert len(my_blks) >= 2, "page must actually detect multiple blocks"
    assert len(my_blks) == len(ref_blks)
    # block ORDER is the contract here: the sort (incl. any rtl flip) must
    # emit the same sequence of boxes the executed reference emits
    for g, r in zip(my_blks, ref_blks):
        assert np.abs(np.array(g.xyxy) - np.array(r.xyxy)).max() <= 3
        assert bool(g.vertical) == bool(r.vertical)
