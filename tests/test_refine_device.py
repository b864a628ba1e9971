"""Device mask refinement (ops/refine.py) vs the host path.

On identity-sized windows (box side == S) the device pipeline is bit-exact
against the host merge (same candidates, same accept tests); on resampled
windows it must stay within a tight IoU of the host result computed on the
same crop."""

import numpy as np
import pytest

import jax.numpy as jnp

from comic_text_detector_tpu.ops import refine as R
from comic_text_detector_tpu.postproc import textmask as tm


def _page(seed, H=512, W=512, noise=10):
    rng = np.random.default_rng(seed)
    img = np.full((H, W, 3), 230, np.uint8)
    img += rng.integers(-noise, noise, img.shape).astype(np.int8).astype(np.uint8) // 2
    mask = np.zeros((H, W), np.uint8)
    for i in range(14):
        y = 40 + (i // 4) * 40
        x = 40 + (i % 4) * 50
        w, h = int(rng.integers(20, 40)), int(rng.integers(8, 14))
        img[y:y + h, x:x + w] = int(rng.integers(0, 60))
        mask[y - 3:y + h + 3, x - 3:x + w + 3] = 230
    return img, mask


def _host_merged(img, mask, box, refine_mode):
    x1, y1, x2, y2 = box
    im, mk = img[y1:y2, x1:x2], mask[y1:y2, x1:x2]
    ml = tm.get_topk_masklist(im, mk) + tm.get_otsuthresh_masklist(im, mk)
    return tm.merge_mask_list(ml, mk, refine_mode=refine_mode)


@pytest.mark.parametrize("refine_mode", [0, 1])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_identity_window_bit_exact(seed, refine_mode):
    img, mask = _page(seed)
    box = np.array([[16, 16, 16 + R.S, 16 + R.S]], np.int32)
    host = _host_merged(img, mask, box[0], refine_mode)
    canvas = np.asarray(
        R.refine_windows(jnp.asarray(img), jnp.asarray(mask), jnp.asarray(box),
                         jnp.asarray([True]), refine_mode)
    )
    dev = canvas[16:16 + R.S, 16:16 + R.S]
    np.testing.assert_array_equal(dev > 0, host > 0)
    # nothing outside the window
    outside = canvas.copy()
    outside[16:16 + R.S, 16:16 + R.S] = 0
    assert outside.sum() == 0


def test_invalid_windows_contribute_nothing():
    img, mask = _page(0)
    box = np.array([[16, 16, 272, 272], [0, 0, 128, 128]], np.int32)
    valid = np.array([True, False])
    both = np.asarray(
        R.refine_windows(jnp.asarray(img), jnp.asarray(mask), jnp.asarray(box),
                         jnp.asarray(valid), 0)
    )
    only = np.asarray(
        R.refine_windows(jnp.asarray(img), jnp.asarray(mask), jnp.asarray(box[:1]),
                         jnp.asarray(valid[:1]), 0)
    )
    np.testing.assert_array_equal(both, only)


@pytest.mark.parametrize("box", [(20, 30, 180, 150), (0, 0, 400, 400)])
def test_resampled_window_close_to_host(box):
    """Non-S-sized windows go through bilinear resampling; the result must
    stay close to the host merge on the exact crop."""
    img, mask = _page(3, noise=4)
    b = np.array([box], np.int32)
    host = _host_merged(img, mask, box, 0)
    canvas = np.asarray(
        R.refine_windows(jnp.asarray(img), jnp.asarray(mask), jnp.asarray(b),
                         jnp.asarray([True]), 0)
    )
    x1, y1, x2, y2 = box
    dev = canvas[y1:y2, x1:x2] > 0
    hs = host > 0
    inter, union = (dev & hs).sum(), (dev | hs).sum()
    iou = inter / max(union, 1)
    assert iou > 0.9, iou


def test_two_overlapping_windows_or():
    img, mask = _page(4, noise=2)
    boxes = np.array([[16, 16, 272, 272], [128, 128, 384, 384]], np.int32)
    # the padded refine_page API: one executable regardless of window count
    canvas = np.asarray(R.refine_page(jnp.asarray(img), jnp.asarray(mask), boxes, 0))
    c0 = np.asarray(R.refine_page(jnp.asarray(img), jnp.asarray(mask), boxes[:1], 0))
    c1 = np.asarray(R.refine_page(jnp.asarray(img), jnp.asarray(mask), boxes[1:], 0))
    np.testing.assert_array_equal(canvas > 0, (c0 > 0) | (c1 > 0))


def test_refine_page_empty():
    img, mask = _page(5)
    c = np.asarray(R.refine_page(jnp.asarray(img), jnp.asarray(mask), np.zeros((0, 4)), 0))
    assert c.sum() == 0


def test_out_of_bounds_block_is_harmless():
    """A block mapped past the page edge (a DB line firing in the letterbox
    pad unprojects below the image — observed with a mid-training DB head)
    yields a degenerate expand_textwindow window (y1 > y2).  The reference
    CRASHES on this (utils/textmask.py:159-169 crops an empty window and
    cv2.cvtColor asserts); both of our refine backends must ignore the
    window and leave the rest of the page untouched."""
    from comic_text_detector_tpu.utils.imgproc import expand_textwindow

    img, mask = _page(6, noise=3)
    h, w = mask.shape
    bad = [134, h + 1, 155, h + 11]  # entirely below the page
    win = expand_textwindow(img.shape, bad, expand_r=16)
    assert win[1] > win[3]  # degenerate after clamping, like the reference's

    good = [16, 16, 272, 272]
    boxes = np.array([good, win], np.int32)
    with_bad = np.asarray(R.refine_page(jnp.asarray(img), jnp.asarray(mask), boxes, 0))
    without = np.asarray(R.refine_page(jnp.asarray(img), jnp.asarray(mask), boxes[:1], 0))
    np.testing.assert_array_equal(with_bad, without)

    class _Blk:
        def __init__(self, xyxy):
            self.xyxy = xyxy

        def lines_array(self, dtype=np.int64):
            return np.zeros((0, 4, 2), dtype)

    host = tm.refine_mask(img, mask.copy(), [_Blk(good), _Blk(bad)])
    host_only = tm.refine_mask(img, mask.copy(), [_Blk(good)])
    np.testing.assert_array_equal(host, host_only)


@pytest.mark.parametrize("box", [(20, 30, 420, 330), (10, 10, 560, 240), (30, 5, 230, 500)])
def test_bucketed_large_window_bit_exact(box):
    """Windows larger than 256 in one/both dims route to a bigger shape
    bucket and extract 1:1 — bit-exact vs the host merge (resampling was
    measured catastrophic: discrete thresholds/CC flip whole components)."""
    img, mask = _page(7, H=512, W=576, noise=6)
    host = _host_merged(img, mask, box, 0)
    canvas = np.asarray(R.refine_page(jnp.asarray(img), jnp.asarray(mask), np.asarray([box]), 0))
    x1, y1, x2, y2 = box
    np.testing.assert_array_equal(canvas[y1:y2, x1:x2] > 0, host > 0)
    outside = canvas.copy()
    outside[y1:y2, x1:x2] = 0
    assert outside.sum() == 0


def test_mixed_bucket_page_bit_exact():
    """One page whose windows route to three different shape buckets
    (small / wide-mid / tall-mid) in a single refine_page call: the grouped
    dispatches must each be bit-exact vs the host merge and OR cleanly onto
    the shared canvas (refine_pages' bucket grouping loop)."""
    img, mask = _page(8, H=576, W=576, noise=6)
    boxes = [
        (16, 16, 208, 208),    # small bucket (256x256)
        (48, 240, 448, 420),   # wide-mid bucket (256x512)
        (320, 16, 500, 540),   # tall-mid bucket (512x256)
    ]
    canvas = np.asarray(
        R.refine_page(jnp.asarray(img), jnp.asarray(mask), np.asarray(boxes, np.int32), 0)
    )
    acc = np.zeros(mask.shape, bool)
    for box in boxes:
        x1, y1, x2, y2 = box
        acc[y1:y2, x1:x2] |= _host_merged(img, mask, box, 0) > 0
    np.testing.assert_array_equal(canvas > 0, acc)


def test_paste_exact_matches_gather_paste():
    rng = np.random.default_rng(9)
    k, sh, sw = 3, 64, 96
    H, W = 200, 240
    boxes = np.array([[10, 20, 10 + sw, 20 + sh], [150, 140, 150 + 80, 140 + 50], [0, 0, 96, 64]], np.int32)
    pids = np.array([0, 1, 1], np.int32)
    merged = np.zeros((k, sh, sw), np.uint8)
    for i, b in enumerate(boxes):
        w, h = b[2] - b[0], b[3] - b[1]
        merged[i, :h, :w] = (rng.random((h, w)) < 0.4) * 255
    valid = np.array([True, True, False])
    got = np.asarray(R.paste_windows_exact(
        jnp.asarray(merged), jnp.asarray(boxes), jnp.asarray(valid), (H, W),
        jnp.asarray(pids), 2))
    ref = np.asarray(R.paste_windows(
        jnp.asarray(merged), jnp.asarray(boxes), jnp.asarray(valid), (H, W),
        page_ids=jnp.asarray(pids), n_pages=2, win_hw=(sh, sw)))
    np.testing.assert_array_equal(got > 0, ref > 0)


def test_component_sums_matmul_matches_scatter():
    """The TPU factored one-hot-matmul bincount must agree exactly with the
    scatter-add formulation (±1/0 bf16 operands + f32 accumulation keep
    integer counts exact) — including the SIGNED quantities the merge and
    hole-fill accept tests fold their on-vs-off pairs into."""
    rng = np.random.default_rng(11)
    k = 3
    ids = jnp.asarray(rng.integers(0, R.CAP + 64, (k, R.S, R.S)), jnp.int32)
    q01 = (rng.random((4, k, R.S, R.S)) < 0.3).astype(np.float32)
    q01[1] -= 2.0 * (rng.random((k, R.S, R.S)) < 0.3) * q01[1]  # mix in -1s
    quantities = jnp.asarray(q01, jnp.float32)
    via_scatter = np.asarray(R._component_sums(ids, quantities, matmul=False))
    via_matmul = np.asarray(R._component_sums(ids, quantities, matmul=True))
    np.testing.assert_array_equal(via_matmul, via_scatter)
    # the s8xs8->s32 MXU variant is exact too (±1/0 operands)
    via_int8 = np.asarray(R._component_sums(ids, quantities, matmul=True, dtype="int8"))
    np.testing.assert_array_equal(via_int8, via_scatter)


def test_batch_rescue_undetected(monkeypatch):
    """keep_undetected_mask on the batch device path: a raw-mask component no
    block covers gets refined in (reference textmask.py:135-156)."""
    from comic_text_detector_tpu.pipeline.batch import BatchTextDetector

    size = 256
    bdet = BatchTextDetector.random_init(
        batch_size=1, input_size=size, half=False,
        refine_backend="device", mask_transfer="packed",
    )

    # page with one dark text-ish region; force the net's mask via monkeypatch
    page = np.full((300, 220, 3), 240, np.uint8)
    page[60:100, 40:150] = 15

    real_infer = bdet._infer

    def fake_infer(variables, x_u8):
        rows, counts, boxes, scores, valid, masks_full = real_infer(variables, x_u8)
        forced = np.zeros((1, size, size), np.uint8)
        # letterbox of (300,220) to 256: r=256/300, content (256, 187)
        y1, y2 = int(60 * 256 / 300), int(100 * 256 / 300)
        x1, x2 = int(40 * 256 / 300), int(150 * 256 / 300)
        forced[0, y1:y2, x1:x2] = 255
        forced_dev = jnp.asarray(forced)
        return rows, counts * 0, boxes, scores, valid & False, forced_dev

    bdet._infer = fake_infer
    (res_no,) = bdet.process_batch([page], keep_undetected_mask=False)
    (res_yes,) = bdet.process_batch([page], keep_undetected_mask=True)
    mask_no, refined_no, blks_no = res_no
    mask_yes, refined_yes, blks_yes = res_yes
    assert len(blks_no) == 0  # nothing detected -> no blocks
    region_yes = refined_yes[60:100, 40:150]
    assert refined_no.sum() == 0  # no blocks, no refinement
    assert (region_yes > 0).mean() > 0.5  # rescue refined the region in


def test_caps_parse_validation():
    """CTD_REFINE_CAPS must reject typos instead of silently shipping the
    wrong capacities (advisor-pattern guard)."""
    n = len(R.BUCKETS)
    assert R._parse_caps("audit", n) == R._CAP_PRESETS["audit"]
    assert R._parse_caps(",".join(["128"] * n), n) == (128,) * n
    for bad in ("1024", "nope", ",".join(["128"] * (n - 1) + ["127"])):
        with pytest.raises(ValueError):
            R._parse_caps(bad, n)


@pytest.mark.parametrize("cap", [256, 1024])
def test_reduced_cap_bit_equal(cap):
    """Any cap above the window's real component count yields bit-identical
    refinement (ranks >= cap are never accepted; below-cap ranks are
    untouched) — the invariant the audit-sized cap reduction relies on."""
    img, mask = _page(1)
    box = np.array([[16, 16, 16 + R.S, 16 + R.S]], np.int32)
    args = (jnp.asarray(img), jnp.asarray(mask), jnp.asarray(box),
            jnp.asarray([True]), 1)
    full = np.asarray(R.refine_windows(*args, cap=R.CAP))
    small = np.asarray(R.refine_windows(*args, cap=cap))
    np.testing.assert_array_equal(full, small)
