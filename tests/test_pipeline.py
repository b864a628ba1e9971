"""End-to-end pipeline tests on the real example page (random weights on
CPU — exercises every stage: letterbox, net, NMS, DB decode, grouping,
refinement, annotation writing)."""

import json
import os.path as osp

import numpy as np
import pytest

from comic_text_detector_tpu.constants import REFINEMASK_ANNOTATION
from comic_text_detector_tpu.pipeline import TextDetector, model2annotations
from comic_text_detector_tpu.postproc.textblock import TextBlock, group_output, visualize_textblocks
from comic_text_detector_tpu.utils.io import imread

EXAMPLE = "/root/reference/data/examples/AisazuNihaIrarenai-003.jpg"


@pytest.fixture(scope="module")
def detector():
    return TextDetector.random_init(input_size=256)


@pytest.fixture(scope="module")
def page():
    img = imread(EXAMPLE)
    # shrink for CPU test speed
    from comic_text_detector_tpu.ops.resize import resize_bilinear_np

    return resize_bilinear_np(img, (img.shape[0] // 3, img.shape[1] // 3))


def test_end_to_end(detector, page):
    mask, mask_refined, blk_list = detector(page)
    assert mask.shape == page.shape[:2] and mask.dtype == np.uint8
    assert mask_refined.shape == page.shape[:2] and mask_refined.dtype == np.uint8
    assert isinstance(blk_list, list)
    for blk in blk_list:
        assert isinstance(blk, TextBlock)
        assert len(blk.xyxy) == 4
        d = blk.to_dict()
        json.dumps(d, default=str)  # serializable block dicts


def test_end_to_end_keep_undetected(detector, page):
    mask, mask_refined, blk_list = detector(
        page, refine_mode=REFINEMASK_ANNOTATION, keep_undetected_mask=True
    )
    assert mask_refined.shape == page.shape[:2]


def test_group_output_synthetic():
    """Grouping on hand-built detections: two blocks, one scattered line."""
    boxes = np.array([[10, 10, 100, 60], [150, 10, 240, 80]], np.int32)
    cls = np.array([0, 1], np.int32)
    confs = np.array([0.9, 0.8], np.float32)
    lines = [
        np.array([[12, 12], [95, 12], [95, 30], [12, 30]], np.int32),
        np.array([[12, 35], [90, 35], [90, 52], [12, 52]], np.int32),
        np.array([[155, 15], [235, 15], [235, 40], [155, 40]], np.int32),
        np.array([[400, 300], [460, 300], [460, 320], [400, 320]], np.int32),  # scattered
    ]
    mask = np.full((400, 500), 255, np.uint8)
    blk_list = group_output((boxes, cls, confs), lines, 500, 400, mask)
    assert len(blk_list) >= 3
    langs = {blk.language for blk in blk_list}
    assert "eng" in langs and "ja" in langs
    total_lines = sum(len(blk.lines) for blk in blk_list)
    assert total_lines >= 4
    # reading order weights assigned
    assert all(blk.weight != -1 for blk in blk_list)


def test_visualize_and_transformed_region(page):
    blk = TextBlock([10, 10, 80, 40], lines=[[[10, 10], [80, 10], [80, 40], [10, 40]]], language="eng")
    blk.font_size = 20
    blk.vertical = False
    canvas = page.copy()
    visualize_textblocks(canvas, [blk])
    assert (canvas != page).any()
    region = blk.get_transformed_region(page, 0, 24)
    assert region.shape[0] == 24 and region.shape[1] > 0


def test_model2annotations(tmp_path, detector, page):
    import comic_text_detector_tpu.utils.io as io

    src = tmp_path / "imgs"
    dst = tmp_path / "out"
    src.mkdir()
    dst.mkdir()
    io.imwrite(str(src / "page1.png"), page)
    model2annotations(detector, str(src), str(dst), save_json=True, progress=False)
    assert osp.exists(dst / "page1.txt")
    assert osp.exists(dst / "mask-page1.png")
    assert osp.exists(dst / "page1.json")
    with open(dst / "page1.json") as f:
        json.load(f)


def test_native_save_load(tmp_path, detector, page):
    p = tmp_path / "weights.msgpack"
    detector.save_variables(str(p))
    det2 = TextDetector.from_native(str(p), input_size=256)
    m1, _, b1 = detector(page)
    m2, _, b2 = det2(page)
    np.testing.assert_array_equal(m1, m2)
    assert len(b1) == len(b2)


def test_traverse_by_dict(tmp_path, detector, page):
    from comic_text_detector_tpu.pipeline import traverse_by_dict
    import comic_text_detector_tpu.utils.io as io
    import os.path as osp

    src = tmp_path / "imgs2"
    dst = tmp_path / "out2"
    src.mkdir()
    dst.mkdir()
    io.imwrite(str(src / "pg.png"), page)
    model2annotations(detector, str(src), str(dst), save_json=True, progress=False)
    traverse_by_dict(str(src), str(dst))
    assert osp.exists(dst / "viz-pg.png") and osp.exists(dst / "refined-pg.png")


def test_upload_page_grey_roundtrip():
    """Grayscale-content pages upload as ONE channel and expand back on
    device bit-exactly; color pages pass through untouched."""
    from comic_text_detector_tpu.pipeline.detector import upload_page

    rng = np.random.default_rng(3)
    g = rng.integers(0, 255, (97, 113), np.uint8)
    grey3 = np.repeat(g[:, :, None], 3, axis=2)
    np.testing.assert_array_equal(np.asarray(upload_page(grey3)), grey3)

    color = rng.integers(0, 255, (97, 113, 3), np.uint8)
    np.testing.assert_array_equal(np.asarray(upload_page(color)), color)

    # almost-grey page (one differing pixel beyond the sample stride) must
    # NOT take the single-channel path — it takes the planar-delta path,
    # which must reconstruct bit-exactly (mod-256 wraparound both sides)
    tricky = grey3.copy()
    tricky[5, 7, 2] ^= 1
    np.testing.assert_array_equal(np.asarray(upload_page(tricky)), tricky)

    # delta wraparound stress: channels straddling 0/255 so ch1-ch0
    # underflows and ch0+delta overflows
    wrap = np.zeros((16, 16, 3), np.uint8)
    wrap[..., 0] = 250
    wrap[..., 1] = 3  # delta = 3-250 = 9 mod 256
    wrap[..., 2] = rng.integers(0, 255, (16, 16), np.uint8)
    np.testing.assert_array_equal(np.asarray(upload_page(wrap)), wrap)

    # the caller's page must not be mutated by the in-place delta packing
    before = color.copy()
    upload_page(color)
    np.testing.assert_array_equal(color, before)

    # every wire-coding mode reconstructs bit-exactly (mod-256 arithmetic)
    import comic_text_detector_tpu.pipeline.detector as D

    old_mode = D._UPLOAD_MODE
    try:
        for mode in ("raw", "delta", "rowdelta"):
            D._UPLOAD_MODE = mode
            for page in (grey3, color, tricky, wrap):
                np.testing.assert_array_equal(
                    np.asarray(upload_page(page)), page, err_msg=mode
                )
    finally:
        D._UPLOAD_MODE = old_mode
