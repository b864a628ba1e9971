"""Golden parity: text-block grouping vs the reference's utils/textblock.py
executed directly (shapely replaced by a geometry-backed stub)."""

import numpy as np
import pytest

from comic_text_detector_tpu.postproc.textblock import examine_textblk, group_output, sort_textblk_list
from comic_text_detector_tpu.postproc.textblock import TextBlock

from tests import oracles


@pytest.fixture(scope="module")
def ref_textblock():
    oracles.load_reference()
    import utils.textblock as rtb  # type: ignore

    return rtb


def _synthetic_detections(seed=0, n_blocks=4, lines_per_block=3):
    """Blocks with stacked horizontal lines + one scattered line + one
    vertical-ish block."""
    rng = np.random.default_rng(seed)
    boxes, cls, confs, lines = [], [], [], []
    for b in range(n_blocks):
        x = 20 + (b % 2) * 260
        y = 20 + (b // 2) * 220
        w, h = int(rng.integers(120, 200)), 0
        line_h = int(rng.integers(14, 22))
        for li in range(lines_per_block):
            ly = y + li * (line_h + 6)
            lw = int(w * rng.uniform(0.7, 1.0))
            lines.append(np.array([[x, ly], [x + lw, ly], [x + lw, ly + line_h], [x, ly + line_h]], np.int32))
            h = ly + line_h - y
        boxes.append([x - 4, y - 4, x + w + 4, y + h + 4])
        cls.append(int(rng.integers(0, 2)))
        confs.append(float(rng.uniform(0.5, 0.95)))
    # scattered line far from all blocks
    lines.append(np.array([[420, 500], [520, 500], [520, 520], [420, 520]], np.int32))
    return (
        np.array(boxes, np.int32),
        np.array(cls, np.int32),
        np.round(np.array(confs, np.float32), 3),
        lines,
    )


def _blk_signature(blk):
    return (
        tuple(int(v) for v in blk.xyxy),
        blk.language,
        bool(blk.vertical),
        len(blk.lines),
        int(blk.angle),
    )


@pytest.mark.parametrize("seed", range(3))
def test_group_output_matches_reference(ref_textblock, seed):
    rtb = ref_textblock
    blks = _synthetic_detections(seed)
    im_w, im_h = 560, 560
    mask = np.full((im_h, im_w), 255, np.uint8)

    ref_list = rtb.group_output(
        (blks[0].copy(), blks[1].copy(), blks[2].copy()),
        [l.copy() for l in blks[3]],
        im_w,
        im_h,
        mask.copy(),
    )
    got_list = group_output(
        (blks[0].copy(), blks[1].copy(), blks[2].copy()),
        [l.copy() for l in blks[3]],
        im_w,
        im_h,
        mask.copy(),
    )
    assert len(got_list) == len(ref_list)
    for g, r in zip(got_list, ref_list):
        assert _blk_signature(g) == _blk_signature(r), f"\n{_blk_signature(g)}\n{_blk_signature(r)}"
        np.testing.assert_array_equal(np.array(g.lines), np.array(r.lines))


def test_examine_and_sort_match_reference(ref_textblock):
    rtb = ref_textblock
    lines = [
        [[100, 50], [220, 50], [220, 70], [100, 70]],
        [[100, 80], [215, 80], [215, 100], [100, 100]],
    ]
    rblk = rtb.TextBlock([95, 45, 225, 105], lines=[np.array(l) for l in lines], language="eng")
    gblk = TextBlock([95, 45, 225, 105], lines=[np.array(l) for l in lines], language="eng")
    rtb.examine_textblk(rblk, 560, 560, sort=True)
    examine_textblk(gblk, 560, 560, sort=True)
    assert rblk.vertical == gblk.vertical
    assert rblk.angle == gblk.angle
    assert rblk.font_size == gblk.font_size
    np.testing.assert_allclose(rblk.distance, gblk.distance, rtol=1e-9)

    # reading-order sort parity (incl. rtl flip for ja-majority)
    def mk(cls, lang):
        blks = [cls([10, 10, 100, 60], language=lang), cls([300, 10, 400, 60], language=lang),
                cls([10, 300, 100, 360], language=lang)]
        return blks

    for lang in ("eng", "ja"):
        r = rtb.sort_textblk_list(mk(rtb.TextBlock, lang), 560, 560)
        g = sort_textblk_list(mk(TextBlock, lang), 560, 560)
        assert [tuple(b.xyxy) for b in r] == [tuple(b.xyxy) for b in g]
