"""Synthetic renderer tests: block rendering, page composition, dataset
contract round-trip into the training loaders."""

import os.path as osp
import random

import numpy as np
import pytest
from PIL import ImageFont

from comic_text_detector_tpu.data.render import (
    ComicTextRenderer,
    FontSampler,
    TextLinesSampler,
    draw_text_block,
    max_contrast_color,
    render_comictext,
)
from comic_text_detector_tpu.utils.io import imwrite


def test_draw_text_block_horizontal():
    font = ImageFont.truetype("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", 24)
    img, mask, polys = draw_text_block(["hello world", "second line"], font)
    assert img is not None
    assert mask.size == img.size
    assert polys.shape == (2, 8)
    m = np.asarray(mask)
    assert m.max() == 255 and m.mean() > 0
    # polygons cover the inked area
    for p in polys:
        assert p[::2].max() <= img.width and p[1::2].max() <= img.height


def test_draw_text_block_vertical_and_rotated():
    font = ImageFont.truetype("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", 20)
    img, mask, polys = draw_text_block(["abc", "def"], font, orientation=1)
    assert img is not None and polys.shape[0] == 2
    img_r, mask_r, polys_r = draw_text_block(["rotated text"], font, rotation=20)
    assert img_r is not None and polys_r.shape[0] == 1


def test_max_contrast_color():
    import random

    dark = np.zeros((8, 8, 3), np.uint8)
    c = max_contrast_color(dark, random.Random(0))
    assert sum(c) > 380  # bright color on dark bg
    light = np.full((8, 8, 3), 255, np.uint8)
    c2 = max_contrast_color(light, random.Random(0))
    assert sum(c2) < 380


def test_render_page_and_dataset_roundtrip(tmp_path, rng):
    bg_dir = tmp_path / "bg"
    out_dir = tmp_path / "out"
    bg_dir.mkdir()
    for i in range(2):
        bg = np.full((300, 240, 3), 230, np.uint8)
        bg[::40] = 180  # some structure
        imwrite(str(bg_dir / f"bg{i}.png"), bg)
    n = render_comictext(str(bg_dir), str(out_dir), seed=1)
    assert n == 2
    assert osp.exists(out_dir / "bg0.png")
    assert osp.exists(out_dir / "mask-bg0.png")
    assert osp.exists(out_dir / "bg0.txt")

    # rendered masks must be consumable by the seg loader
    from comic_text_detector_tpu.data.seg_dataset import SegDataset

    ds = SegDataset(str(out_dir), None, img_size=128)
    assert len(ds) == 2
    img, mask = ds[0]
    assert img.shape == (128, 128, 3) and mask.shape == (128, 128)
    assert mask.max() == 1.0  # text actually present

    # and line files by the DB loader (if any lines were placed)
    from comic_text_detector_tpu.data.db_dataset import DBDataset

    db = DBDataset(str(out_dir), None, img_size=128)
    if len(db):
        item = db[0]
        assert item["shrink_map"].shape == (128, 128)
        assert item["shrink_map"].max() == 1.0


def test_db_prepared_disk_cache_roundtrip(tmp_path, rng):
    """Disk-tier prepared cache: a fresh dataset instance (simulating a
    chunked-training process restart) must reload identical prepared
    samples from disk instead of rebuilding them."""
    bg_dir = tmp_path / "bg"
    out_dir = tmp_path / "out"
    bg_dir.mkdir()
    for i in range(2):
        bg = np.full((300, 240, 3), 235, np.uint8)
        bg[::30] = 170
        imwrite(str(bg_dir / f"bg{i}.png"), bg)
    render_comictext(str(bg_dir), str(out_dir), seed=5)

    from comic_text_detector_tpu.data.db_dataset import DBDataset

    cache_dir = str(tmp_path / "prep")
    a = DBDataset(str(out_dir), None, img_size=128)
    if not len(a):
        pytest.skip("renderer placed no text lines")
    a.enable_prepared_cache(disk_dir=cache_dir)
    item_a = a[0]
    assert osp.exists(osp.join(cache_dir, "prep_128_0.npz"))

    b = DBDataset(str(out_dir), None, img_size=128)
    b.enable_prepared_cache(disk_dir=cache_dir)
    item_b = b[0]
    assert 0 in b._prep_cache  # loaded from disk into the memory tier
    for k in ("imgs", "shrink_map", "shrink_mask", "threshold_map", "threshold_mask"):
        np.testing.assert_array_equal(item_a[k], item_b[k])


def test_draw_kana_block_shapes_and_polys():
    """Kana-like blocks honor the draw_text_block contract: cropped RGBA +
    mask + per-line polys, vertical and horizontal, with rotation."""
    from comic_text_detector_tpu.data.render import draw_kana_block

    img, mask, polys = draw_kana_block([3, 5, 2], 24, random.Random(0), orientation=1)
    assert img is not None and img.size == mask.size
    assert polys.shape == (3, 8)
    m = np.asarray(mask)
    assert m.max() == 255 and (m > 0).mean() > 0.02  # dense stroke texture
    # polys stay inside the cropped block
    assert polys[:, ::2].max() < img.width and polys[:, 1::2].max() < img.height

    img_r, _, polys_r = draw_kana_block(
        [4, 2], 20, random.Random(1), orientation=0, rotation=15, stroke_width=1
    )
    assert img_r is not None and len(polys_r) == 2


def test_renderer_language_classes(tmp_path):
    """render_comictext writes real per-block class ids (eng=0 latin fonts,
    ja=1 kana-like glyphs) instead of the pre-r4 hardcoded 'ja'; ja blocks
    are mostly vertical, eng mostly horizontal."""
    from comic_text_detector_tpu.data.render import ComicTextRenderer

    rend = ComicTextRenderer(seed=5, bubble_prob=0.3)
    rend.blocks.ja_prob = 0.5
    classes = []
    for i in range(8):
        bg = np.full((600, 450, 3), 235, np.uint8)
        out = rend.render_page(bg)
        assert len(out["blk_classes"]) == len(out["blk_xyxy"])
        classes += list(out["blk_classes"])
    assert 0 in classes and 1 in classes  # both languages appear

    bg_dir, out_dir = tmp_path / "bg", tmp_path / "out"
    bg_dir.mkdir()
    imwrite(str(bg_dir / "p0.png"), np.full((600, 450, 3), 235, np.uint8))
    render_comictext(str(bg_dir), str(out_dir), renderer=rend)
    rows = open(out_dir / "p0.txt").read().splitlines()
    assert rows and all(r.split()[0] in ("0", "1") for r in rows)
