"""Training-stack tests: losses vs torch oracles, GT maps, full trainer
smoke runs (tiny synthetic dataset, few optimizer steps)."""

import os.path as osp

import numpy as np
import pytest

import jax.numpy as jnp

from comic_text_detector_tpu.data.maps import MakeBorderMap, MakeShrinkMap, shrink_polygon
from comic_text_detector_tpu.training import losses
from comic_text_detector_tpu.utils.io import imwrite


def test_binary_dice_matches_torch(rng):
    import torch

    pred = rng.random((2, 32, 32), dtype=np.float32)
    tgt = (rng.random((2, 32, 32)) > 0.5).astype(np.float32)
    got = float(losses.binary_dice_loss(jnp.asarray(pred), jnp.asarray(tgt)))
    p = torch.from_numpy(pred).reshape(2, -1)
    t = torch.from_numpy(tgt).reshape(2, -1)
    num = (p * t).sum(1) + 1
    den = (p**2 + t**2).sum(1) + 1
    ref = float((1 - num / den).mean())
    assert abs(got - ref) < 1e-6


def test_balance_bce_matches_torch_ohem(rng):
    import torch

    logits = rng.standard_normal((1, 24, 24), dtype=np.float32)
    gt = (rng.random((1, 24, 24)) > 0.7).astype(np.float32)
    mask = np.ones_like(gt)
    got = float(losses.balance_bce_loss(jnp.asarray(logits), jnp.asarray(gt), jnp.asarray(mask)))

    lt, gtt, mt = map(torch.from_numpy, (logits, gt, mask))
    positive = (gtt * mt).byte()
    negative = ((1 - gtt) * mt).byte()
    pos_count = int(positive.float().sum())
    neg_count = min(int(negative.float().sum()), int(pos_count * 3.0))
    loss = torch.nn.functional.binary_cross_entropy_with_logits(lt, gtt, reduction="none")
    pos_loss = loss * positive.float()
    neg_loss = (loss * negative.float()).view(-1).topk(neg_count)[0]
    ref = float((pos_loss.sum() + neg_loss.sum()) / (pos_count + neg_count + 1e-6))
    assert abs(got - ref) < 1e-5


def test_mask_l1_and_dice(rng):
    pred = rng.random((1, 16, 16), dtype=np.float32)
    gt = rng.random((1, 16, 16), dtype=np.float32)
    mask = (rng.random((1, 16, 16)) > 0.3).astype(np.float32)
    l1 = float(losses.mask_l1_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    ref = (np.abs(pred - gt) * mask).sum() / (mask.sum() + 1e-6)
    assert abs(l1 - ref) < 1e-6
    d = float(losses.dice_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    assert 0 <= d <= 1


def test_shrink_map_generation():
    img = np.zeros((80, 100, 3), np.uint8)
    polys = np.array([[[10, 10], [70, 10], [70, 40], [10, 40]]], np.float64)
    data = {"imgs": img, "text_polys": polys.copy(), "ignore_tags": [False]}
    out = MakeShrinkMap()(data)
    sm = out["shrink_map"]
    assert sm.shape == (80, 100)
    area = sm.sum()
    assert 0 < area < 60 * 30  # strictly inside the original poly
    # shrunk region centered inside the original box
    ys, xs = np.nonzero(sm)
    assert xs.min() > 10 and xs.max() < 70 and ys.min() > 10 and ys.max() < 40
    assert out["shrink_mask"].min() == 1  # nothing ignored


def test_border_map_generation():
    img = np.zeros((80, 100, 3), np.uint8)
    polys = np.array([[[20, 20], [80, 20], [80, 50], [20, 50]]], np.float64)
    data = {"imgs": img, "text_polys": polys.copy(), "ignore_tags": [False]}
    out = MakeBorderMap()(data)
    tm = out["threshold_map"]
    assert tm.min() >= 0.3 - 1e-6 and tm.max() <= 0.7 + 1e-6
    # values peak near the polygon border
    assert tm[20, 50] > tm[35, 50]  # on-edge > center
    assert out["threshold_mask"].max() == 1


def test_shrink_polygon_matches_dbnet_rule():
    quad = np.array([[0, 0], [100, 0], [100, 40], [0, 40]], np.float64)
    s = shrink_polygon(quad, 0.4)
    assert len(s) >= 3
    # offset distance = A(1-r^2)/L = 4000*0.84/280 = 12
    from comic_text_detector_tpu.ops.geometry import shoelace_area

    expected = (100 - 24.0) * (40 - 24.0)
    assert abs(abs(shoelace_area(s)) - expected) < 2.0


def _make_tiny_dataset(root, n=4, size=96):
    rng = np.random.default_rng(0)
    img_dir = root / "imgs"
    img_dir.mkdir(exist_ok=True)
    for i in range(n):
        img = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        mask = np.zeros((size, size), np.uint8)
        x, y = int(rng.integers(5, 40)), int(rng.integers(5, 40))
        mask[y : y + 30, x : x + 40] = 255
        img[y : y + 30, x : x + 40] = 255  # paint a 'text' box
        imwrite(str(img_dir / f"p{i}.png"), img)
        imwrite(str(img_dir / f"mask-p{i}.png"), mask)
        poly = np.array([[x, y, x + 40, y, x + 40, y + 30, x, y + 30]])
        np.savetxt(str(img_dir / f"line-p{i}.txt"), poly, fmt="%d")
    return str(img_dir)


@pytest.mark.slow
def test_seg_trainer_smoke(tmp_path):
    from comic_text_detector_tpu.training import seg_trainer

    img_dir = _make_tiny_dataset(tmp_path)
    hyp = {
        "data": {
            "train_img_dir": img_dir,
            "val_img_dir": img_dir,
            "imgsz": 128,
            "augment": True,
            "aug_param": {"hsv": 0.3, "mini_mosaic": 0.0, "flip_lr": 0.5, "neg": 0.3, "size_range": [-1]},
            "save_dir": str(tmp_path / "out"),
        },
        "train": {
            "epochs": 1,
            "batch_size": 2,
            "lr0": 1e-3,
            "lrf": 0.1,
            "optimizer": "adam",
            "weight_decay": 0.0,
            "eval_interval": 1,
            "accumulation_steps": 1,
        },
    }
    out = seg_trainer.train(hyp, max_steps=2)
    assert out["steps"] >= 1 and np.isfinite(out["last_loss"])
    assert osp.exists(tmp_path / "out" / "unet_last.ctd")


@pytest.mark.slow
def test_db_trainer_smoke(tmp_path):
    from comic_text_detector_tpu.training import db_trainer

    img_dir = _make_tiny_dataset(tmp_path)
    hyp = {
        "data": {
            "train_img_dir": img_dir,
            "val_img_dir": img_dir,
            "imgsz": 128,
            "augment": True,
            "aug_param": {
                "hsv": 0.3,
                "mini_mosaic": 0.0,
                "flip_lr": 0.5,
                "neg": 0.3,
                "rotate": 0.0,
                "rotate_range": [-70, 70],
                "size_range": [-1],
            },
            "save_dir": str(tmp_path / "out"),
        },
        "train": {
            "epochs": 1,
            "batch_size": 2,
            "lr0": 1e-3,
            "lrf": 0.1,
            "optimizer": "adam",
            "weight_decay": 0.0,
            "eval_interval": 1,
            "accumulation_steps": 1,
            "loss": "bce",
        },
    }
    out = db_trainer.train(hyp, max_steps=2)
    assert out["steps"] >= 1 and np.isfinite(out["last_metrics"]["loss"])
    assert osp.exists(tmp_path / "out" / "db_last.ctd")


@pytest.mark.slow
def test_db_trainer_chunked_resume(tmp_path):
    """Chunked training (short resumed processes) must continue the epoch
    counter, keep the full-horizon LR schedule, and preserve best_f1
    bookkeeping so a worse later epoch cannot overwrite db_best."""
    import json

    from comic_text_detector_tpu.training import db_trainer

    img_dir = _make_tiny_dataset(tmp_path)
    save_dir = tmp_path / "out"

    def hyp_for(epochs):
        return {
            "data": {
                "train_img_dir": img_dir,
                "val_img_dir": img_dir,
                "imgsz": 128,
                "augment": False,
                "save_dir": str(save_dir),
            },
            "train": {
                "epochs": epochs,
                "schedule_epochs": 4,  # full-run horizon across all chunks
                "batch_size": 2,
                "lr0": 1e-3,
                "lrf": 0.1,
                "optimizer": "adam",
                "weight_decay": 0.0,
                "eval_interval": 1,
                "accumulation_steps": 1,
                "loss": "bce",
            },
        }

    # chunk 1: epochs [0, 2)
    db_trainer.train(hyp_for(2))
    meta1 = json.load(open(save_dir / "db_last.ctd.meta.json"))
    assert meta1["epoch"] == 1
    best1 = meta1["best_f1"]

    # chunk 2: resume -> epochs [2, 4)
    hyp2 = hyp_for(4)
    hyp2["resume"] = {"resume_training": True, "ckpt": str(save_dir / "db_last.ctd")}
    out = db_trainer.train(hyp2)
    meta2 = json.load(open(save_dir / "db_last.ctd.meta.json"))
    assert meta2["epoch"] == 3
    # best_f1 restored from db_last and only ever monotone non-decreasing
    assert meta2["best_f1"] >= best1
    assert out["best_f1"] == meta2["best_f1"]


def test_textless_page_dataset_and_batch():
    """A page with an EMPTY line-*.txt (pure-negative example, round-5
    speck-storm countermeasure) must flow through load_item, every augment,
    and GT map generation with zero polygons — and an all-negative shrink
    target must yield a finite loss (OHEM with no positives contributes ~0;
    dice still penalizes false positives)."""
    import tempfile

    from comic_text_detector_tpu.data.augment import rotate_image_and_polys
    from comic_text_detector_tpu.data.db_dataset import DBDataset

    d = tempfile.mkdtemp()
    img = np.full((96, 128, 3), 245, np.uint8)
    img[::24, :] = 210
    imwrite(osp.join(d, "neg.png"), img)
    open(osp.join(d, "line-neg.txt"), "w").close()
    texty = np.full((96, 96, 3), 235, np.uint8)
    texty[30:50, 20:70] = 10
    imwrite(osp.join(d, "tex.png"), texty)
    np.savetxt(osp.join(d, "line-tex.txt"),
               np.array([[20, 30, 70, 30, 70, 50, 20, 50]]), fmt="%d")

    ds = DBDataset(d, img_size=96)
    for i in range(len(ds)):
        item = ds[i]
        assert np.isfinite(item["shrink_map"]).all()
    im0, ann0 = ds.load_item(0, 96)  # sorted: neg.png first
    assert ann0.shape == (0, 4, 2)
    _, ann_r = rotate_image_and_polys(im0, ann0, 30.0)
    assert ann_r.shape == (0, 4, 2)
    _, ann_m = ds.mini_mosaic(im0, ann0)
    assert ann_m.shape[1:] == (4, 2)

    # all-negative batch keeps the composite loss finite
    gt = jnp.zeros((1, 32, 32))
    mask = jnp.ones((1, 32, 32))
    logits = jnp.full((1, 32, 32), 2.0)  # confident false positives
    out = losses.balance_bce_loss(logits, gt, mask)
    assert np.isfinite(float(out))


def test_lr_schedule_warmup_override():
    """warmup_steps must override the reference max(3*nb, 700) floor —
    a short fine-tune (few hundred steps) otherwise never leaves warmup
    and trains at ~0 LR (round-5 1024px fine-tune post-mortem)."""
    from comic_text_detector_tpu.training.seg_trainer import make_lr_schedule

    base = {"epochs": 10, "lr0": 1e-3, "lrf": 0.1}
    nb = 100  # 3*nb=300 < 700 -> floor dominates by default

    floor = make_lr_schedule(dict(base), nb)
    # step 90 is still epoch 0 (no cosine decay yet): default floor has the
    # LR at 90/700 of lr0
    assert float(floor(90)) == pytest.approx(90 / 700 * 1e-3, rel=1e-5)

    short = make_lr_schedule({**base, "warmup_steps": 50}, nb)
    # fully warmed by step 50: LR == lr0 * cosine factor at epoch 0 == lr0
    assert float(short(90)) == pytest.approx(1e-3, rel=1e-6)
    assert float(short(25)) == pytest.approx(0.5e-3, rel=1e-6)

    off = make_lr_schedule({**base, "warmup_steps": 0}, nb)
    assert float(off(1)) == pytest.approx(1e-3, rel=1e-6)
