"""YOLO detection training: target assignment oracle, overfit, dataset, trainer.

The reference trains its yolov5 externally, so there is no reference oracle
to execute here; the assignment test instead checks against a direct numpy
transcription of the public v5 build_targets semantics, and the overfit test
checks the whole loss end-to-end (a box emerges where the label is).
"""

import os
import os.path as osp

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _np_build_targets(labels, anchors_grid, gh, gw, anchor_t=4.0):
    """Ragged v5 assignment (numpy oracle): returns set of
    (a, gj, gi) -> (tx, ty, tw, th, cls)."""
    out = {}
    g = 0.5
    for cls, x, y, w, h in labels:
        gx, gy = x * gw, y * gh
        tw, th = w * gw, h * gh
        if tw <= 0 or th <= 0:
            continue
        for a, (aw, ah) in enumerate(anchors_grid):
            r = max(tw / aw, aw / tw, th / ah, ah / th)
            if r >= anchor_t:
                continue
            cands = [(0.0, 0.0)]
            fx, fy = gx % 1, gy % 1
            if fx < g and gx > 1:
                cands.append((g, 0.0))
            if fx > g and gx < gw - 1:
                cands.append((-g, 0.0))
            if fy < g and gy > 1:
                cands.append((0.0, g))
            if fy > g and gy < gh - 1:
                cands.append((0.0, -g))
            for ox, oy in cands:
                gi = int(np.clip(np.floor(gx - ox), 0, gw - 1))
                gj = int(np.clip(np.floor(gy - oy), 0, gh - 1))
                out[(a, gj, gi)] = (gx - gi, gy - gj, tw, th, cls)
    return out


def test_level_targets_matches_numpy_oracle():
    from comic_text_detector_tpu.training.yolo_loss import _level_targets

    rng = np.random.default_rng(0)
    gh = gw = 16
    anchors_grid = np.array([[1.5, 2.0], [3.8, 2.8], [3.7, 7.3]], np.float32)
    n = 6
    labels = np.zeros((1, 8, 5), np.float32)
    labels[0, :n, 0] = rng.integers(0, 2, n)
    labels[0, :n, 1:3] = rng.uniform(0.1, 0.9, (n, 2))
    labels[0, :n, 3:5] = rng.uniform(0.05, 0.6, (n, 2))
    mask = np.zeros((1, 8), bool)
    mask[0, :n] = True

    dense = np.asarray(
        _level_targets(jnp.asarray(labels), jnp.asarray(mask), jnp.asarray(anchors_grid), gh, gw)
    )[0]
    oracle = _np_build_targets(labels[0, :n], anchors_grid, gh, gw)

    got = {
        (a, j, i): tuple(dense[a, j, i, :5])
        for a in range(3)
        for j in range(gh)
        for i in range(gw)
        if dense[a, j, i, 5] > 0
    }
    # collision handling differs (last-write vs duplicate rows): compare keys
    # exactly and values where the oracle has a unique writer
    assert set(got) == set(oracle)
    for k, v in oracle.items():
        np.testing.assert_allclose(got[k], v, atol=1e-4)


def test_ciou_properties():
    from comic_text_detector_tpu.training.yolo_loss import ciou_xywh

    a = jnp.asarray([5.0, 5.0, 4.0, 4.0])
    assert float(ciou_xywh(a, a)) == pytest.approx(1.0, abs=1e-5)
    b = jnp.asarray([20.0, 20.0, 4.0, 4.0])
    assert float(ciou_xywh(a, b)) < 0.0  # disjoint + center distance penalty


def test_yolo_overfit_single_image():
    """20 adam steps on one synthetic page: loss drops and the top decoded
    detection lands on the label."""
    import optax

    from comic_text_detector_tpu.config import full_spec
    from comic_text_detector_tpu.models.detector import build_blk_train_model
    from comic_text_detector_tpu.models.yolo import initialize_detect_biases
    from comic_text_detector_tpu.training.steps import create_yolo_train_state, make_yolo_train_step

    size = 128
    img = np.full((1, size, size, 3), 0.9, np.float32)
    # a dark text-like box at (0.5, 0.4), w=0.4, h=0.25
    img[0, int(0.275 * size) : int(0.525 * size), int(0.3 * size) : int(0.7 * size)] = 0.1
    labels = np.zeros((1, 4, 5), np.float32)
    labels[0, 0] = [1, 0.5, 0.4, 0.4, 0.25]
    mask = np.zeros((1, 4), bool)
    mask[0, 0] = True

    spec = full_spec()
    model = build_blk_train_model()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32))
    variables = jax.tree_util.tree_map(lambda x: x, variables)
    variables["params"]["blk_det"] = initialize_detect_biases(
        dict(variables["params"]["blk_det"]), spec, img_size=size
    )
    tx = optax.adam(5e-3)
    state = create_yolo_train_state(variables, tx)
    step = make_yolo_train_step(model, tx, spec)

    first = None
    for _ in range(200):
        state, metrics = step(state, jnp.asarray(img), jnp.asarray(labels), jnp.asarray(mask))
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < first * 0.5, (first, last)

    dets, _ = model.apply(
        {"params": {**state.frozen, **state.params}, "batch_stats": state.batch_stats},
        jnp.asarray(img),
        train=False,
        decode=True,
    )
    dets = np.asarray(dets)[0]  # (N, 7) xywh + obj + cls
    top = dets[np.argsort(-dets[:, 4])][:10]
    gx, gy = 0.5 * size, 0.4 * size
    near = (np.abs(top[:, 0] - gx) < size * 0.15) & (np.abs(top[:, 1] - gy) < size * 0.15)
    # 200 steps from scratch: box regression converges before objectness
    # ranking, so require a near-target det in the top-10 rather than top-1
    assert near.any(), top


def test_blk_dataset_roundtrip(tmp_path):
    from comic_text_detector_tpu.data.blk_dataset import BlkDataset
    from comic_text_detector_tpu.data.render import ComicTextRenderer, render_comictext

    bg_dir = tmp_path / "bg"
    os.makedirs(bg_dir)
    from PIL import Image

    # non-square page: letterbox will pad, labels must renormalize
    Image.fromarray(np.full((400, 280, 3), 230, np.uint8)).save(bg_dir / "p0.png")
    out_dir = str(tmp_path / "ds")
    n = render_comictext(str(bg_dir), out_dir, renderer=ComicTextRenderer(seed=3))
    assert n == 1

    ds = BlkDataset(out_dir, img_size=256, augment=False)
    assert len(ds) == 1
    img, labels, mask = ds[0]
    assert img.shape == (256, 256, 3) and img.dtype == np.float32
    k = int(mask.sum())
    assert k >= 1
    lab = labels[:k]
    assert np.all(lab[:, 1:] >= 0) and np.all(lab[:, 1:] <= 1)
    # letterbox pads the right side (tall page): centers stay in the content
    content_frac = 280 * (256 / 400) / 256
    assert np.all(lab[:, 1] <= content_frac + 1e-6)


def test_yolo_trainer_smoke(tmp_path):
    from comic_text_detector_tpu.data.render import ComicTextRenderer, render_comictext
    from comic_text_detector_tpu.training import yolo_trainer
    from PIL import Image

    bg_dir = tmp_path / "bg"
    os.makedirs(bg_dir)
    for i in range(2):
        Image.fromarray(np.full((192, 160, 3), 240, np.uint8)).save(bg_dir / f"p{i}.png")
    ds_dir = str(tmp_path / "ds")
    render_comictext(str(bg_dir), ds_dir, renderer=ComicTextRenderer(seed=5))

    hyp = {
        "data": {
            "train_img_dir": ds_dir,
            "val_img_dir": ds_dir,
            "imgsz": 128,
            "augment": False,
            "save_dir": str(tmp_path),
        },
        "train": {"epochs": 1, "batch_size": 2, "lr0": 1e-3, "lrf": 0.1, "eval_interval": 1},
    }
    out = yolo_trainer.train(hyp, max_steps=2)
    assert out["steps"] >= 1
    assert np.isfinite(out["last_loss"])
    assert osp.exists(osp.join(str(tmp_path), "yolo_last.ctd"))
    # the eval block reports per-class (eng/ja) AP50 (random weights -> the
    # values are ~0; the plumbing and GT class bookkeeping must still work)
    assert out["ap"] is not None
    assert out["ap"]["ap50"].shape == (2,)
    assert out["ap"]["n_gt"].sum() >= 1
