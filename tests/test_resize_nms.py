"""Resize/letterbox vs cv2 oracle; NMS vs a greedy reference oracle."""

import numpy as np
import pytest

import cv2
import jax.numpy as jnp

from comic_text_detector_tpu.ops import nms as tnms
from comic_text_detector_tpu.ops import resize as trs


@pytest.mark.parametrize("src,dst", [((64, 48), (128, 96)), ((100, 77), (64, 64)), ((31, 57), (41, 13))])
def test_resize_matches_cv2_float(rng, src, dst):
    img = rng.random((*src, 3), dtype=np.float32)
    ref = cv2.resize(img, (dst[1], dst[0]), interpolation=cv2.INTER_LINEAR)
    got_np = trs.resize_bilinear_np(img, dst)
    got_dev = np.asarray(trs.resize_bilinear(jnp.asarray(img), dst))
    np.testing.assert_allclose(got_np, ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_dev, ref, rtol=1e-4, atol=1e-5)


def test_resize_uint8_close_to_cv2(rng):
    img = rng.integers(0, 256, (73, 91, 3), dtype=np.uint8)
    ref = cv2.resize(img, (160, 128), interpolation=cv2.INTER_LINEAR)
    got = trs.resize_bilinear_np(img, (128, 160))
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_letterbox_matches_reference_math(rng):
    """Scale/pad arithmetic must equal the reference letterbox
    (imgproc_utils.py:86-117 with auto=False)."""
    img = rng.integers(0, 256, (300, 200, 3), dtype=np.uint8)
    out, ratio, (dw, dh) = trs.letterbox_np(img, 256)
    assert out.shape == (256, 256, 3)
    r = min(256 / 300, 256 / 200)
    assert ratio == (r, r)
    assert dw == 256 - int(round(200 * r)) and dh == 256 - int(round(300 * r))
    # padding strictly bottom/right, zero-filled
    assert out[:, -dw:].sum() == 0 if dw else True
    assert out[-dh:, :].sum() == 0 if dh else True
    # device letterbox agrees (as float/255)
    dev = np.asarray(trs.letterbox_device(jnp.asarray(img), 256))
    assert np.abs(dev * 255 - out.astype(np.float32)).max() <= 1.01


def _greedy_nms_ref(boxes, scores, thresh):
    """Plain O(n^2) greedy NMS oracle (same contract as torchvision.ops.nms)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / (area_i + areas - inter + 1e-9)
        suppressed |= iou > thresh
    return keep


@pytest.mark.parametrize("seed", range(5))
def test_nms_matches_greedy_oracle(seed):
    rng = np.random.default_rng(seed)
    n, nc = 400, 2
    pred = np.zeros((n, 5 + nc), np.float32)
    pred[:, 0] = rng.uniform(50, 950, n)  # cx
    pred[:, 1] = rng.uniform(50, 950, n)  # cy
    pred[:, 2] = rng.uniform(20, 200, n)  # w
    pred[:, 3] = rng.uniform(20, 200, n)  # h
    pred[:, 4] = rng.random(n)  # obj
    pred[:, 5:] = rng.random((n, nc))
    conf_t, iou_t = 0.3, 0.35

    rows, count = tnms.nms_single(jnp.asarray(pred), conf_t, iou_t)
    rows, count = np.asarray(rows), int(count)

    # oracle mirrors the reference composition
    obj = pred[:, 4]
    conf = obj * pred[:, 5:].max(1)
    cls = pred[:, 5:].argmax(1)
    m = (obj > conf_t) & (conf > conf_t)
    boxes = np.stack(
        [
            pred[:, 0] - pred[:, 2] / 2,
            pred[:, 1] - pred[:, 3] / 2,
            pred[:, 0] + pred[:, 2] / 2,
            pred[:, 1] + pred[:, 3] / 2,
        ],
        1,
    )
    offs = boxes + (cls * 4096.0)[:, None]
    idx = np.where(m)[0]
    keep = [idx[j] for j in _greedy_nms_ref(offs[idx], conf[idx], iou_t)]
    keep = sorted(keep, key=lambda i: -conf[i])[:300]

    assert count == len(keep)
    got_boxes = rows[:count, :4]
    ref_boxes = boxes[keep]
    np.testing.assert_allclose(got_boxes, ref_boxes, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(rows[:count, 4], conf[keep], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(rows[:count, 5].astype(int), cls[keep])


def test_nms_batch_shapes():
    pred = np.zeros((2, 100, 7), np.float32)
    rows, counts = tnms.nms_batch(jnp.asarray(pred), 0.4, 0.35)
    assert rows.shape == (2, 300, 6) and counts.shape == (2,)
    assert int(counts.sum()) == 0


def _rand_pred(seed, n=300, nc=2):
    rng = np.random.default_rng(seed)
    pred = np.zeros((n, 5 + nc), np.float32)
    pred[:, 0] = rng.uniform(50, 950, n)
    pred[:, 1] = rng.uniform(50, 950, n)
    pred[:, 2] = rng.uniform(20, 200, n)
    pred[:, 3] = rng.uniform(20, 200, n)
    pred[:, 4] = rng.random(n)
    pred[:, 5:] = rng.random((n, nc))
    return pred


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize(
    "opts",
    [
        {"agnostic": True},
        {"multi_label": True},
        {"classes": (1,)},
        {"multi_label": True, "classes": (0,)},
    ],
    ids=lambda o: "-".join(f"{k}={v}" for k, v in o.items()),
)
def test_nms_options_match_reference(seed, opts):
    """agnostic / multi_label / classes option surface vs the executed
    reference non_max_suppression (utils/yolov5_utils.py:124-218)."""
    from tests import oracles

    oracles.load_reference()
    import utils.yolov5_utils as ryu  # type: ignore

    pred = _rand_pred(seed)
    conf_t, iou_t = 0.3, 0.35
    ref = ryu.non_max_suppression(
        pred[None].copy(),
        conf_thres=conf_t,
        iou_thres=iou_t,
        classes=list(opts["classes"]) if "classes" in opts else None,
        agnostic=opts.get("agnostic", False),
        multi_label=opts.get("multi_label", False),
    )[0].numpy()

    rows, count = tnms.nms_single(
        jnp.asarray(pred),
        conf_t,
        iou_t,
        class_agnostic=opts.get("agnostic", False),
        multi_label=opts.get("multi_label", False),
        classes=opts.get("classes"),
    )
    rows, count = np.asarray(rows), int(count)
    assert count == len(ref)
    order = np.lexsort((ref[:, 0], -ref[:, 4]))  # reference rows: sort conf desc
    got_order = np.lexsort((rows[:count, 0], -rows[:count, 4]))
    np.testing.assert_allclose(
        rows[:count][got_order, :5], ref[order, :5], rtol=1e-4, atol=1e-3
    )
    np.testing.assert_array_equal(
        rows[:count][got_order, 5].astype(int), ref[order, 5].astype(int)
    )


@pytest.mark.parametrize(
    "shp,out",
    [
        ((1654, 1170, 3), (1024, 724)),
        ((1024, 724), (1654, 1170)),
        ((37, 53, 3), (96, 128)),
        ((96, 128), (37, 53)),
        ((1, 7, 3), (5, 9)),
        ((11, 1), (23, 3)),
    ],
)
def test_resize_mm_bitexact_vs_gather_and_oracle(rng, shp, out):
    """The MXU-matmul formulation of the cv2-exact uint8 resize (the TPU
    routing of resize_cv2exact_u8) must be byte-identical to the gather
    twin AND the NumPy oracle — up/downscale, grey/color, degenerate axes."""
    img = rng.integers(0, 256, shp, dtype=np.uint8)
    a = np.asarray(trs.resize_cv2exact_u8_gather(jnp.asarray(img), out))
    b = np.asarray(trs.resize_cv2exact_u8_mm(jnp.asarray(img), out))
    c = trs.resize_cv2exact_u8_np(img, out)
    np.testing.assert_array_equal(b, a)
    np.testing.assert_array_equal(b, c)


@pytest.mark.parametrize("w", [8, 24, 1170, 1171, 1, 7])
def test_packbits_rows_matches_numpy(rng, w):
    """Strided-slice packbits (1-bpp mask transfers) is byte-identical to
    np.packbits(axis=-1), including non-multiple-of-8 row tails."""
    from comic_text_detector_tpu.ops.bits import packbits_rows

    x = rng.integers(0, 2, (13, w), dtype=np.uint8).astype(bool)
    got = np.asarray(packbits_rows(jnp.asarray(x)))
    np.testing.assert_array_equal(got, np.packbits(x, axis=-1))
    # uint8 0/255 inputs (the canvas form) pack the same way
    got255 = np.asarray(packbits_rows(jnp.asarray(x.astype(np.uint8) * 255)))
    np.testing.assert_array_equal(got255, np.packbits(x, axis=-1))
