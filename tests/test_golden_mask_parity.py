"""Golden parity: full-pipeline mask output vs the reference's mask path
executed with identical (random) weights — the BASELINE.md mask-IoU target.

The reference's line-polygon stage cannot run in this image (pyclipper is
absent), so the golden comparison covers the stages that can: letterbox ->
3-head net -> postprocess_mask -> unletterbox resize.  Line polygons are
covered by the cv2-oracle DB-decode tests; NMS by the greedy-oracle tests.
"""

import numpy as np
import pytest

import cv2
import jax.numpy as jnp

from comic_text_detector_tpu.config import YOLOV5S_CFG
from comic_text_detector_tpu.models.convert import convert_combined_checkpoint
from comic_text_detector_tpu.pipeline import TextDetector

from tests import oracles
from tests.test_textdetbase import make_torch_combo

SIZE = 256
EXAMPLE = "/root/reference/data/examples/AisazuNihaIrarenai-003.jpg"


def _reference_mask_path(blk, seg, det, img_bgr, size=SIZE):
    """Mirror inference.py:142-165 (mask branch) with the reference's own
    letterbox, executed through the reference torch modules."""
    import torch

    oracles.load_reference()
    from utils.imgproc_utils import letterbox  # type: ignore

    img = cv2.cvtColor(img_bgr, cv2.COLOR_BGR2RGB)
    img_in, ratio, (dw, dh) = letterbox(img, new_shape=(size, size), auto=False, stride=64)
    x = img_in.transpose(2, 0, 1)[::-1]  # HWC->CHW, RGB->BGR (net consumes BGR)
    x = torch.from_numpy(np.ascontiguousarray(x[None]).astype(np.float32) / 255)
    with torch.no_grad():
        (dets, _), z = blk(x, detect=True)
        mask, feats = seg(*z, forward_mode=2)
    m = (mask.squeeze().numpy() * 255).astype(np.uint8)
    m = m[: m.shape[0] - int(dh), : m.shape[1] - int(dw)]
    m = cv2.resize(m, (img_bgr.shape[1], img_bgr.shape[0]), interpolation=cv2.INTER_LINEAR)
    return m, dets


@pytest.mark.slow
def test_mask_iou_vs_reference():
    blk, seg, det, ckpt = make_torch_combo(seed=7)
    img = cv2.imread(EXAMPLE)
    img = cv2.resize(img, (img.shape[1] // 4, img.shape[0] // 4), interpolation=cv2.INTER_LINEAR)

    ref_mask, _ = _reference_mask_path(blk, seg, det, img)

    variables, cfg = convert_combined_checkpoint(ckpt)
    mine = TextDetector(variables=variables, cfg=YOLOV5S_CFG, input_size=SIZE, act="leaky")
    my_mask, _, _ = mine(img)

    assert my_mask.shape == ref_mask.shape
    diff = np.abs(my_mask.astype(int) - ref_mask.astype(int))
    mean_diff = diff.mean()
    assert mean_diff < 2.0, f"mean uint8 mask diff {mean_diff}"

    a = my_mask > 127
    b = ref_mask > 127
    union = np.logical_or(a, b).sum()
    if union > 0:
        iou = np.logical_and(a, b).sum() / union
        assert iou >= 0.99, f"mask IoU {iou:.4f} < 0.99"
