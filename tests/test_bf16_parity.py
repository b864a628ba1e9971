"""bf16 compute (the TPU default) vs f32: mask agreement must stay within
the IoU budget — validates running the deployed pipeline in bf16."""

import numpy as np
import pytest

from comic_text_detector_tpu.config import YOLOV5S_CFG
from comic_text_detector_tpu.models.convert import convert_combined_checkpoint
from comic_text_detector_tpu.pipeline import TextDetector
from comic_text_detector_tpu.utils.io import imread

from tests.test_textdetbase import make_torch_combo


@pytest.mark.slow
def test_bf16_mask_close_to_f32():
    _, _, _, ckpt = make_torch_combo(seed=11)
    variables, _ = convert_combined_checkpoint(ckpt)
    img = imread("/root/reference/data/examples/AisazuNihaIrarenai-003.jpg")
    from comic_text_detector_tpu.ops.resize import resize_bilinear_np

    img = resize_bilinear_np(img, (img.shape[0] // 4, img.shape[1] // 4))

    det32 = TextDetector(variables=variables, cfg=YOLOV5S_CFG, input_size=256, act="leaky")
    det16 = TextDetector(variables=variables, cfg=YOLOV5S_CFG, input_size=256, act="leaky", half=True)
    m32, _, b32 = det32(img)
    m16, _, b16 = det16(img)

    a = m32 > 127
    b = m16 > 127
    union = np.logical_or(a, b).sum()
    if union > 0:
        iou = np.logical_and(a, b).sum() / union
        assert iou >= 0.98, f"bf16-vs-f32 mask IoU {iou:.4f}"
    assert abs(len(b32) - len(b16)) <= max(2, int(0.1 * max(len(b32), 1)))
