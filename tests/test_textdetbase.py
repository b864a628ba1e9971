"""End-to-end parity of the fused 3-head inference net vs a torch composition
mirroring the reference TextDetBase (basemodel.py:222-244)."""

import numpy as np

import jax.numpy as jnp

from comic_text_detector_tpu.config import YOLOV5S_CFG
from comic_text_detector_tpu.constants import TEXTDET_INFERENCE
from comic_text_detector_tpu.models.convert import convert_combined_checkpoint
from comic_text_detector_tpu.models.detector import build_inference_model

from tests import oracles


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def make_torch_combo(seed=0):
    """(blk_det fused, text_seg, text_det) torch modules + combined-ckpt dict."""
    import torch

    blk = oracles.build_torch_yolo(YOLOV5S_CFG, seed=seed, fuse=True)
    seg = oracles.build_torch_unet(act="leaky", seed=seed + 1)
    det = oracles.build_torch_dbhead(act="leaky", seed=seed + 2)
    ckpt = {
        "blk_det": {"cfg": oracles.torch_cfg(YOLOV5S_CFG), "weights": blk.state_dict()},
        "text_seg": seg.state_dict(),
        "text_det": det.state_dict(),
    }
    return blk, seg, det, ckpt


def test_textdetbase_matches_reference_composition():
    import torch

    blk, seg, det, ckpt = make_torch_combo()
    x = torch.rand(1, 3, 128, 128)
    with torch.no_grad():
        (dets, _), z = blk(x, detect=True)
        mask, feats = seg(*z, forward_mode=TEXTDET_INFERENCE)
        lines = det(*feats)

    variables, _cfg = convert_combined_checkpoint(ckpt)
    model = build_inference_model(YOLOV5S_CFG, act="leaky")
    jblks, jmask, jlines = model.apply(variables, jnp.asarray(_nhwc(x)))

    np.testing.assert_allclose(np.asarray(jblks), dets.numpy(), rtol=5e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(jmask), _nhwc(mask), rtol=5e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(jlines), _nhwc(lines), rtol=5e-4, atol=1e-3)
