"""Primary user flow: TextDetector(model_path='combined.pt') — torch file on
disk with the ckpt-embedded (torch-format) cfg — plus cfg normalization and
anchor-order handling."""

import numpy as np
import pytest

from comic_text_detector_tpu.config import YOLOV5S_CFG, parse_graph
from comic_text_detector_tpu.pipeline import TextDetector

from tests import oracles


def test_textdetector_from_pt_file(tmp_path):
    import torch

    oracles.load_reference()
    blk = oracles.build_torch_yolo(YOLOV5S_CFG, seed=1, fuse=False)
    seg = oracles.build_torch_unet(act="leaky", seed=2)
    det = oracles.build_torch_dbhead(act="leaky", seed=3)
    ckpt = {
        "blk_det": {"cfg": oracles.torch_cfg(YOLOV5S_CFG), "weights": blk.state_dict()},
        "text_seg": seg.state_dict(),
        "text_det": det.state_dict(),
    }
    path = str(tmp_path / "combined.pt")
    torch.save(ckpt, path)

    d = TextDetector(model_path=path, input_size=128, act="leaky")
    img = np.random.default_rng(0).integers(0, 256, (200, 160, 3), dtype=np.uint8)
    mask, mask_refined, blk_list = d(img)
    assert mask.shape == (200, 160)
    assert isinstance(blk_list, list)


def test_parse_graph_normalizes_torch_cfg_names():
    cfg = oracles.torch_cfg(YOLOV5S_CFG)  # contains 'nn.Upsample'
    spec = parse_graph(cfg)
    mods = {ls.module for ls in spec.layers}
    assert "Upsample" in mods and "nn.Upsample" not in mods


def test_parse_graph_flips_descending_anchors():
    import copy

    cfg = copy.deepcopy(YOLOV5S_CFG)
    cfg["anchors"] = cfg["anchors"][::-1]  # P5 first (descending areas)
    spec = parse_graph(cfg)
    areas = [sum(a[i] * a[i + 1] for i in range(0, len(a), 2)) for a in spec.anchors]
    assert areas == sorted(areas), "anchors must ascend with stride order"


def test_load_from_parts(tmp_path):
    """Migration path: the reference's three separate training ckpts
    (blk ckpt + unet_best + db_best with {'weights': ...} wrappers)."""
    import torch

    from comic_text_detector_tpu.models.convert import load_from_parts
    from comic_text_detector_tpu.models.detector import build_inference_model

    oracles.load_reference()
    blk = oracles.build_torch_yolo(YOLOV5S_CFG, seed=4, fuse=False)
    seg = oracles.build_torch_unet(act="leaky", seed=5)
    det = oracles.build_torch_dbhead(act="leaky", seed=6)
    p_blk = str(tmp_path / "yolov5sblk.ckpt")
    p_seg = str(tmp_path / "unet_best.ckpt")
    p_det = str(tmp_path / "db_best.ckpt")
    torch.save({"cfg": oracles.torch_cfg(YOLOV5S_CFG), "weights": blk.state_dict()}, p_blk)
    torch.save({"weights": seg.state_dict(), "epoch": 3}, p_seg)
    torch.save({"weights": det.state_dict(), "epoch": 7}, p_det)

    variables, cfg = load_from_parts(p_blk, p_seg, p_det)
    model = build_inference_model(cfg, act="leaky")
    import jax.numpy as jnp

    out = model.apply(variables, jnp.zeros((1, 128, 128, 3), jnp.float32))
    assert len(out) == 3 and out[1].shape == (1, 128, 128, 1)
