"""Augmented (multi-scale/flip) inference vs the reference torch path."""

import numpy as np

import jax.numpy as jnp

from comic_text_detector_tpu.config import OUT_INDICES, YOLOV5S_CFG, full_spec
from comic_text_detector_tpu.models.convert import convert_state_dict
from comic_text_detector_tpu.models.yolo import YoloGraph, augmented_detect

from tests import oracles


def test_augmented_detect_matches_reference():
    import torch

    oracles.load_reference()
    tm = oracles.build_torch_yolo(YOLOV5S_CFG, out_indices=OUT_INDICES)
    tm.out_indices = None  # reference augment path uses the plain forward
    x = torch.rand(1, 3, 192, 192)
    with torch.no_grad():
        ref, _ = tm(x, augment=True)

    variables = convert_state_dict(tm.state_dict())
    model = YoloGraph(spec=full_spec(YOLOV5S_CFG), out_indices=OUT_INDICES, act="silu")
    got = augmented_detect(model, variables, jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))))
    assert got.shape == tuple(ref.shape)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=2e-3, atol=5e-3)
