"""StableHLO backend through the TextDetector API + viz utils."""

import numpy as np
import pytest

import jax

from comic_text_detector_tpu.export import export_stablehlo
from comic_text_detector_tpu.models.detector import build_inference_model, init_variables
from comic_text_detector_tpu.pipeline import TextDetector
from comic_text_detector_tpu.utils.viz import Colors, draw_bbox, draw_connected_labels, hex2bgr


@pytest.mark.slow
def test_stablehlo_backend_pipeline(tmp_path, rng):
    model = build_inference_model(act="leaky")
    variables = init_variables(model, jax.random.PRNGKey(0), input_size=128)
    path = str(tmp_path / "m.stablehlo")
    export_stablehlo(variables, path, input_size=128)

    det_live = TextDetector(variables=variables, input_size=128, act="leaky")
    det_hlo = TextDetector(model_path=path, input_size=128)
    assert det_hlo.backend == "stablehlo"
    img = rng.integers(0, 256, (200, 160, 3), dtype=np.uint8)
    m1, _, b1 = det_live(img)
    m2, _, b2 = det_hlo(img)
    assert np.abs(m1.astype(int) - m2.astype(int)).max() <= 1
    assert len(b1) == len(b2)


def test_viz_utils(rng):
    img = rng.integers(0, 256, (80, 100, 3), dtype=np.uint8)
    pred = np.array([[10, 10, 60, 40, 0.9, 0], [20, 50, 90, 70, 0.8, 1]])
    out = draw_bbox(pred, img)
    assert out.shape == img.shape and (out != img).any()
    assert Colors()(0) != Colors()(1)
    labels = np.zeros((20, 20), np.int32)
    labels[5:10, 5:10] = 1
    canvas = draw_connected_labels(2, labels, None, None)
    assert (canvas[5:10, 5:10] != 0).any()
    assert hex2bgr(np.array([0xFF0000]))[0][0] == 255
