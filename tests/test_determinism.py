"""Determinism checks — the framework's race-detection analog: repeated runs
through the (threaded) pipelines must be bit-identical."""

import numpy as np
import pytest

from comic_text_detector_tpu.pipeline import TextDetector
from comic_text_detector_tpu.pipeline.batch import BatchTextDetector
from comic_text_detector_tpu.utils.io import imread


@pytest.fixture(scope="module")
def page():
    img = imread("/root/reference/data/examples/AisazuNihaIrarenai-003.jpg")
    from comic_text_detector_tpu.ops.resize import resize_bilinear_np

    return resize_bilinear_np(img, (img.shape[0] // 4, img.shape[1] // 4))


@pytest.mark.slow
def test_detector_deterministic(page):
    det = TextDetector.random_init(input_size=256)
    m1, r1, b1 = det(page)
    m2, r2, b2 = det(page)
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(r1, r2)
    assert len(b1) == len(b2)
    for a, b in zip(b1, b2):
        assert a.xyxy == b.xyxy and a.lines == b.lines


@pytest.mark.slow
def test_stream_deterministic_and_error_propagation(page):
    bdet = BatchTextDetector.random_init(batch_size=2, input_size=256, half=False)
    out1 = list(bdet.stream(iter([page, page, page])))
    out2 = list(bdet.stream(iter([page, page, page])))
    assert len(out1) == len(out2) == 3
    np.testing.assert_array_equal(out1[0][0], out2[0][0])

    def bad_source():
        yield page
        raise RuntimeError("decode failed")

    with pytest.raises(RuntimeError, match="decode failed"):
        list(bdet.stream(bad_source()))
