"""End-user pipeline: TextDetector (reference-compatible API) + batch tools."""

from comic_text_detector_tpu.pipeline.detector import TextDetector  # noqa: F401
from comic_text_detector_tpu.pipeline.annotations import model2annotations, traverse_by_dict  # noqa: F401
