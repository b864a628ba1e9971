"""SegDetectorRepresenter — public API mirroring the reference
(utils/db_utils.py:32-211), running its pixel stage on device.

Usage matches the reference::

    rep = SegDetectorRepresenter(thresh=0.3)
    boxes_batch, scores_batch = rep(input_size, lines_map)

``lines_map`` may be a jax array (B, H, W, 2) NHWC (this framework's layout)
or (B, 2, H, W) NCHW / numpy (reference layout) — channel 0 is the shrink
map either way.
"""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np

from comic_text_detector_tpu.constants import MAX_DB_COMPONENTS
from comic_text_detector_tpu.ops.db_decode import (
    boxes_from_stats,
    db_device_decode,
    polygons_from_stats,
)


class SegDetectorRepresenter:
    def __init__(
        self,
        thresh: float = 0.3,
        box_thresh: float = 0.7,
        max_candidates: int = 1000,
        unclip_ratio: float = 1.5,
        capacity: int = MAX_DB_COMPONENTS,
    ):
        self.min_size = 3
        self.thresh = thresh
        self.box_thresh = box_thresh
        self.max_candidates = max_candidates
        self.unclip_ratio = unclip_ratio
        self.capacity = capacity

    def _shrink_maps(self, pred) -> np.ndarray:
        """-> (B, H, W) shrink probability maps, accepting NHWC or NCHW."""
        arr = pred
        if hasattr(arr, "shape") and arr.ndim == 4:
            # NCHW if the channel dim is small and comes before spatial dims
            if arr.shape[1] in (1, 2, 3, 4) and arr.shape[1] < arr.shape[-1]:
                return jnp.asarray(arr)[:, 0, :, :]
            return jnp.asarray(arr)[:, :, :, 0]
        raise ValueError(f"expected 4-D prediction, got shape {getattr(arr, 'shape', None)}")

    def __call__(self, batch, pred, is_output_polygon: bool = False):
        """Returns (boxes_batch, scores_batch) — lists over the batch, quad
        arrays (N,4,2) in quad mode, ragged polygon lists in polygon mode."""
        shrink = self._shrink_maps(pred)
        b, h, w = shrink.shape
        boxes_batch, scores_batch = [], []
        for bi in range(b):
            stats = db_device_decode(shrink[bi], self.thresh, self.capacity)
            if is_output_polygon:
                boxes, scores = polygons_from_stats(
                    stats, w, h, w, h,
                    unclip_ratio=self.unclip_ratio,
                    box_thresh=self.box_thresh,
                    min_size=self.min_size,
                    max_candidates=self.max_candidates,
                )
            else:
                boxes, scores = boxes_from_stats(
                    stats, w, h, w, h,
                    unclip_ratio=self.unclip_ratio,
                    max_candidates=self.max_candidates,
                )
            boxes_batch.append(boxes)
            scores_batch.append(np.asarray(scores))
        return boxes_batch, scores_batch
