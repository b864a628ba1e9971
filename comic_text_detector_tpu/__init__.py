"""comic_text_detector_tpu — a TPU-native comic/manga text detection framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
dmMaze/comic-text-detector (reference: /root/reference): text-block detection
(YOLOv5-style), text-line detection (DBNet-style), pixel text segmentation
(U-Net-style), plus the full weak-supervision training stack and batch
annotation tooling.

Design principles
-----------------
* One jitted XLA graph runs backbone + all three heads in NHWC bf16.
* Hot post-processing (NMS, DB binarization, connected components) runs on
  device with fixed shapes; only small, ragged polygon math runs on host.
* Scaling is mesh-based: ``jax.sharding.Mesh`` + ``pjit`` batch sharding over
  a ``data`` axis (see ``comic_text_detector_tpu.parallel``).
"""

__version__ = "0.1.0"

from comic_text_detector_tpu.constants import (  # noqa: F401
    LANG_LIST,
    LANGCLS2IDX,
    REFINEMASK_ANNOTATION,
    REFINEMASK_INPAINT,
)
