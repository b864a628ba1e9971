"""Scaling: device meshes, sharded inference/training steps, async loading."""

from comic_text_detector_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch_spec,
    replicated_spec,
)
