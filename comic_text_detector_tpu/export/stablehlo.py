"""Deployment export via jax.export (StableHLO).

The TPU-native equivalent of the reference's ONNX export chain
(utils/export.py:23-58: concate_models + export_onnx + onnxsim +
cv2.dnn backend): the fused 3-head forward is serialized as a portable
StableHLO artifact that any JAX runtime reloads without the Python model
definition — and a parity checker replaces the reference's
torch-vs-OpenCV-DNN cross-backend regression test (inference.py:202-209).
"""

from __future__ import annotations

import json
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from comic_text_detector_tpu.config import YOLOV5S_CFG
from comic_text_detector_tpu.models.detector import build_inference_model


def concate_models(blk_vars: dict, seg_vars: dict, det_vars: dict) -> dict:
    """Merge per-component variable trees into one TextDetBase tree
    (reference concate_models, export.py:23-28).

    ``blk_vars`` is a full YoloGraph variables dict; ``seg_vars``/``det_vars``
    are head trees (e.g. the 'seg_net'/'dbnet' subtrees of trained states).
    """
    return {
        "params": {
            "blk_det": blk_vars["params"],
            "text_seg": seg_vars["params"],
            "text_det": det_vars["params"],
        },
        "batch_stats": {
            "blk_det": blk_vars.get("batch_stats", {}),
            "text_seg": seg_vars.get("batch_stats", {}),
            "text_det": det_vars.get("batch_stats", {}),
        },
    }


def export_stablehlo(
    variables: dict,
    path: str,
    input_size: int = 1024,
    act: str = "leaky",
    cfg: Optional[dict] = None,
    dtype=jnp.float32,
) -> None:
    """Serialize the fused forward (weights baked in) to ``path``.

    Outputs are (blk, seg, det) like the reference's ONNX output names.
    """
    from jax import export as jexport

    model = build_inference_model(cfg or YOLOV5S_CFG, act=act, dtype=dtype)
    variables = jax.device_get(variables)

    def forward(img):
        return model.apply(variables, img)

    spec = jax.ShapeDtypeStruct((1, input_size, input_size, 3), jnp.float32)
    exported = jexport.export(jax.jit(forward))(spec)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    with open(path + ".json", "w") as f:
        json.dump(
            {
                "input": [1, input_size, input_size, 3],
                "outputs": ["blk", "seg", "det"],
                "act": act,
                "format": "jax.export/stablehlo",
            },
            f,
        )


def load_exported(path: str):
    """Reload an exported artifact; returns a callable img -> (blk, seg, det)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return lambda img: exported.call(jnp.asarray(img, jnp.float32))


def parity_check(
    variables: dict,
    path: str,
    input_size: int = 1024,
    act: str = "leaky",
    cfg: Optional[dict] = None,
    atol: float = 1e-4,
) -> Tuple[bool, float]:
    """Run the live model and the exported artifact on the same random input
    and compare — the cross-backend regression check."""
    model = build_inference_model(cfg or YOLOV5S_CFG, act=act)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, input_size, input_size, 3), jnp.float32)
    live = model.apply(variables, x)
    fn = load_exported(path)
    exported = fn(x)
    max_diff = 0.0
    for a, b in zip(live, exported):
        max_diff = max(max_diff, float(jnp.max(jnp.abs(a - b))))
    return max_diff <= atol, max_diff
