"""Composite models: fused 3-head inference net and train-time composition.

``TextDetBase`` mirrors the reference inference net (basemodel.py:222-244):
one forward = YOLO graph (detections + backbone taps) -> UNet head (mask +
intermediate features) -> DB head (shrink/thresh maps).  Everything compiles
to a single XLA graph; on TPU run it under jit with bf16 compute.

``TextDetTrain`` mirrors the train-time composition (basemodel.py:162-209):
frozen backbone (eval mode + stop_gradient), one trainable head selected by
``forward_mode``.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from comic_text_detector_tpu.config import OUT_INDICES, GraphSpec, backbone_spec, full_spec
from comic_text_detector_tpu.constants import TEXTDET_DET, TEXTDET_INFERENCE, TEXTDET_MASK
from comic_text_detector_tpu.models.heads import DBHead, UnetHead
from comic_text_detector_tpu.models.yolo import YoloGraph

Dtype = Any


class TextDetBase(nn.Module):
    """Fused inference net: (B,H,W,3) image in [0,1] ->
    (blks (B,N,7), mask (B,H,W,1), lines (B,H,W,2)).

    The YOLO graph runs with SiLU (its checkpoint's activation); the seg/det
    heads run with the ``act`` the deployed checkpoint was trained with
    ('leaky', reference inference.py:24,120).
    """

    spec: GraphSpec
    act: str = "leaky"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        blks, z = YoloGraph(
            spec=self.spec, out_indices=OUT_INDICES, act="silu", dtype=self.dtype, name="blk_det"
        )(x.astype(self.dtype), detect=True)
        mask, feats = UnetHead(act=self.act, dtype=self.dtype, name="text_seg")(
            *z, forward_mode=TEXTDET_INFERENCE
        )
        lines = DBHead(64, act=self.act, dtype=self.dtype, name="text_det")(*feats)
        return blks, mask, lines


class TextDetTrain(nn.Module):
    """Train-time composite: truncated backbone + UnetHead (+ DBHead).

    ``forward_mode``:
      * TEXTDET_MASK — returns the full-res mask (UNet training).
      * TEXTDET_DET  — backbone + UNet trunk frozen, returns DBHead maps.

    By default the backbone runs in eval mode behind ``stop_gradient``
    (reference basemodel.py:200-209 wraps it in no_grad and .eval()).
    ``freeze_backbone=False`` lets gradients flow into the backbone for
    from-scratch training — the reference always starts from a pretrained
    yolov5, an option unavailable when bootstrapping purely on synthetic
    data.  Backbone BN stays in eval mode either way (stable with small
    batches; running stats keep their initialized values).
    """

    spec: GraphSpec  # backbone-only spec (config.backbone_spec())
    act: str = "leaky"
    dtype: Dtype = jnp.float32
    with_db: bool = False
    freeze_backbone: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, forward_mode: int = TEXTDET_MASK, train: bool = False):
        z = YoloGraph(
            spec=self.spec, out_indices=OUT_INDICES, act="silu", dtype=self.dtype, name="backbone"
        )(x.astype(self.dtype), train=False)
        if self.freeze_backbone:
            z = [jax.lax.stop_gradient(f) for f in z]
        if forward_mode == TEXTDET_MASK:
            return UnetHead(act=self.act, dtype=self.dtype, name="seg_net")(
                *z, forward_mode=TEXTDET_MASK, train=train
            )
        # DB training: UNet trunk frozen too (basemodel.py:207-209).
        feats = UnetHead(act=self.act, dtype=self.dtype, name="seg_net")(
            *z, forward_mode=TEXTDET_DET, train=False
        )
        feats = [jax.lax.stop_gradient(f) for f in feats]
        return DBHead(64, act=self.act, dtype=self.dtype, name="dbnet")(*feats, train=train)


class BlkDetTrain(nn.Module):
    """Train-time block detector: the FULL yolo graph (backbone + neck +
    Detect) under the deploy name ``blk_det`` so trained params transplant
    directly into the inference checkpoint.

    The reference trains its yolov5 externally (no in-repo trainer); this
    module + training/yolo_loss.py + training/yolo_trainer.py complete the
    3-head training story inside the framework.  ``decode=False`` returns
    the raw per-level (B, na, h, w, no) maps the loss consumes.
    """

    spec: GraphSpec  # full graph spec (config.full_spec())
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False, decode: bool = False):
        return YoloGraph(
            spec=self.spec, out_indices=OUT_INDICES, act="silu", dtype=self.dtype, name="blk_det"
        )(x.astype(self.dtype), train=train, detect=True, decode=decode)


def build_inference_model(
    cfg: Optional[dict] = None, act: str = "leaky", dtype: Dtype = jnp.float32
) -> TextDetBase:
    return TextDetBase(spec=full_spec(cfg), act=act, dtype=dtype)


def build_blk_train_model(cfg: Optional[dict] = None, dtype: Dtype = jnp.float32) -> BlkDetTrain:
    return BlkDetTrain(spec=full_spec(cfg), dtype=dtype)


def build_train_model(
    cfg: Optional[dict] = None,
    act: str = "leaky",
    dtype: Dtype = jnp.float32,
    with_db: bool = False,
    freeze_backbone: bool = True,
) -> TextDetTrain:
    return TextDetTrain(
        spec=backbone_spec(cfg), act=act, dtype=dtype, with_db=with_db, freeze_backbone=freeze_backbone
    )


def init_variables(model: nn.Module, rng: jax.Array, input_size: int = 640, batch: int = 1, **kwargs):
    x = jnp.zeros((batch, input_size, input_size, 3), jnp.float32)
    return model.init(rng, x, **kwargs)


def damp_output_biases(variables: dict, value: float = -8.0, parts=("detect", "db")) -> dict:
    """Shift detection/DB output biases so a randomly initialized net emits
    (near-)empty predictions — random conv weights otherwise threshold into
    page-sized noise blobs, which is not a workload any trained detector
    produces.  Used by benchmarks/tests that need realistic output sparsity
    without trained weights.  ``parts`` selects which outputs to damp
    ('detect' = YOLO objectness, 'db' = DB towers) — e.g. a checkpoint with
    trained seg/DB heads but an untrained block detector damps only 'detect'.
    """
    variables = jax.tree_util.tree_map(lambda x: x, variables)
    params = variables["params"]
    if "detect" in parts:
        det = params.get("blk_det", {})
        for name, sub in det.items():
            if name.startswith("model_") and any(k.startswith("m_") for k in sub):
                for mk, conv in sub.items():
                    if mk.startswith("m_") and "bias" in conv:
                        b = jnp.asarray(conv["bias"])
                        na = 3
                        no = b.shape[0] // na
                        b = b.reshape(na, no).at[:, 4].set(value).reshape(-1)
                        conv["bias"] = b
    if "db" in parts:
        db = params.get("text_det", {})
        for tower in ("binarize", "thresh"):
            if tower in db and "seq6" in db[tower] and "bias" in db[tower]["seq6"]:
                db[tower]["seq6"]["bias"] = jnp.full_like(jnp.asarray(db[tower]["seq6"]["bias"]), value)
    return variables
