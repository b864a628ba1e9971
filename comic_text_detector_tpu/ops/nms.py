"""Fixed-shape non-maximum suppression for TPU.

Replaces the reference's torchvision.ops.nms call (utils/yolov5_utils.py:202)
with an XLA-friendly formulation: top-K candidate selection, a KxK IoU
matrix, and iterative suppression that converges to the exact greedy-NMS
fixpoint (keep[j] = valid[j] ∧ ∀i<j: ¬(keep[i] ∧ iou[i,j]>t)) — the standard
TPU NMS recipe.  Everything is static-shape; the ragged result is carried as
(boxes, count).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from comic_text_detector_tpu.constants import MAX_DET, MAX_NMS_CANDIDATES


def xywh2xyxy(x: jax.Array) -> jax.Array:
    """(..., 4) center-format -> corner-format boxes."""
    cx, cy, w, h = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def box_iou_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU of xyxy boxes a (N,4) x b (M,4) -> (N,M)."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-9)


def _greedy_keep(iou: jax.Array, valid: jax.Array, iou_thresh: float) -> jax.Array:
    """Exact greedy-NMS keep mask for score-desc-sorted boxes.

    Fixpoint iteration: a box is kept iff no kept higher-scoring box overlaps
    it.  Converges in at most K steps; suppression chains in practice are a
    handful deep, so the while_loop exits early via the change test.
    """
    k = iou.shape[0]
    over = (iou > iou_thresh) & (jnp.arange(k)[:, None] < jnp.arange(k)[None, :])

    def cond(state):
        keep, prev, it = state
        return (it < k) & jnp.any(keep != prev)

    def body(state):
        keep, _, it = state
        # suppressed[j] = any kept i<j with overlap
        sup = jnp.any(over & keep[:, None], axis=0)
        return valid & ~sup, keep, it + 1

    keep0 = valid
    keep, _, _ = jax.lax.while_loop(cond, body, (keep0, jnp.zeros_like(keep0), 0))
    return keep


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def nms_single(
    pred: jax.Array,
    conf_thresh: float | jax.Array,
    iou_thresh: float | jax.Array,
    max_det: int = MAX_DET,
    max_nms: int = MAX_NMS_CANDIDATES,
    class_agnostic: bool = False,
    multi_label: bool = False,
    classes: Tuple[int, ...] | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """NMS over one image's raw detections.

    Args:
      pred: (N, 5+nc) rows [cx, cy, w, h, obj, cls...] (Detect decode output).
      class_agnostic: suppress across classes (reference ``agnostic``).
      multi_label: one candidate per (box, class) over threshold instead of
        best-class-only (reference ``multi_label``; no-op for nc == 1).
      classes: static tuple of class ids to keep (reference ``classes``).
    Returns:
      out: (max_det, 6) rows [x1, y1, x2, y2, conf, cls], zero-padded.
      count: number of valid rows.

    Semantics match the reference non_max_suppression
    (utils/yolov5_utils.py:124-218): obj>thresh candidate filter, conf =
    obj*cls_conf with a second conf>thresh filter, class-offset (4096 px)
    batched NMS.  The reference's 10 s wall-clock guard has no analog — this
    formulation is fixed-shape, so its runtime is workload-independent.
    """
    max_wh = 4096.0
    n, nc = pred.shape[0], pred.shape[-1] - 5
    obj = pred[:, 4]
    if multi_label and nc > 1:
        # every (box, class) pair over threshold is its own candidate
        conf = (obj[:, None] * pred[:, 5:]).reshape(-1)
        cls = jnp.tile(jnp.arange(nc, dtype=jnp.float32), n)
        box_idx = jnp.repeat(jnp.arange(n), nc)
        valid = (jnp.repeat(obj, nc) > conf_thresh) & (conf > conf_thresh)
    else:
        conf = obj * jnp.max(pred[:, 5:], axis=-1)
        cls = jnp.argmax(pred[:, 5:], axis=-1).astype(jnp.float32)
        box_idx = jnp.arange(n)
        valid = (obj > conf_thresh) & (conf > conf_thresh)
    if classes is not None:
        allowed = jnp.asarray(classes, jnp.float32)
        valid &= jnp.any(cls[:, None] == allowed[None, :], axis=-1)
    scores = jnp.where(valid, conf, -1.0)

    k = min(max_nms, scores.shape[0])
    top_scores, idx = jax.lax.top_k(scores, k)
    top_valid = top_scores > 0
    boxes = xywh2xyxy(pred[box_idx[idx], :4])
    ccls = cls[idx]
    off = jnp.where(class_agnostic, 0.0, ccls * max_wh)
    iou = box_iou_matrix(boxes + off[:, None], boxes + off[:, None])
    keep = _greedy_keep(iou, top_valid, iou_thresh)

    # compact kept rows to the front, fixed size max_det
    kept_scores = jnp.where(keep, top_scores, -1.0)
    m = min(max_det, k)
    sel_scores, sel = jax.lax.top_k(kept_scores, m)
    sel_valid = sel_scores > 0
    rows = jnp.concatenate(
        [boxes[sel], top_scores[sel][:, None], ccls[sel][:, None]], axis=-1
    )
    rows = jnp.where(sel_valid[:, None], rows, 0.0)
    if m < max_det:
        rows = jnp.pad(rows, ((0, max_det - m), (0, 0)))
        sel_valid = jnp.pad(sel_valid, (0, max_det - m))
    return rows, jnp.sum(sel_valid.astype(jnp.int32))


def nms_batch(pred: jax.Array, conf_thresh, iou_thresh, max_det: int = MAX_DET, max_nms: int = MAX_NMS_CANDIDATES):
    """vmapped NMS over (B, N, 5+nc). Returns ((B,max_det,6), (B,))."""
    fn = lambda p: nms_single(p, conf_thresh, iou_thresh, max_det, max_nms)
    return jax.vmap(fn)(pred)
