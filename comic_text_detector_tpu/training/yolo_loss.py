"""YOLOv5 detection loss, built for the TPU training step.

The reference repo ships its block detector as an externally pre-trained
yolov5 (SURVEY §2.1 row 22: the synthetic renderer exists to produce YOLO
labels, but no detection trainer is in-repo).  This module closes that loop
so the whole 3-head model can be trained inside this framework.

Design: the classic v5 target assignment (anchor wh-ratio gate + the
center/neighbor 3-cell spread) produces a *ragged* list of positives in the
torch implementation.  Here labels ride to the device as a fixed (B, L, 5)
padded tensor and the assignment runs in-graph: every (label, anchor,
offset) candidate is scored in parallel and scattered into *dense* per-level
target maps (B, na, H, W, 6) — a few hundred scattered rows, static shapes,
no host round trips.  The loss is then pure elementwise math over the dense
maps, which XLA fuses with the forward pass.

Semantics match yolov5's ComputeLoss/build_targets (public algorithm;
reference utils/yolov5_utils.py only ships the inference half): wh-ratio
gate ``max(w/aw, aw/w, h/ah, ah/h) < anchor_t``, 0.5-cell neighbor spread,
CIoU box loss, IoU-valued objectness targets with per-level balance, BCE
class loss.  One deviation: overlapping candidates that land on the same
(cell, anchor) keep one winner (last scatter) instead of duplicate loss
rows — duplicates are rare and their v5 handling is an artifact of the
ragged formulation.
"""

from __future__ import annotations

import math
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

ANCHOR_T = 4.0  # wh-ratio gate (v5 hyp.anchor_t)
BALANCE = (4.0, 1.0, 0.4)  # per-level objectness balance (v5, 3 levels)


def ciou_xywh(box1: jax.Array, box2: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Complete-IoU between center-format boxes (..., 4) -> (...,)."""
    x1, y1, w1, h1 = box1[..., 0], box1[..., 1], box1[..., 2], box1[..., 3]
    x2, y2, w2, h2 = box2[..., 0], box2[..., 1], box2[..., 2], box2[..., 3]
    l1, r1, t1, b1 = x1 - w1 / 2, x1 + w1 / 2, y1 - h1 / 2, y1 + h1 / 2
    l2, r2, t2, b2 = x2 - w2 / 2, x2 + w2 / 2, y2 - h2 / 2, y2 + h2 / 2
    inter = jnp.clip(jnp.minimum(r1, r2) - jnp.maximum(l1, l2), 0) * jnp.clip(
        jnp.minimum(b1, b2) - jnp.maximum(t1, t2), 0
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    cw = jnp.maximum(r1, r2) - jnp.minimum(l1, l2)
    ch = jnp.maximum(b1, b2) - jnp.minimum(t1, t2)
    c2 = cw * cw + ch * ch + eps
    rho2 = (x2 - x1) ** 2 + (y2 - y1) ** 2
    v = (4 / math.pi**2) * jnp.square(
        jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))
    )
    alpha = v / (v - iou + (1 + eps))
    alpha = jax.lax.stop_gradient(alpha)
    return iou - (rho2 / c2 + v * alpha)


def _level_targets(
    labels: jax.Array,  # (B, L, 5) [cls, x, y, w, h] normalized
    label_mask: jax.Array,  # (B, L) bool
    anchors_grid: jax.Array,  # (na, 2) anchor wh in grid units
    gh: int,
    gw: int,
) -> jax.Array:
    """Dense target map (B, na, gh, gw, 6): [tx, ty, tw, th, cls, pos].

    tx/ty are the v5 regression targets relative to the assigned cell
    (range (-0.5, 1.5)); tw/th in grid units.
    """
    b, l = labels.shape[:2]
    na = anchors_grid.shape[0]
    gxy = labels[..., 1:3] * jnp.asarray([gw, gh], jnp.float32)  # (B, L, 2)
    gwh = labels[..., 3:5] * jnp.asarray([gw, gh], jnp.float32)
    cls = labels[..., 0]

    # anchor gate: (B, L, na)
    r = gwh[:, :, None, :] / anchors_grid[None, None, :, :]
    ratio = jnp.maximum(r, 1.0 / jnp.maximum(r, 1e-9)).max(-1)
    match = (ratio < ANCHOR_T) & label_mask[:, :, None] & (gwh.prod(-1) > 0)[:, :, None]

    # neighbor spread: center + left/right + top/bottom (g = 0.5)
    g = 0.5
    fx, fy = gxy[..., 0] % 1.0, gxy[..., 1] % 1.0
    take_l = (fx < g) & (gxy[..., 0] > 1.0)
    take_r = (fx > g) & (gxy[..., 0] < gw - 1.0)
    take_t = (fy < g) & (gxy[..., 1] > 1.0)
    take_b = (fy > g) & (gxy[..., 1] < gh - 1.0)
    # offsets are SUBTRACTED from gxy before floor (v5 convention): +g pulls
    # the cell index left/up, -g pushes it right/down
    offs = jnp.asarray(
        [[0.0, 0.0], [g, 0.0], [-g, 0.0], [0.0, g], [0.0, -g]], jnp.float32
    )  # pairs with [center, take_l, take_r, take_t, take_b]
    off_ok = jnp.stack(
        [jnp.ones_like(take_l), take_l, take_r, take_t, take_b], axis=-1
    )  # (B, L, 5)

    # candidate grid: (B, L, na, 5)
    valid = match[:, :, :, None] & off_ok[:, :, None, :]
    cell = jnp.floor(gxy[:, :, None, None, :] - offs[None, None, None, :, :])
    cell = jnp.broadcast_to(cell, (b, l, na, 5, 2))
    gi = jnp.clip(cell[..., 0], 0, gw - 1)
    gj = jnp.clip(cell[..., 1], 0, gh - 1)
    txy = gxy[:, :, None, None, :] - jnp.stack([gi, gj], axis=-1)  # in (-0.5, 1.5)

    bidx = jnp.arange(b, dtype=jnp.int32)[:, None, None, None]
    aidx = jnp.arange(na, dtype=jnp.int32)[None, None, :, None]
    flat_idx = (
        ((bidx * na + aidx) * gh + gj.astype(jnp.int32)) * gw + gi.astype(jnp.int32)
    )
    flat_idx = jnp.where(valid, flat_idx, b * na * gh * gw)  # OOB rows drop

    rows = jnp.concatenate(
        [
            txy,
            jnp.broadcast_to(gwh[:, :, None, None, :], txy.shape),
            jnp.broadcast_to(cls[:, :, None, None, None], txy.shape[:-1] + (1,)),
            jnp.ones(txy.shape[:-1] + (1,), jnp.float32),
        ],
        axis=-1,
    )  # (B, L, na, 5, 6)

    dense = jnp.zeros((b * na * gh * gw, 6), jnp.float32)
    dense = dense.at[flat_idx.reshape(-1)].set(rows.reshape(-1, 6), mode="drop")
    return dense.reshape(b, na, gh, gw, 6)


def yolo_loss(
    raw: Sequence[jax.Array],  # per level (B, na, h, w, no)
    labels: jax.Array,  # (B, L, 5) [cls, x, y, w, h] normalized
    label_mask: jax.Array,  # (B, L)
    anchors: Tuple[Tuple[float, ...], ...],  # pixel units per level
    strides: Tuple[int, ...],
    nc: int,
    box_gain: float = 0.05,
    obj_gain: float = 1.0,
    cls_gain: float = 0.3,
) -> Dict[str, jax.Array]:
    """v5 composite loss over the raw Detect maps; returns metric dict."""
    lbox = lobj = lcls = 0.0
    for i, p in enumerate(raw):
        b, na, gh, gw, no = p.shape
        anchors_grid = (
            jnp.asarray(anchors[i], jnp.float32).reshape(na, 2) / float(strides[i])
        )
        t = _level_targets(labels, label_mask, anchors_grid, gh, gw)
        pos = t[..., 5] > 0
        n_pos = jnp.maximum(pos.sum(), 1.0)

        pf = p.astype(jnp.float32)
        pxy = jax.nn.sigmoid(pf[..., 0:2]) * 2.0 - 0.5
        pwh = jnp.square(jax.nn.sigmoid(pf[..., 2:4]) * 2.0) * anchors_grid[
            None, :, None, None, :
        ]
        iou = ciou_xywh(
            jnp.concatenate([pxy, pwh], -1), t[..., 0:4]
        )  # (B, na, gh, gw)
        lbox = lbox + jnp.sum((1.0 - iou) * pos) / n_pos

        tobj = pos * jnp.clip(jax.lax.stop_gradient(iou), 0.0)
        bce_obj = sigmoid_bce(pf[..., 4], tobj)
        lobj = lobj + bce_obj.mean() * BALANCE[i % len(BALANCE)]

        if nc > 1:
            tcls = jax.nn.one_hot(t[..., 4].astype(jnp.int32), nc)
            bce_cls = sigmoid_bce(pf[..., 5:], tcls).sum(-1)
            lcls = lcls + jnp.sum(bce_cls * pos) / (n_pos * nc)

    loss = box_gain * lbox + obj_gain * lobj + cls_gain * lcls
    return {"loss": loss, "lbox": lbox, "lobj": lobj, "lcls": lcls}


def sigmoid_bce(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Numerically-stable sigmoid BCE (elementwise)."""
    return jnp.clip(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
