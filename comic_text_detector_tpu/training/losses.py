"""Training losses (JAX), NHWC.

Functional equivalents of the reference's utils/loss.py: BinaryDiceLoss
(:10-47) for U-Net mask training; the DBNet loss family — OHEM-balanced BCE
(:50-100), heatmap Dice (:103-137), masked L1 (:140-147) and their
3·shrink + 1·thresh + binary combination ``DBLoss`` (:149-187).

The OHEM top-k (dynamic k) is expressed TPU-style as a sort + rank mask so
shapes stay static under jit.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def binary_dice_loss(predict: jax.Array, target: jax.Array, smooth: float = 1.0, p: float = 2.0) -> jax.Array:
    """Dice over flattened per-sample maps, mean over batch."""
    b = predict.shape[0]
    pred = predict.reshape(b, -1).astype(jnp.float32)
    tgt = target.reshape(b, -1).astype(jnp.float32)
    num = jnp.sum(pred * tgt, axis=1) + smooth
    den = jnp.sum(pred**p + tgt**p, axis=1) + smooth
    return jnp.mean(1.0 - num / den)


def balance_bce_loss(
    logits: jax.Array,
    gt: jax.Array,
    mask: jax.Array,
    negative_ratio: float = 3.0,
    eps: float = 1e-6,
) -> jax.Array:
    """OHEM-balanced BCE-with-logits: all positives + top (3x) hardest
    negatives.  ``logits/gt`` (B,H,W), ``mask`` (B,H,W) valid-region mask."""
    logits = logits.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    positive = gt * mask
    negative = (1.0 - gt) * mask
    pos_count = jnp.sum(positive)
    neg_count = jnp.minimum(jnp.sum(negative), pos_count * negative_ratio)

    loss = jnp.maximum(logits, 0) - logits * gt + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    pos_sum = jnp.sum(loss * positive)
    neg_losses = (loss * negative).reshape(-1)
    neg_sorted = jnp.sort(neg_losses)[::-1]
    rank = jnp.arange(neg_sorted.shape[0], dtype=jnp.float32)
    neg_sum = jnp.sum(jnp.where(rank < neg_count, neg_sorted, 0.0))
    return (pos_sum + neg_sum) / (pos_count + neg_count + eps)


def dice_loss(pred: jax.Array, gt: jax.Array, mask: jax.Array, weights: Optional[jax.Array] = None, eps: float = 1e-6) -> jax.Array:
    """Heatmap dice (B,H,W) with valid mask."""
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    if weights is not None:
        mask = weights * mask
    intersection = jnp.sum(pred * gt * mask)
    union = jnp.sum(pred * mask) + jnp.sum(gt * mask) + eps
    return 1.0 - 2.0 * intersection / union


def mask_l1_loss(pred: jax.Array, gt: jax.Array, mask: jax.Array, eps: float = 1e-6) -> jax.Array:
    mask = mask.astype(jnp.float32)
    return jnp.sum(jnp.abs(pred.astype(jnp.float32) - gt.astype(jnp.float32)) * mask) / (jnp.sum(mask) + eps)


def db_loss(
    pred: jax.Array,
    batch: Dict[str, jax.Array],
    use_bce: bool = True,
    alpha: float = 3.0,
    beta: float = 1.0,
    ohem_ratio: float = 3.0,
) -> Dict[str, jax.Array]:
    """DBNet composite loss on NHWC head output.

    ``pred`` channels: 0 shrink (sigmoid), 1 thresh, 2 binary
    [, 3 raw logits when use_bce].  ``batch`` keys: shrink_map, shrink_mask,
    threshold_map, threshold_mask (each (B,H,W)).
    """
    shrink_maps = pred[..., 0]
    threshold_maps = pred[..., 1]
    binary_maps = pred[..., 2]

    if use_bce:
        loss_shrink = balance_bce_loss(
            pred[..., 3], batch["shrink_map"], batch["shrink_mask"], ohem_ratio
        ) + dice_loss(shrink_maps, batch["shrink_map"], batch["shrink_mask"])
    else:
        loss_shrink = dice_loss(shrink_maps, batch["shrink_map"], batch["shrink_mask"])

    loss_thresh = mask_l1_loss(threshold_maps, batch["threshold_map"], batch["threshold_mask"])
    metrics = dict(loss_shrink_maps=loss_shrink, loss_threshold_maps=loss_thresh)
    # Binary channel: the reference feeds the binary *probability* map to
    # BCE-with-logits (utils/loss.py:181) — probabilities-as-logits.  We
    # reproduce that composition exactly to match training dynamics.
    loss_binary = dice_loss(binary_maps, batch["shrink_map"], batch["shrink_mask"]) + balance_bce_loss(
        binary_maps, batch["shrink_map"], batch["shrink_mask"], ohem_ratio
    )
    metrics["loss_binary_maps"] = loss_binary
    metrics["loss"] = alpha * loss_shrink + beta * loss_thresh + loss_binary
    return metrics
