"""Jitted train/eval steps for the two head trainers.

Mirrors the reference training composition (basemodel.py:162-209,
train_seg.py:120-153, train_db.py:130-166): frozen backbone, one trainable
head, dice / DB losses, grad accumulation via optax.MultiSteps.  Steps are
mesh-ready: with params replicated and the batch dim sharded over a
``data`` mesh axis, XLA inserts the gradient all-reduce automatically.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from comic_text_detector_tpu.constants import TEXTDET_DET, TEXTDET_MASK
from comic_text_detector_tpu.training import losses


@flax.struct.dataclass
class TrainState:
    params: Any  # dict of trainable top-level subtrees ({'seg_net': ...}, ...)
    frozen: Any  # non-trainable params subtrees
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def _split_state(variables: Dict, tx, trainable_keys) -> TrainState:
    params = dict(variables["params"])
    trainable = {k: params.pop(k) for k in trainable_keys}
    return TrainState(
        params=trainable,
        frozen=params,
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(trainable),
        step=jnp.zeros((), jnp.int32),
    )


def create_seg_train_state(
    variables: Dict, tx: optax.GradientTransformation, train_backbone: bool = False
) -> TrainState:
    """``train_backbone=True`` adds the backbone to the trainable set —
    pair with ``build_train_model(freeze_backbone=False)``."""
    keys = ("seg_net", "backbone") if train_backbone else ("seg_net",)
    return _split_state(variables, tx, keys)


def create_db_train_state(variables: Dict, tx: optax.GradientTransformation) -> TrainState:
    return _split_state(variables, tx, ("dbnet",))


def _as_float_img(x: jax.Array) -> jax.Array:
    """uint8 batches (transfer-compact loaders) -> float in-graph."""
    return x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 else x


def _as_float_mask(x: jax.Array) -> jax.Array:
    return x.astype(jnp.float32) if x.dtype == jnp.uint8 else x


def make_seg_train_step(model, tx: optax.GradientTransformation) -> Callable:
    """U-Net mask training step: dice(pred, mask) on the trainable seg_net."""

    @jax.jit
    def step(state: TrainState, imgs: jax.Array, masks: jax.Array):
        imgs, masks = _as_float_img(imgs), _as_float_mask(masks)
        def loss_fn(trainable):
            params = {**state.frozen, **trainable}
            pred, new_state = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                imgs,
                forward_mode=TEXTDET_MASK,
                train=True,
                mutable=["batch_stats"],
            )
            return losses.binary_dice_loss(pred[..., 0], masks), new_state["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                params=new_params, batch_stats=new_stats, opt_state=new_opt, step=state.step + 1
            ),
            {"loss": loss},
        )

    return step


def make_seg_eval_step(model) -> Callable:
    @jax.jit
    def step(state: TrainState, imgs: jax.Array, masks: jax.Array):
        imgs, masks = _as_float_img(imgs), _as_float_mask(masks)
        params = {**state.frozen, **state.params}
        pred = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            imgs,
            forward_mode=TEXTDET_MASK,
            train=False,
        )
        pred = pred[..., 0]
        tp = jnp.sum(pred * masks)
        return {
            "tp": tp,
            "gt": jnp.sum(masks),
            "pr": jnp.sum(pred),
            "loss": losses.binary_dice_loss(pred, masks),
        }

    return step


def make_db_train_step(model, tx: optax.GradientTransformation, use_bce: bool = True) -> Callable:
    """DB head training step on frozen backbone + frozen U-Net trunk."""

    @jax.jit
    def step(state: TrainState, batch: Dict[str, jax.Array]):
        def loss_fn(trainable):
            params = {**state.frozen, **trainable}
            pred, new_state = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                _as_float_img(batch["imgs"]),
                forward_mode=TEXTDET_DET,
                train=True,
                mutable=["batch_stats"],
            )
            metrics = losses.db_loss(pred, batch, use_bce=use_bce)
            return metrics["loss"], (new_state["batch_stats"], metrics)

        (loss, (new_stats, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                params=new_params, batch_stats=new_stats, opt_state=new_opt, step=state.step + 1
            ),
            metrics,
        )

    return step


def create_yolo_train_state(variables: Dict, tx: optax.GradientTransformation) -> TrainState:
    """Whole-graph detection training (backbone + neck + Detect trainable)."""
    return _split_state(variables, tx, ("blk_det",))


def make_yolo_train_step(model, tx: optax.GradientTransformation, spec, gains: Optional[Dict] = None) -> Callable:
    """Detection training step: v5 loss over the raw Detect maps with
    in-graph dense target assignment (training/yolo_loss.py)."""
    from comic_text_detector_tpu.training.yolo_loss import yolo_loss

    g = gains or {}

    @jax.jit
    def step(state: TrainState, imgs: jax.Array, labels: jax.Array, label_mask: jax.Array):
        imgs = _as_float_img(imgs)

        def loss_fn(trainable):
            params = {**state.frozen, **trainable}
            (raw, _z), new_state = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                imgs,
                train=True,
                decode=False,
                mutable=["batch_stats"],
            )
            metrics = yolo_loss(
                raw, labels, label_mask, spec.anchors, spec.strides, spec.nc,
                box_gain=g.get("box", 0.05), obj_gain=g.get("obj", 1.0), cls_gain=g.get("cls", 0.3),
            )
            return metrics["loss"], (new_state["batch_stats"], metrics)

        (loss, (new_stats, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                params=new_params, batch_stats=new_stats, opt_state=new_opt, step=state.step + 1
            ),
            metrics,
        )

    return step


def make_yolo_eval_step(model, spec, gains: Optional[Dict] = None) -> Callable:
    from comic_text_detector_tpu.training.yolo_loss import yolo_loss

    g = gains or {}

    @jax.jit
    def step(state: TrainState, imgs: jax.Array, labels: jax.Array, label_mask: jax.Array):
        imgs = _as_float_img(imgs)
        params = {**state.frozen, **state.params}
        raw, _z = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            imgs,
            train=False,
            decode=False,
        )
        return yolo_loss(
            raw, labels, label_mask, spec.anchors, spec.strides, spec.nc,
            box_gain=g.get("box", 0.05), obj_gain=g.get("obj", 1.0), cls_gain=g.get("cls", 0.3),
        )

    return step


def make_db_eval_step(model) -> Callable:
    @jax.jit
    def step(state: TrainState, imgs: jax.Array):
        imgs = _as_float_img(imgs)
        params = {**state.frozen, **state.params}
        return model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            imgs,
            forward_mode=TEXTDET_DET,
            train=False,
        )

    return step


def one_cycle(y1: float = 0.0, y2: float = 1.0, steps: int = 100):
    """Cosine 1->lrf schedule factory (reference train_seg.py:28)."""
    import math

    return lambda x: ((1 - math.cos(x * math.pi / steps)) / 2) * (y2 - y1) + y1


def build_optimizer(
    kind: str,
    lr0: float,
    momentum: float = 0.937,
    weight_decay: float = 0.0,
    accumulation_steps: int = 1,
    schedule: Optional[Callable] = None,
) -> optax.GradientTransformation:
    """adam/sgd + optional LR schedule + grad accumulation, matching the
    reference optimizer setup (train_seg.py:69-87)."""
    lr = lr0 if schedule is None else (lambda step: lr0 * schedule(step))
    if kind == "adam":
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.adam(lr, b1=momentum, b2=0.999),
        )
    else:
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.sgd(lr, momentum=momentum, nesterov=True),
        )
    if accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulation_steps)
    return tx
