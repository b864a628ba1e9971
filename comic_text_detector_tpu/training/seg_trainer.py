"""U-Net mask-head trainer.

Mirrors the reference train_seg.py:57-183: frozen-backbone dice training
with warmup + cosine/linear LR, gradient accumulation, periodic pixel-P/R/F1
eval, best/last checkpointing and pluggable logging — re-built on
optax/flax with mesh-ready jitted steps (training/steps.py).
"""

from __future__ import annotations

import os
import os.path as osp
from datetime import datetime
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from comic_text_detector_tpu.data.seg_dataset import create_dataloader
from comic_text_detector_tpu.models.detector import build_train_model
from comic_text_detector_tpu.training import checkpoint as ckpt_lib
from comic_text_detector_tpu.training.metrics import pixel_prf1
from comic_text_detector_tpu.training.steps import (
    create_seg_train_state,
    make_seg_eval_step,
    make_seg_train_step,
)
from comic_text_detector_tpu.utils.log import LOGGER, Loggers


def make_lr_schedule(hyp_train: Dict, nb: int):
    """Reference LR rule: warmup interp over nw steps, then lr0·lf(epoch).

    ``schedule_epochs`` (default: ``epochs``) pins the decay horizon when a
    long schedule runs as several shorter resumed processes (each chunk
    caps ``epochs`` but the cosine must keep the full-run horizon).

    ``warmup_steps`` overrides the reference warmup floor
    ``max(3*nb, 700)`` (train.py:156).  The floor is sized for from-scratch
    runs over thousands of steps; a short fine-tune (a few hundred steps)
    never leaves it and effectively trains at ~0 LR — the round-5 1024px
    fine-tune failure mode.  Explicit wins; 0 disables warmup entirely."""
    epochs = hyp_train.get("schedule_epochs", hyp_train["epochs"])
    lr0 = hyp_train["lr0"]
    lrf = hyp_train["lrf"]
    if hyp_train.get("linear_lr", False):
        lf = lambda e: (1 - e / max(epochs - 1, 1)) * (1.0 - lrf) + lrf
    else:
        lf = lambda e: ((1 - jnp.cos(e * jnp.pi / epochs)) / 2) * (lrf - 1.0) + 1.0
    nw = hyp_train.get("warmup_steps")
    if nw is None:
        nw = max(round(3 * nb), 700)
    nw = max(int(nw), 1)

    def schedule(step):
        epoch = step // max(nb, 1)
        base = lr0 * lf(epoch)
        warm = jnp.minimum(step / nw, 1.0)
        return jnp.where(step <= nw, warm * base, base)

    return schedule


def train(hyp: Dict, variables=None, max_steps: Optional[int] = None, mesh=None) -> Dict:
    """Run seg training from a hyp dict (reference data/train_hyp.yaml shape).

    ``variables`` injects pre-built model variables (e.g. converted backbone
    weights); otherwise the model is randomly initialized.  ``max_steps``
    bounds total optimizer steps (testing).  ``mesh`` enables data-parallel
    training: state replicated, batches sharded over the ``data`` axis (XLA
    inserts the gradient all-reduce).  Returns summary dict.
    """
    hyp_train, hyp_data = hyp["train"], hyp["data"]
    hyp_model = hyp.get("model", {})
    save_dir = hyp_data.get("save_dir", "data")
    os.makedirs(save_dir, exist_ok=True)
    epochs = hyp_train["epochs"]
    batch_size = hyp_train["batch_size"]

    train_backbone = bool(hyp_train.get("train_backbone", False))
    model = build_train_model(
        act=hyp_model.get("act", "leaky"), freeze_backbone=not train_backbone
    )
    imgsz = hyp_data["imgsz"]
    if variables is None:
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, min(imgsz, 256), min(imgsz, 256), 3), jnp.float32)
        )

    train_dataset, train_loader = create_dataloader(
        hyp_data["train_img_dir"],
        hyp_data.get("train_mask_dir", ""),
        imgsz,
        batch_size,
        hyp_data.get("augment", False),
        hyp_data.get("aug_param"),
        shuffle=True,
        cache=hyp_data.get("cache", False),
        as_uint8=True,
    )
    val_dataset, val_loader = create_dataloader(
        hyp_data["val_img_dir"],
        hyp_data.get("val_mask_dir", ""),
        imgsz,
        min(4, batch_size),
        augment=False,
        shuffle=False,
        cache=hyp_data.get("cache", False),
        as_uint8=True,
    )
    nb = len(train_loader)
    LOGGER.info(f"num training imgs: {len(train_dataset)}, num val imgs: {len(val_dataset)}")

    schedule = make_lr_schedule(hyp_train, nb)
    tx = optax.chain(
        optax.add_decayed_weights(hyp_train.get("weight_decay", 0.0)),
        optax.adam(schedule, b1=hyp_train.get("momentum", 0.937), b2=0.999)
        if hyp_train.get("optimizer", "adam") == "adam"
        else optax.sgd(schedule, momentum=hyp_train.get("momentum", 0.937), nesterov=True),
    )
    acc = hyp_train.get("accumulation_steps", 1)
    if acc > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=acc)

    state = create_seg_train_state(variables, tx, train_backbone=train_backbone)
    start_epoch = 0
    best_f1 = -1.0
    logger = Loggers(hyp) if hyp.get("logger", {}).get("type") else None

    resume = hyp.get("resume", {})
    if resume.get("resume_training"):
        payload = ckpt_lib.restore(resume["ckpt"], state)
        state = payload["state"]
        start_epoch = payload["meta"].get("epoch", -1) + 1
        best_f1 = payload["meta"].get("best_f1", -1.0)
        LOGGER.info(f"resumed from {resume['ckpt']} at epoch {start_epoch}")

    if mesh is not None:
        from comic_text_detector_tpu.parallel.mesh import replicated_spec, shard_batch_spec

        state = jax.device_put(state, replicated_spec(mesh))
        n_data = mesh.shape["data"]

        def _put(x):
            x = np.asarray(x)
            if x.ndim and x.shape[0] % n_data == 0:
                return jax.device_put(x, shard_batch_spec(mesh, x.ndim))
            return jax.device_put(x, replicated_spec(mesh))

    else:
        _put = jnp.asarray

    train_step = make_seg_train_step(model, tx)
    eval_step = make_seg_eval_step(model)
    eval_interval = hyp_train.get("eval_interval", 1)
    total_steps = 0
    m_loss = 0.0

    for epoch in range(start_epoch, epochs):
        train_dataset.initialize()
        losses = []  # device scalars; synced once per epoch (remote-TPU
        # round trips per step would dominate wall-clock otherwise)
        for i, (imgs, masks) in enumerate(train_loader):
            state, metrics = train_step(state, _put(imgs), _put(masks))
            losses.append(metrics["loss"])
            total_steps += 1
            if max_steps is not None and total_steps >= max_steps:
                break
        m_loss = float(jnp.mean(jnp.stack(losses))) if losses else 0.0

        if (epoch + 1) % eval_interval == 0 or (max_steps and total_steps >= max_steps):
            tp = gt = pr = 0.0
            e_loss, n_batches = 0.0, 0
            for imgs, masks in val_loader:
                m = eval_step(state, _put(imgs), _put(masks))
                tp += float(m["tp"])
                gt += float(m["gt"])
                pr += float(m["pr"])
                e_loss += float(m["loss"])
                n_batches += 1
            recall, precision, f1 = pixel_prf1(tp, gt, pr)
            save_best = best_f1 < f1
            if save_best:
                best_f1 = f1
            # unet_last carries the UPDATED best_f1 so resumed runs can't
            # overwrite unet_best with a worse epoch
            meta = {"epoch": epoch, "best_f1": best_f1, "date": datetime.now().isoformat(), "hyp": None}
            ckpt_lib.save(osp.join(save_dir, "unet_last.ctd"), state, meta)
            if save_best:
                LOGGER.info(f"saving model at epoch {epoch}, best val f1: {best_f1}")
                ckpt_lib.save(osp.join(save_dir, "unet_best.ctd"), state, {**meta, "best_f1": best_f1})
            LOGGER.info(f"epoch {epoch}/{epochs-1} loss: {m_loss:.4f} precision: {precision:.4f} recall: {recall:.4f}")
            if logger is not None:
                logger.on_train_epoch_end(
                    epoch,
                    {
                        "train/loss": m_loss,
                        "eval/recall": recall,
                        "eval/precision": precision,
                        "eval/f1": f1,
                        "eval/loss": e_loss / max(n_batches, 1),
                    },
                )
        if max_steps is not None and total_steps >= max_steps:
            break

    return {"state": state, "best_f1": best_f1, "last_loss": m_loss, "steps": total_steps}
