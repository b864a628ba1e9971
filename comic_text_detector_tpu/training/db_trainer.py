"""DB text-line-head trainer.

Mirrors the reference train_db.py:59-198: DBHead trained on a frozen
backbone + frozen U-Net trunk (with upconv3/4 grafted from the trained
U-Net, basemodel.py:182-192), OHEM-BCE/dice losses, mid-epoch size
re-jitter, polygon-extraction eval via SegDetectorRepresenter + QuadMetric.
The reference's eval-gate bug (gating on batch index, train_db.py:168) is
fixed: eval gates on epoch.
"""

from __future__ import annotations

import os
import os.path as osp
import time
from datetime import datetime
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from comic_text_detector_tpu.data.db_dataset import create_dataloader
from comic_text_detector_tpu.models.detector import build_train_model
from comic_text_detector_tpu.postproc.db_rep import SegDetectorRepresenter
from comic_text_detector_tpu.training import checkpoint as ckpt_lib
from comic_text_detector_tpu.training.metrics import QuadMetric
from comic_text_detector_tpu.training.seg_trainer import make_lr_schedule
from comic_text_detector_tpu.training.steps import (
    create_db_train_state,
    make_db_eval_step,
    make_db_train_step,
)
from comic_text_detector_tpu.utils.log import LOGGER, Loggers


def graft_db_variables(variables: Dict, unet_variables: Dict) -> Dict:
    """Initialize DBHead's upconv3/upconv4 from a trained UnetHead
    (reference TextDetector.initialize_db, basemodel.py:182-192).

    ``variables`` — TextDetTrain variables containing 'dbnet';
    ``unet_variables`` — TextDetTrain variables whose 'seg_net' holds the
    trained U-Net (MASK-mode init so upconv3/4 exist).
    """
    import copy

    variables = jax.tree_util.tree_map(lambda x: x, variables)
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    seg_p = unet_variables["params"]["seg_net"]
    seg_s = unet_variables["batch_stats"]["seg_net"]
    db_p = dict(params["dbnet"])
    db_s = dict(stats.get("dbnet", {}))
    for key in ("upconv3", "upconv4"):
        db_p[key] = copy.deepcopy(seg_p[key])
        db_s[key] = copy.deepcopy(seg_s[key])
    params["dbnet"] = db_p
    stats["dbnet"] = db_s
    # also refresh the frozen seg trunk with the trained weights
    trunk_p = dict(params["seg_net"])
    trunk_s = dict(stats["seg_net"])
    for key in ("down_conv1", "upconv0", "upconv2"):
        trunk_p[key] = copy.deepcopy(seg_p[key])
        trunk_s[key] = copy.deepcopy(seg_s[key])
    params["seg_net"] = trunk_p
    stats["seg_net"] = trunk_s
    return {"params": params, "batch_stats": stats}


def eval_model(eval_step, state, val_loader, post_process, metric_cls, box_thresh: float = 0.6):
    raw_metrics = []
    total_frame = 0.0
    total_time = 0.0
    for batch in val_loader:
        imgs = jnp.asarray(batch["imgs"])
        start = time.time()
        preds = eval_step(state, imgs)
        preds = np.asarray(preds)
        boxes, scores = post_process(batch, np.transpose(preds, (0, 3, 1, 2)))
        total_frame += imgs.shape[0]
        total_time += time.time() - start
        raw_metrics.append(metric_cls.validate_measure(batch, (boxes, scores), box_thresh))
    metrics = metric_cls.gather_measure(raw_metrics)
    if total_time > 0:
        LOGGER.info("FPS:{}".format(total_frame / total_time))
    return metrics["recall"].avg, metrics["precision"].avg, metrics["fmeasure"].avg


def train(hyp: Dict, variables=None, unet_variables=None, max_steps: Optional[int] = None, mesh=None) -> Dict:
    hyp_train, hyp_data = hyp["train"], hyp["data"]
    hyp_model = hyp.get("model", {})
    save_dir = hyp_data.get("save_dir", "data")
    os.makedirs(save_dir, exist_ok=True)
    epochs = hyp_train["epochs"]
    batch_size = hyp_train["batch_size"]
    use_bce = hyp_train.get("loss", "bce") == "bce"

    model = build_train_model(act=hyp_model.get("act", "leaky"), with_db=True)
    imgsz = hyp_data["imgsz"]
    if variables is None:
        from comic_text_detector_tpu.constants import TEXTDET_DET

        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, min(imgsz, 256), min(imgsz, 256), 3), jnp.float32),
            forward_mode=TEXTDET_DET,
        )
    if unet_variables is not None:
        variables = graft_db_variables(variables, unet_variables)

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
        batch_size,
        augment=False,
        shuffle=False,
        cache=hyp_data.get("cache", False),
        as_uint8=True,
        with_ann=True,
    )
    if hyp_data.get("cache_prepared"):
        # cache letterboxed images + GT maps after first touch; per-epoch
        # augments reduce to flip/HSV/negate on the cached arrays (the
        # 1-vCPU host cannot hide per-sample map generation otherwise)
        train_dataset.enable_prepared_cache(
            disk_dir=hyp_data.get("prepared_cache_dir")
        )
    nb = len(train_loader)
    LOGGER.info(f"num training imgs: {len(train_dataset)}, num val imgs: {len(val_dataset)}")

    schedule = make_lr_schedule(hyp_train, nb)
    if hyp_train.get("optimizer", "adam") == "adam":
        tx = optax.chain(
            optax.add_decayed_weights(hyp_train.get("weight_decay", 0.0)),
            optax.adam(schedule, b1=0.937, b2=0.999),
        )
    else:
        tx = optax.chain(
            optax.add_decayed_weights(hyp_train.get("weight_decay", 0.0)),
            optax.sgd(schedule, momentum=hyp_train.get("momentum", 0.937), nesterov=True),
        )
    acc = hyp_train.get("accumulation_steps", 1)
    if acc > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=acc)

    state = create_db_train_state(variables, tx)
    start_epoch = 0
    best_f1 = -1.0
    logger = Loggers(hyp) if hyp.get("logger", {}).get("type") else None

    resume = hyp.get("resume", {})
    if resume.get("resume_training"):
        payload = ckpt_lib.restore(resume["ckpt"], state)
        state = payload["state"]
        start_epoch = payload["meta"].get("epoch", -1) + 1
        best_f1 = payload["meta"].get("best_f1", -1.0)

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

    train_step = make_db_train_step(model, tx, use_bce=use_bce)
    eval_step = make_db_eval_step(model)
    metric_cls = QuadMetric()
    post_process = SegDetectorRepresenter(thresh=0.5)
    eval_interval = hyp_train.get("eval_interval", 1)
    total_steps = 0
    keys = ("loss", "loss_shrink_maps", "loss_threshold_maps", "loss_binary_maps")
    means = {k: 0.0 for k in keys}

    for epoch in range(start_epoch, epochs):
        epoch_metrics = {k: [] for k in keys}  # device scalars, synced per epoch
        for i, batch in enumerate(train_loader):
            if (i + 2) % 256 == 0:
                train_dataset.initialize()
            jb = {
                k: _put(v)
                for k, v in batch.items()
                if k in ("imgs", "shrink_map", "shrink_mask", "threshold_map", "threshold_mask")
            }
            state, metrics = train_step(state, jb)
            for k in keys:
                epoch_metrics[k].append(metrics[k])
            total_steps += 1
            if max_steps is not None and total_steps >= max_steps:
                break
        for k in keys:
            if epoch_metrics[k]:
                means[k] = float(jnp.mean(jnp.stack(epoch_metrics[k])))

        if (
            (epoch + 1) % eval_interval == 0
            or epoch == epochs - 1
            or (max_steps and total_steps >= max_steps)
        ):
            recall, precision, fmeasure = eval_model(eval_step, state, val_loader, post_process, metric_cls)
            save_best = best_f1 < fmeasure
            if save_best:
                best_f1 = fmeasure
            # db_last carries the UPDATED best_f1: resumed runs restore it,
            # and a stale value would let a worse epoch overwrite db_best
            meta = {"epoch": epoch, "best_f1": best_f1, "date": datetime.now().isoformat()}
            ckpt_lib.save(osp.join(save_dir, "db_last.ctd"), state, meta)
            if save_best:
                ckpt_lib.save(osp.join(save_dir, "db_best.ctd"), state, {**meta, "best_f1": best_f1})
            LOGGER.info(
                f"epoch {epoch}: loss {means['loss']:.4f} P {precision:.4f} R {recall:.4f} F1 {fmeasure:.4f}"
            )
            if logger is not None:
                logger.on_train_epoch_end(
                    epoch,
                    {
                        "train/loss": means["loss"],
                        "train/loss_shrink": means["loss_shrink_maps"],
                        "train/loss_threshold": means["loss_threshold_maps"],
                        "train/loss_binary_maps": means["loss_binary_maps"],
                        "eval/recall": recall,
                        "eval/precision": precision,
                        "eval/f1": fmeasure,
                    },
                )
        if max_steps is not None and total_steps >= max_steps:
            break

    return {"state": state, "best_f1": best_f1, "steps": total_steps, "last_metrics": means}
