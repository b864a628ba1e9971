"""Block-detector (YOLO) trainer.

The reference has no in-repo detection trainer — its yolov5 arrives
pre-trained and the renderer (text_rendering.py:405-463) exists to make YOLO
labels for external training.  This trainer closes the loop: whole-graph v5
training (backbone + neck + Detect) on the renderer's output, structured
exactly like the seg/DB trainers (warmup+cosine LR, jitted steps, periodic
eval, best/last checkpoints), mesh-ready for data-parallel runs.
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

from comic_text_detector_tpu.config import full_spec
from comic_text_detector_tpu.data.blk_dataset import create_dataloader
from comic_text_detector_tpu.models.detector import build_blk_train_model
from comic_text_detector_tpu.models.yolo import initialize_detect_biases
from comic_text_detector_tpu.training import checkpoint as ckpt_lib
from comic_text_detector_tpu.training.seg_trainer import make_lr_schedule
from comic_text_detector_tpu.training.steps import (
    create_yolo_train_state,
    make_yolo_eval_step,
    make_yolo_train_step,
)
from comic_text_detector_tpu.utils.log import LOGGER


def eval_detection_ap(
    model, state, val_loader, nc: int = 2, conf: float = 0.1, nms_iou: float = 0.45
) -> Dict:
    """Per-class (eng/ja) AP50 over a val loader: decode + NMS + greedy
    IoU-0.5 matching (training/metrics.py::per_class_ap50).  The loss-only
    eval cannot see class confusion; this reports detection quality the way
    the deployed pipeline consumes it (decode -> NMS -> boxes)."""
    from comic_text_detector_tpu.ops.nms import nms_single
    from comic_text_detector_tpu.training.metrics import per_class_ap50

    @jax.jit
    def dec(state, imgs):
        params = {**state.frozen, **state.params}
        dets, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            imgs.astype(jnp.float32) / (255.0 if imgs.dtype == jnp.uint8 else 1.0),
            train=False,
            decode=True,
        )
        rows, counts = jax.vmap(lambda d: nms_single(d, conf, nms_iou))(dets)
        return rows, counts

    preds, gts = [], []
    for imgs, labels, mask in val_loader:
        rows, counts = jax.device_get(dec(state, jnp.asarray(imgs)))
        s = imgs.shape[1]  # square letterbox canvas
        labels, mask = np.asarray(labels), np.asarray(mask)
        for b in range(len(rows)):
            preds.append(rows[b][: int(counts[b])])
            lab = labels[b][mask[b] > 0]
            g = np.zeros((len(lab), 5), np.float64)
            g[:, 0] = lab[:, 0]
            g[:, 1] = (lab[:, 1] - lab[:, 3] / 2) * s
            g[:, 2] = (lab[:, 2] - lab[:, 4] / 2) * s
            g[:, 3] = (lab[:, 1] + lab[:, 3] / 2) * s
            g[:, 4] = (lab[:, 2] + lab[:, 4] / 2) * s
            gts.append(g)
    return per_class_ap50(preds, gts, nc=nc)


def train(hyp: Dict, variables=None, max_steps: Optional[int] = None, mesh=None) -> Dict:
    """Train the block detector from a hyp dict (same shape as the seg/DB
    trainers).  Returns {'state', 'best_loss', 'steps'}."""
    hyp_train, hyp_data = hyp["train"], hyp["data"]
    save_dir = hyp_data.get("save_dir", "data")
    os.makedirs(save_dir, exist_ok=True)
    epochs = hyp_train["epochs"]
    batch_size = hyp_train["batch_size"]
    imgsz = hyp_data["imgsz"]

    spec = full_spec()
    model = build_blk_train_model()
    if variables is None:
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, min(imgsz, 256), min(imgsz, 256), 3), jnp.float32)
        )
        variables = jax.tree_util.tree_map(lambda x: x, variables)
        variables["params"]["blk_det"] = initialize_detect_biases(
            dict(variables["params"]["blk_det"]), spec, img_size=imgsz
        )

    train_dataset, train_loader = create_dataloader(
        hyp_data["train_img_dir"], imgsz, batch_size,
        augment=hyp_data.get("augment", True), aug_param=hyp_data.get("aug_param"),
        shuffle=True, as_uint8=True,
    )
    val_dataset, val_loader = create_dataloader(
        hyp_data["val_img_dir"], imgsz, min(4, batch_size), augment=False, shuffle=False,
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

    state = create_yolo_train_state(variables, tx)

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

    gains = hyp_train.get("gains")
    train_step = make_yolo_train_step(model, tx, spec, gains)
    eval_step = make_yolo_eval_step(model, spec, gains)
    eval_interval = hyp_train.get("eval_interval", 1)
    total_steps = 0
    best_loss = float("inf")
    m_loss = 0.0
    last_ap = None

    for epoch in range(epochs):
        train_dataset.initialize()
        losses = []
        for imgs, labels, mask in train_loader:
            state, metrics = train_step(state, _put(imgs), _put(labels), _put(mask))
            losses.append(metrics["loss"])
            total_steps += 1
            if max_steps is not None and total_steps >= max_steps:
                break
        m_loss = float(jnp.mean(jnp.stack(losses))) if losses else 0.0

        if (
            (epoch + 1) % eval_interval == 0
            or epoch == epochs - 1
            or (max_steps and total_steps >= max_steps)
        ):
            e = {"loss": 0.0, "lbox": 0.0, "lobj": 0.0, "lcls": 0.0}
            n = 0
            for imgs, labels, mask in val_loader:
                m = eval_step(state, _put(imgs), _put(labels), _put(mask))
                for k in e:
                    e[k] += float(m[k])
                n += 1
            for k in e:
                e[k] /= max(n, 1)
            if e["loss"] < best_loss:
                best_loss = e["loss"]
                save_best = True
            else:
                save_best = False
            # yolo_last carries best_loss so external resume flows can keep
            # the best-model bookkeeping consistent across process restarts
            meta = {"epoch": epoch, "best_loss": best_loss, "date": datetime.now().isoformat()}
            ckpt_lib.save(osp.join(save_dir, "yolo_last.ctd"), state, meta)
            if save_best:
                ckpt_lib.save(osp.join(save_dir, "yolo_best.ctd"), state, meta)
            ap_str = ""
            if hyp_train.get("eval_ap", True):
                ap = eval_detection_ap(model, state, val_loader, nc=spec.nc)
                last_ap = ap
                names = ("eng", "ja")
                per = " ".join(
                    f"{names[c] if c < 2 else c}:{ap['ap50'][c]:.3f}(n={ap['n_gt'][c]})"
                    for c in range(spec.nc)
                )
                ap_str = f" mAP50 {ap['map50']:.3f} [{per}]"
            LOGGER.info(
                f"epoch {epoch}/{epochs-1} train loss: {m_loss:.4f} "
                f"val: loss {e['loss']:.4f} box {e['lbox']:.4f} obj {e['lobj']:.4f} cls {e['lcls']:.4f}"
                + ap_str
            )
        if max_steps is not None and total_steps >= max_steps:
            break

    return {
        "state": state,
        "best_loss": best_loss,
        "last_loss": m_loss,
        "steps": total_steps,
        "ap": last_ap,
    }
