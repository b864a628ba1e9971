"""Train the flagship synthetic checkpoint on the real TPU.

Produces ``data/flagship_r2.npz`` — a deploy checkpoint with ALL THREE heads
trained in-framework on synthetic comic pages (data/render.py):

  1. YOLO block detector (backbone + neck + Detect) — training/yolo_trainer.py;
     the reference ships this head pre-trained and cannot train it in-repo.
  2. U-Net seg head on the FROZEN yolo backbone (the reference's own
     composition: pre-trained yolov5 -> train_mask).
  3. DB head grafted per the reference recipe — training/db_trainer.py.

Backgrounds use varied page aspect ratios so the letterbox pad region is
SEEN during training (a square-only corpus let the DB head fire on the grey
pad of real 1024px pages), and the renderer draws speech bubbles
(bubble_prob) to close the synthetic->manga domain gap.

Run (background; remote-TPU compiles take minutes):
    python scripts/train_flagship.py 2>&1 | tee data/train_flagship.log
"""

from __future__ import annotations

import json
import os
import os.path as osp
import sys
import time

import numpy as np

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)

N_BG_TRAIN = int(os.environ.get("CTD_TRAIN_PAGES", "320"))
N_BG_VAL = 16
IMGSZ = int(os.environ.get("CTD_TRAIN_IMGSZ", "512"))
YOLO_EPOCHS = int(os.environ.get("CTD_YOLO_EPOCHS", "60"))
SEG_EPOCHS = int(os.environ.get("CTD_SEG_EPOCHS", "60"))
DB_EPOCHS = int(os.environ.get("CTD_DB_EPOCHS", "20"))
BATCH = 8

# mostly-tall manga-like geometries; letterboxing these to IMGSZ exposes the
# bottom/right pad during training
PAGE_SIZES = [(640, 640), (896, 640), (832, 576), (768, 544), (704, 512), (640, 448)]


def make_backgrounds(out_dir: str, n: int, seed: int, extended: bool = False) -> None:
    """Text-free comic-ish pages: white/tinted panels, borders, gradients,
    halftone noise, random shapes.

    ``extended`` (round 5) adds the page families the r4 DB head
    hallucinated on — near-flat bright pages, periodic thin stripes, and
    screentone-like dot grids (the r4 head fired a dense speck field across
    whole bright pages: data/parity_r4_r5.log, /tmp shrink-map diagnosis).
    Default False keeps the r2/r3 datasets reproducible."""
    from PIL import Image, ImageDraw

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        h, w = PAGE_SIZES[int(rng.integers(0, len(PAGE_SIZES)))]
        base = int(rng.integers(200, 256))
        img = np.full((h, w, 3), base, np.uint8)
        kind = i % 7 if extended else i % 4
        if kind == 1:  # vertical gradient
            g = np.linspace(base - 60, base, h).astype(np.uint8)
            img[:] = g[:, None, None]
        elif kind == 2:  # noise texture
            img = (img.astype(np.int16) + rng.integers(-25, 25, (h, w, 1))).clip(0, 255).astype(np.uint8)
        elif kind == 4:  # periodic thin stripes (manga speed-lines / rules)
            pitch = int(rng.integers(12, 96))
            delta = int(rng.integers(10, 60))
            if rng.random() < 0.5:
                img[:, ::pitch] = max(0, base - delta)
            else:
                img[::pitch, :] = max(0, base - delta)
        elif kind == 5:  # screentone-like dot grid
            pitch = int(rng.integers(6, 24))
            r_dot = max(1, pitch // int(rng.integers(3, 6)))
            tone = int(rng.integers(120, 220))
            yy, xx = np.mgrid[0:h, 0:w]
            dots = ((yy % pitch) < r_dot) & ((xx % pitch) < r_dot)
            img[dots] = tone
        # kind 6: near-flat bright page (no texture at all — just the base
        # tone; the panel borders/shapes below stay, matching real empty
        # manga pages)
        pil = Image.fromarray(img)
        draw = ImageDraw.Draw(pil)
        # panel borders
        for _ in range(int(rng.integers(1, 5))):
            x1, y1 = rng.integers(0, w - 100), rng.integers(0, h - 100)
            x2, y2 = rng.integers(x1 + 80, min(x1 + 400, w)), rng.integers(y1 + 80, min(y1 + 400, h))
            draw.rectangle([int(x1), int(y1), int(x2), int(y2)], outline=(0, 0, 0), width=int(rng.integers(2, 5)))
        # random dark shapes (art stand-ins)
        for _ in range(int(rng.integers(0, 6))):
            x, y = rng.integers(0, w - 60), rng.integers(0, h - 60)
            r = int(rng.integers(15, 60))
            tone = int(rng.integers(30, 180))
            draw.ellipse([int(x), int(y), int(x + r), int(y + r)], fill=(tone, tone, tone))
        pil.save(osp.join(out_dir, f"bg{i:04d}.png"))


def main() -> None:
    os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
    import jax

    cache_dir = os.environ.get("CTD_COMPILE_CACHE", osp.join(ROOT, ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)

    from comic_text_detector_tpu.data.render import ComicTextRenderer, render_comictext
    from comic_text_detector_tpu.training import db_trainer, seg_trainer, yolo_trainer
    from comic_text_detector_tpu.training.checkpoint import save_compact

    work = os.environ.get("CTD_FLAGSHIP_WORK", osp.join(ROOT, "data", "flagship_work"))
    ds_train, ds_val = osp.join(work, "train"), osp.join(work, "val")
    t0 = time.time()
    if not osp.exists(osp.join(work, ".rendered_r2")):
        make_backgrounds(osp.join(work, "bg_train"), N_BG_TRAIN, seed=1)
        make_backgrounds(osp.join(work, "bg_val"), N_BG_VAL, seed=2)
        n1 = render_comictext(
            osp.join(work, "bg_train"), ds_train, renderer=ComicTextRenderer(seed=3, bubble_prob=0.55)
        )
        n2 = render_comictext(
            osp.join(work, "bg_val"), ds_val, renderer=ComicTextRenderer(seed=4, bubble_prob=0.55)
        )
        open(osp.join(work, ".rendered_r2"), "w").write(f"{n1},{n2}")
        print(f"rendered {n1} train / {n2} val pages in {time.time()-t0:.0f}s", flush=True)

    # ---- stage 1: YOLO block detector (backbone + neck + Detect) ---------------
    hyp_yolo = {
        "data": {
            "train_img_dir": ds_train,
            "val_img_dir": ds_val,
            "imgsz": IMGSZ,
            "augment": True,
            "aug_param": {"hsv": 0.5, "flip_lr": 0.5, "neg": 0.1},
            "save_dir": work,
        },
        "train": {
            "epochs": YOLO_EPOCHS,
            "batch_size": BATCH,
            "lr0": 2e-3,
            "lrf": 0.05,
            "optimizer": "adam",
            "momentum": 0.9,
            "weight_decay": 0.0,
            "eval_interval": 10,
        },
    }
    t0 = time.time()
    yolo_out = yolo_trainer.train(hyp_yolo)
    yolo_state = yolo_out["state"]
    print(
        f"yolo done in {time.time()-t0:.0f}s: best_loss={yolo_out['best_loss']:.4f} "
        f"steps={yolo_out['steps']}",
        flush=True,
    )

    blk_params = yolo_state.params["blk_det"]
    blk_stats = yolo_state.batch_stats["blk_det"]
    backbone_keys = [k for k in blk_params if int(k.split("_")[1]) <= 9]

    # ---- stage 2: seg head on the FROZEN yolo backbone -------------------------
    from comic_text_detector_tpu.models.detector import build_train_model
    import jax.numpy as jnp

    seg_model = build_train_model(act="leaky", freeze_backbone=True)
    seg_init = seg_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3), jnp.float32))
    seg_variables = {
        "params": {
            "backbone": {k: blk_params[k] for k in backbone_keys},
            "seg_net": seg_init["params"]["seg_net"],
        },
        "batch_stats": {
            "backbone": {k: blk_stats[k] for k in backbone_keys if k in blk_stats},
            "seg_net": seg_init["batch_stats"]["seg_net"],
        },
    }

    hyp_seg = {
        "data": dict(hyp_yolo["data"], cache=True,
                     aug_param={"hsv": 0.5, "flip_lr": 0.5, "neg": 0.1, "mini_mosaic": 0.2}),
        "train": {
            "epochs": SEG_EPOCHS,
            "batch_size": BATCH,
            "lr0": 2e-3,
            "lrf": 0.05,
            "optimizer": "adam",
            "momentum": 0.9,
            "weight_decay": 0.0,
            "eval_interval": 10,
            "accumulation_steps": 1,
            "train_backbone": False,
        },
        "model": {"act": "leaky"},
    }
    t0 = time.time()
    seg_out = seg_trainer.train(hyp_seg, variables=seg_variables)
    seg_state = seg_out["state"]
    print(
        f"seg done in {time.time()-t0:.0f}s: best_f1={seg_out['best_f1']:.3f} "
        f"last_loss={seg_out['last_loss']:.3f} steps={seg_out['steps']}",
        flush=True,
    )

    unet_variables = {
        "params": {
            "backbone": seg_state.frozen["backbone"],
            "seg_net": seg_state.params["seg_net"],
        },
        "batch_stats": seg_state.batch_stats,
    }

    # ---- stage 3: DB head (grafted upconvs, frozen trunk) ----------------------
    hyp_db = {
        "data": dict(hyp_yolo["data"], augment=False, cache=True),
        "train": {
            "epochs": DB_EPOCHS,
            "batch_size": BATCH,
            "lr0": 1e-3,
            "lrf": 0.1,
            "optimizer": "adam",
            "momentum": 0.9,
            "weight_decay": 0.0,
            "eval_interval": 10,
            "accumulation_steps": 1,
            "loss": "bce",
        },
        "model": {"act": "leaky"},
    }
    t0 = time.time()
    db_out = db_trainer.train(hyp_db, unet_variables=unet_variables)
    db_state = db_out["state"]
    print(f"db done in {time.time()-t0:.0f}s: {db_out.get('last_metrics')}", flush=True)

    # --- assemble the deploy checkpoint -----------------------------------------
    import jax.random

    from comic_text_detector_tpu.models.detector import build_inference_model, init_variables

    model = build_inference_model(act="leaky")
    deploy = init_variables(model, jax.random.PRNGKey(0), input_size=256)
    deploy["params"]["blk_det"] = blk_params
    deploy["batch_stats"]["blk_det"] = blk_stats
    deploy["params"]["text_seg"] = seg_state.params["seg_net"]
    deploy["batch_stats"]["text_seg"] = seg_state.batch_stats["seg_net"]
    deploy["params"]["text_det"] = db_state.params["dbnet"]
    deploy["batch_stats"]["text_det"] = db_state.batch_stats["dbnet"]

    out_path = os.environ.get("CTD_FLAGSHIP_OUT", osp.join(ROOT, "data", "flagship_r2.npz"))
    save_compact(out_path, deploy)
    meta = {
        "imgsz": IMGSZ,
        "pages": N_BG_TRAIN,
        "yolo": {"best_loss": float(yolo_out["best_loss"]), "steps": int(yolo_out["steps"])},
        "seg": {"best_f1": float(seg_out["best_f1"]), "steps": int(seg_out["steps"])},
        "db": {k: float(v) for k, v in (db_out.get("last_metrics") or {}).items()},
    }
    with open(out_path + ".meta.json", "w") as f:
        json.dump(meta, f, indent=1)
    print("saved", out_path, osp.getsize(out_path) / 1e6, "MB", flush=True)


if __name__ == "__main__":
    main()
