"""Round-3 DB-head retrain: thousands of pages, rich corpus, long schedule.

The r2 flagship checkpoint trained its DB head on only 319 synthetic pages
for 20 epochs (val F1 0.31) — data-starved.  This run keeps the trained
YOLO backbone + seg head from data/flagship_r2.npz frozen (the reference's
own composition, basemodel.py:182-192) and retrains ONLY the DB head on a
much larger corpus:

* CTD_DB_PAGES (default 2400) fresh synthetic pages, harvested-corpus text
  (scripts/build_corpus.py -> data/corpus_en.txt), speech bubbles, varied
  aspect ratios (reference recipe scale: README.md:16-24 cites ~13k pages);
* prepared-sample cache (maps computed once, flip/HSV/neg per epoch);
* CTD_DB_EPOCHS (default 40) with cosine LR, eval every 5 epochs.

Writes data/flagship_r3.npz (full deploy ckpt with the new DB head).

Run (background; remote-TPU compiles take minutes):
    python scripts/train_db_r3.py 2>&1 | tee data/train_db_r3.log
"""

from __future__ import annotations

import os
import os.path as osp
import sys
import time

import numpy as np

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)

N_PAGES = int(os.environ.get("CTD_DB_PAGES", "2400"))
N_VAL = int(os.environ.get("CTD_DB_VAL", "48"))
IMGSZ = int(os.environ.get("CTD_TRAIN_IMGSZ", "512"))
EPOCHS = int(os.environ.get("CTD_DB_EPOCHS", "40"))
BATCH = int(os.environ.get("CTD_DB_BATCH", "8"))
LR0 = float(os.environ.get("CTD_DB_LR0", "1e-3"))
EVAL_INT = int(os.environ.get("CTD_DB_EVAL_INT", "5"))
# Fine-tune entry: when no db_last.ctd exists but a deploy npz does (the
# r3 work dir was ephemeral), seed the DB head from its text_det weights
# instead of re-grafting fresh upconv3/4 (which would discard the trained
# head). Set CTD_DB_WARMSTART=path/to/flagship_rN.npz to enable.
WARMSTART = os.environ.get("CTD_DB_WARMSTART", "")


def main() -> None:
    os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
    import jax

    cache_dir = os.environ.get("CTD_COMPILE_CACHE", osp.join(ROOT, ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)

    from comic_text_detector_tpu.data.render import ComicTextRenderer, render_comictext
    from comic_text_detector_tpu.training import db_trainer
    from comic_text_detector_tpu.training.checkpoint import load_compact, save_compact
    from scripts.train_flagship import make_backgrounds

    corpus = osp.join(ROOT, "data", "corpus_en.txt")
    if not osp.exists(corpus):
        import scripts.build_corpus as bc

        bc.main()

    work = os.environ.get("CTD_DB_WORK", osp.join(ROOT, "data", "db_work_r3"))
    ds_train, ds_val = osp.join(work, "train"), osp.join(work, "val")
    t0 = time.time()
    if not osp.exists(osp.join(work, ".rendered_r3")):
        make_backgrounds(osp.join(work, "bg_train"), N_PAGES, seed=31)
        make_backgrounds(osp.join(work, "bg_val"), N_VAL, seed=32)
        n1 = render_comictext(
            osp.join(work, "bg_train"), ds_train,
            renderer=ComicTextRenderer(seed=33, bubble_prob=0.55, word_dict=corpus),
        )
        n2 = render_comictext(
            osp.join(work, "bg_val"), ds_val,
            renderer=ComicTextRenderer(seed=34, bubble_prob=0.55, word_dict=corpus),
        )
        open(osp.join(work, ".rendered_r3"), "w").write(f"{n1},{n2}")
        print(f"rendered {n1} train / {n2} val pages in {time.time()-t0:.0f}s", flush=True)
    if os.environ.get("CTD_DB_RENDER_ONLY") == "1":
        print("render-only mode: dataset ready, exiting", flush=True)
        return

    # trained trunk from the r2 flagship: backbone <- blk_det, seg <- text_seg
    deploy = load_compact(osp.join(ROOT, "data", "flagship_r2.npz"))
    backbone_keys = [k for k in deploy["params"]["blk_det"] if int(k.split("_")[1]) <= 9]
    unet_variables = {
        "params": {
            "backbone": {k: deploy["params"]["blk_det"][k] for k in backbone_keys},
            "seg_net": deploy["params"]["text_seg"],
        },
        "batch_stats": {
            "backbone": {
                k: deploy["batch_stats"]["blk_det"][k]
                for k in backbone_keys
                if k in deploy["batch_stats"]["blk_det"]
            },
            "seg_net": deploy["batch_stats"]["text_seg"],
        },
    }

    hyp_db = {
        "data": {
            "train_img_dir": ds_train,
            "val_img_dir": ds_val,
            "imgsz": IMGSZ,
            "augment": True,
            "aug_param": {"hsv": 0.5, "flip_lr": 0.5, "neg": 0.1},
            "cache_prepared": True,
            "prepared_cache_dir": osp.join(work, "prep_cache"),
            "save_dir": work,
        },
        "train": {
            "epochs": EPOCHS,
            "batch_size": BATCH,
            "lr0": LR0,
            "lrf": 0.05,
            "optimizer": "adam",
            "momentum": 0.9,
            "weight_decay": 0.0,
            "eval_interval": EVAL_INT,
            "accumulation_steps": 1,
            "loss": "bce",
        },
        "model": {"act": "leaky"},
    }
    # Chunked training: the axon client leaks ~34 MB of host memory per
    # step (the per-step upload size — the first r3 run OOM-killed at
    # 128 GB around epoch 13), so long schedules run as several short
    # processes resuming from db_last.ctd (CTD_DB_RESUME=1), each capped
    # at CTD_DB_EPOCHS_PER_RUN epochs before a clean exit.
    last = osp.join(work, "db_last.ctd")
    saved_epoch = -1
    if os.environ.get("CTD_DB_RESUME") == "1" and osp.exists(last):
        hyp_db["resume"] = {"resume_training": True, "ckpt": last}
        import json

        meta_path = last + ".meta.json"
        if osp.exists(meta_path):
            with open(meta_path) as f:
                saved_epoch = json.load(f).get("epoch", -1)
    per_run = int(os.environ.get("CTD_DB_EPOCHS_PER_RUN", "0"))
    if per_run:
        hyp_db["train"]["schedule_epochs"] = EPOCHS  # full cosine horizon
        hyp_db["train"]["epochs"] = min(EPOCHS, saved_epoch + 1 + per_run)

    variables = None
    if WARMSTART and "resume" not in hyp_db:
        # Seed the whole train tree (frozen trunk + trained DB head) from a
        # deploy checkpoint: init for structure, graft for the trunk, then
        # overwrite dbnet with the previously-trained head.
        import jax.numpy as jnp

        from comic_text_detector_tpu.constants import TEXTDET_DET
        from comic_text_detector_tpu.models.detector import build_train_model
        from comic_text_detector_tpu.training.db_trainer import graft_db_variables

        warm = load_compact(WARMSTART)
        model = build_train_model(act="leaky", with_db=True)
        with jax.default_device(jax.devices("cpu")[0]):
            variables = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3), jnp.float32),
                forward_mode=TEXTDET_DET,
            )
        variables = graft_db_variables(variables, unet_variables)
        variables["params"]["dbnet"] = warm["params"]["text_det"]
        variables["batch_stats"]["dbnet"] = warm["batch_stats"]["text_det"]
        unet_variables = None
        print(f"warm-started dbnet from {WARMSTART}", flush=True)
    t0 = time.time()
    db_out = db_trainer.train(hyp_db, variables=variables, unet_variables=unet_variables)
    db_state = db_out["state"]
    print(
        f"db done in {time.time()-t0:.0f}s: best_f1={db_out['best_f1']:.4f} "
        f"steps={db_out['steps']} last={db_out.get('last_metrics')}",
        flush=True,
    )

    # prefer the best-F1 checkpoint over the last state
    from comic_text_detector_tpu.training import checkpoint as ckpt_lib

    best_path = osp.join(work, "db_best.ctd")
    if osp.exists(best_path):
        payload = ckpt_lib.restore(best_path, db_state)
        db_state = payload["state"]
        print(f"using db_best.ctd (epoch {payload['meta'].get('epoch')})", flush=True)

    deploy["params"]["text_det"] = jax.device_get(db_state.params["dbnet"])
    deploy["batch_stats"]["text_det"] = jax.device_get(db_state.batch_stats["dbnet"])
    out_path = os.environ.get("CTD_DB_OUT", osp.join(ROOT, "data", "flagship_r3.npz"))
    save_compact(out_path, deploy)
    print(f"saved {out_path}", flush=True)


if __name__ == "__main__":
    main()
