"""Round-5 DB-head retrain: close the bright-page speck-storm failure.

Round-5 diagnosis (data/parity_r4_r5.log + /tmp shrink-map dumps): the
flagship_r4 DB head (r4 warm-start, stopped at epoch 9 of a 40-epoch cosine)
hallucinates a dense periodic speck field across WHOLE bright sparse pages —
e.g. the ja-majority parity page (340+ confident line candidates off the GT
text, reference side 27 blocks vs our 3, refined-IoU collapse to 0.88).  The
r3/r4 training backgrounds (gradients / noise / borders / ellipses) contain
no near-flat bright pages, no periodic stripe textures, and no screentone
grids, and only 35% of blocks were kana-like — exactly the families the
parity page draws from.

This run warm-starts from flagship_r4's head and retrains on a dataset that
adds those families:

* extended backgrounds (scripts/train_flagship.py::make_backgrounds
  extended=True: stripes, screentone dots, near-flat bright pages);
* a 30% all-kana page pool (ja_prob=1.0, the parity page's configuration)
  alongside the 70% default-mix pool;
* same page count / schedule shape as r3 (CTD_DB_PAGES=2400, cosine).

Promotion gates (run per candidate BEFORE flipping any default):
  scripts/check_pad_hazard.py  +  scripts/check_speck_hazard.py  +
  CTD_PARITY_CKPT=<candidate> pytest tests/test_flagship_parity.py

Writes data/flagship_r5.npz.  Chunked/resumed exactly like the r3 driver:
    scripts/train_db_chunks.sh  (CTD_DB_SCRIPT=scripts/train_db_r5.py)

Reference scope: /root/reference/train_db.py:59-198 (training loop),
README.md:16-24 (the reference's own answer was 13k REAL pages).
"""

from __future__ import annotations

import os
import os.path as osp
import sys
import time

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)

N_PAGES = int(os.environ.get("CTD_DB_PAGES", "2400"))
N_VAL = int(os.environ.get("CTD_DB_VAL", "48"))
IMGSZ = int(os.environ.get("CTD_TRAIN_IMGSZ", "512"))
EPOCHS = int(os.environ.get("CTD_DB_EPOCHS", "24"))
BATCH = int(os.environ.get("CTD_DB_BATCH", "8"))
LR0 = float(os.environ.get("CTD_DB_LR0", "5e-4"))
EVAL_INT = int(os.environ.get("CTD_DB_EVAL_INT", "2"))
WARMSTART = os.environ.get("CTD_DB_WARMSTART", osp.join(ROOT, "data", "flagship_r4.npz"))
KANA_FRAC = float(os.environ.get("CTD_DB_KANA_FRAC", "0.3"))
# fine-tune runs (few hundred steps) must shrink the reference 700-step
# warmup floor or they never leave warmup (round-5 post-mortem, TRAINLOG.md)
WARMUP = os.environ.get("CTD_DB_WARMUP")


def render_r5_dataset(work: str) -> None:
    from comic_text_detector_tpu.data.render import ComicTextRenderer, render_comictext
    from scripts.train_flagship import make_backgrounds

    corpus = osp.join(ROOT, "data", "corpus_en.txt")
    if not osp.exists(corpus):
        import scripts.build_corpus as bc

        bc.main()

    t0 = time.time()
    n_kana = int(N_PAGES * KANA_FRAC)
    n_mix = N_PAGES - n_kana
    v_kana = max(8, int(N_VAL * KANA_FRAC))
    v_mix = N_VAL - v_kana
    total = 0
    for split, pools in (
        ("train", ((n_mix, 51, 53, False), (n_kana, 52, 54, True))),
        ("val", ((v_mix, 61, 63, False), (v_kana, 62, 64, True))),
    ):
        for n, bg_seed, rend_seed, all_kana in pools:
            tag = "kana" if all_kana else "mix"
            bg_dir = osp.join(work, f"bg_{split}_{tag}")
            out_dir = osp.join(work, split)
            make_backgrounds(bg_dir, n, seed=bg_seed, extended=True)
            # rendered pages are named after their background file; both
            # pools share one out_dir, so the bg names must carry the pool
            # tag or the second pool OVERWRITES the first (r5 bug: the kana
            # pool replaced the first 720 mix pages — 1649 usable train
            # pages at 43% kana instead of 2400 at 30%)
            for f in sorted(os.listdir(bg_dir)):
                if not f.startswith(f"{tag}_"):
                    os.replace(osp.join(bg_dir, f), osp.join(bg_dir, f"{tag}_{f}"))
            rend = ComicTextRenderer(
                seed=rend_seed,
                bubble_prob=0.5,
                blocks_per_page=(2, 9),
                word_dict=corpus,
            )
            if all_kana:
                rend.blocks.ja_prob = 1.0
            total += render_comictext(bg_dir, out_dir, renderer=rend)
    print(f"rendered {total} pages in {time.time() - t0:.0f}s", flush=True)


def main() -> None:
    os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
    import jax

    cache_dir = os.environ.get("CTD_COMPILE_CACHE", osp.join(ROOT, ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)

    from comic_text_detector_tpu.training import db_trainer
    from comic_text_detector_tpu.training.checkpoint import load_compact, save_compact

    work = os.environ.get("CTD_DB_WORK", osp.join(ROOT, "data", "db_work_r5"))
    ds_train, ds_val = osp.join(work, "train"), osp.join(work, "val")
    if not osp.exists(osp.join(work, ".rendered_r5")):
        render_r5_dataset(work)
        open(osp.join(work, ".rendered_r5"), "w").write("ok")
    if os.environ.get("CTD_DB_RENDER_ONLY") == "1":
        print("render-only mode: dataset ready, exiting", flush=True)
        return

    # trained trunk: backbone <- blk_det, seg <- text_seg of the warm ckpt
    deploy = load_compact(WARMSTART)
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
            **({"warmup_steps": int(WARMUP)} if WARMUP is not None else {}),
        },
        "model": {"act": "leaky"},
    }
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
    if "resume" not in hyp_db:
        # warm start: init for structure, graft the trunk, overwrite dbnet
        # with the previously trained head
        import jax.numpy as jnp

        from comic_text_detector_tpu.constants import TEXTDET_DET
        from comic_text_detector_tpu.models.detector import build_train_model
        from comic_text_detector_tpu.training.db_trainer import graft_db_variables

        model = build_train_model(act="leaky", with_db=True)
        with jax.default_device(jax.devices("cpu")[0]):
            variables = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3), jnp.float32),
                forward_mode=TEXTDET_DET,
            )
        variables = graft_db_variables(variables, unet_variables)
        variables["params"]["dbnet"] = deploy["params"]["text_det"]
        variables["batch_stats"]["dbnet"] = deploy["batch_stats"]["text_det"]
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

    # Promotion is NOT by val F1 alone (round-4 lesson): every epoch snapshot
    # must pass the pad + speck gates; this script just writes the LAST state
    # as the default candidate and leaves db_best/db_last in the work dir for
    # gating (scripts/assemble_flagship_r3.py grafts any .ctd onto a trunk).
    deploy["params"]["text_det"] = jax.device_get(db_state.params["dbnet"])
    deploy["batch_stats"]["text_det"] = jax.device_get(db_state.batch_stats["dbnet"])
    out_path = os.environ.get("CTD_DB_OUT", osp.join(ROOT, "data", "flagship_r5.npz"))
    save_compact(out_path, deploy)
    print(f"saved {out_path}", flush=True)


if __name__ == "__main__":
    main()
