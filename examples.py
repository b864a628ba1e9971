"""End-to-end walkthrough (the reference's examples.ipynb as a script).

Runs entirely self-contained on synthetic data:

  1. render synthetic training pages (text-free bg -> img/mask/lines/labels)
  2. annotate images with a detector (the weak-supervision label factory)
  3. train the U-Net mask head a few steps
  4. graft + train the DB text-line head a few steps
  5. merge the trained pieces into a deploy model, run detection
  6. export a StableHLO artifact and parity-check it

Usage:  python examples.py [workdir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import numpy as np


def main(workdir: str | None = None) -> None:
    root = Path(workdir or tempfile.mkdtemp(prefix="ctd_example_"))
    print(f"working in {root}")

    # 1. synthetic data ------------------------------------------------
    from comic_text_detector_tpu.data.render import render_comictext
    from comic_text_detector_tpu.utils.io import imwrite

    bg_dir, ds_dir = root / "bg", root / "dataset"
    bg_dir.mkdir(exist_ok=True, parents=True)
    rng = np.random.default_rng(0)
    for i in range(6):
        bg = np.full((512, 400, 3), 235, np.uint8)
        bg[:: rng.integers(25, 60)] = 210
        imwrite(str(bg_dir / f"bg{i}.png"), bg)
    n = render_comictext(str(bg_dir), str(ds_dir), seed=0)
    print(f"1. rendered {n} synthetic pages -> {ds_dir}")

    # 2. annotate with a detector (random weights here; use a real ckpt
    #    in practice) ---------------------------------------------------
    from comic_text_detector_tpu.pipeline import TextDetector, model2annotations

    det = TextDetector.random_init(input_size=256)
    ann_dir = root / "annotations"
    ann_dir.mkdir(exist_ok=True)
    model2annotations(det, str(bg_dir), str(ann_dir), save_json=True, progress=False)
    print(f"2. annotated {len(list(ann_dir.glob('mask-*.png')))} pages -> {ann_dir}")

    # 3. train U-Net head ----------------------------------------------
    from comic_text_detector_tpu.training import db_trainer, seg_trainer
    from comic_text_detector_tpu.utils.config import load_hyp

    hyp = load_hyp(None, kind="seg", overrides={
        "data": {"train_img_dir": str(ds_dir), "val_img_dir": str(ds_dir),
                 "imgsz": 128, "augment": False, "save_dir": str(root / "ckpt")},
        "train": {"epochs": 1, "batch_size": 2, "lr0": 1e-3},
    })
    seg_out = seg_trainer.train(hyp, max_steps=3)
    print(f"3. seg head trained {seg_out['steps']} steps, loss {seg_out['last_loss']:.3f}")

    # 4. graft + train DB head ------------------------------------------
    seg_state = seg_out["state"]
    unet_variables = {
        "params": {"backbone": seg_state.frozen["backbone"], "seg_net": seg_state.params},
        "batch_stats": seg_state.batch_stats,
    }
    db_hyp = load_hyp(None, kind="db", overrides={
        "data": {"train_img_dir": str(ds_dir), "val_img_dir": str(ds_dir),
                 "imgsz": 128, "augment": False, "save_dir": str(root / "ckpt")},
        "train": {"epochs": 1, "batch_size": 2, "lr0": 1e-3, "accumulation_steps": 1},
    })
    db_out = db_trainer.train(db_hyp, unet_variables=unet_variables, max_steps=3)
    print(f"4. DB head trained {db_out['steps']} steps, loss {db_out['last_metrics']['loss']:.3f}")

    # 5. merge into a deploy model + detect ------------------------------
    import jax

    from comic_text_detector_tpu.models.detector import build_inference_model, init_variables
    from comic_text_detector_tpu.utils.io import imread

    model = build_inference_model(act="leaky")
    deploy = init_variables(model, jax.random.PRNGKey(0), input_size=128)
    for k, v in seg_state.frozen["backbone"].items():
        deploy["params"]["blk_det"][k] = v
        deploy["batch_stats"]["blk_det"][k] = seg_state.batch_stats["backbone"][k]
    deploy["params"]["text_seg"] = seg_state.params
    deploy["batch_stats"]["text_seg"] = seg_state.batch_stats["seg_net"]
    deploy["params"]["text_det"] = db_out["state"].params
    deploy["batch_stats"]["text_det"] = db_out["state"].batch_stats["dbnet"]
    det2 = TextDetector(variables=deploy, input_size=128, act="leaky")
    page = imread(str(ds_dir / "bg0.png"))
    mask, mask_refined, blk_list = det2(page)
    print(f"5. deploy model detected {len(blk_list)} blocks; mask {mask.shape}")

    # 6. export + parity ---------------------------------------------------
    from comic_text_detector_tpu.export import export_stablehlo, parity_check

    artifact = str(root / "model.stablehlo")
    export_stablehlo(deploy, artifact, input_size=128)
    ok, diff = parity_check(deploy, artifact, input_size=128)
    print(f"6. exported {artifact}; parity ok={ok} (max diff {diff:.2e})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
