"""Bright-page speck-storm gate for candidate flagship checkpoints (CPU).

Round-5 diagnosis: the flagship_r4 DB head fires a dense periodic speck
field across whole bright sparse pages (~12% of the shrink map above the
0.3 binarization threshold OFF the GT text on the ja-majority parity page),
which explodes the reference-side line count (360 confident candidates vs
12 GT polys) and collapses every cross-framework golden.  Neither
scripts/eval_db_quality.py (example page only — busy, dark-ish) nor
scripts/check_pad_hazard.py (pad region only) can see it.

This gate renders three fixed synthetic pages from the failure families —
the exact ja-majority parity page, a flat-bright latin page, and a striped
extended-background page — runs the CANDIDATE through our own forward +
line decode (cross-framework conv noise is ~1e-3, far below the measured
signal, so the cheap jax side suffices), and counts DECODED lines above the
0.6 box threshold whose center lands outside the (dilated) GT text mask.

The gate is on decoded-line counts, not raw confident-pixel fraction:
flagship_r2 paints MORE off-text confident pixels (27-31% vs r4's 10-12%)
yet passes every golden, because its dense blobs merge into components
whose mean box score falls under 0.6, while r4's speck field decodes into
hundreds of small CONFIDENT lines (the thing that actually diverges the
two frameworks' order-dependent postprocessing).  Both numbers print; only
the line count gates.

Gate: <= CTD_SPECK_GATE (default 5) off-text confident lines per page
(r4 measured 26 through our capacity-bounded decode / 360 through the
reference's on the parity page; r2 measures 0-2).

Run on CPU:  python scripts/check_speck_hazard.py data/flagship_r5.npz
Exit 0 = promotable, 1 otherwise.
"""

from __future__ import annotations

import os
import os.path as osp
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)

GATE = int(os.environ.get("CTD_SPECK_GATE", "5"))


def _pages():
    from comic_text_detector_tpu.data.render import ComicTextRenderer

    # 1. the ja-majority parity page (tests/test_flagship_parity.py:250)
    bg = np.full((900, 640, 3), 240, np.uint8)
    bg[:, ::64] = 215
    r = ComicTextRenderer(seed=11, bubble_prob=0.4, blocks_per_page=(5, 8))
    r.blocks.ja_prob = 1.0
    out = r.render_page(bg)
    yield "ja-majority parity page", out["img"], out["mask"]

    # 2. flat-bright latin page (the speck storm fired on flat 240 too)
    bg = np.full((1000, 720, 3), 245, np.uint8)
    r = ComicTextRenderer(seed=5, bubble_prob=0.6, blocks_per_page=(3, 7))
    out = r.render_page(bg)
    yield "flat-bright latin page", out["img"], out["mask"]

    # 3. striped page (periodic thin rules — the r4 pad artifact's texture)
    bg = np.full((896, 640, 3), 238, np.uint8)
    bg[::24, :] = 214
    r = ComicTextRenderer(seed=17, bubble_prob=0.5, blocks_per_page=(4, 8))
    out = r.render_page(bg)
    yield "striped page", out["img"], out["mask"]


def main() -> int:
    import cv2
    import jax.numpy as jnp

    from comic_text_detector_tpu.ops.db_decode import (
        boxes_from_device_rects,
        db_decode_full_device,
    )
    from comic_text_detector_tpu.ops.resize import letterbox_shape
    from comic_text_detector_tpu.pipeline import TextDetector

    rc = 0
    for ckpt_path in sys.argv[1:] or [osp.join(ROOT, "data", "flagship_r5.npz")]:
        det = TextDetector(
            model_path=ckpt_path, input_size=1024, act="leaky", refine_backend="host"
        )
        size = det.input_size[0]
        for label, img, gt_mask in _pages():
            im_h, im_w = img.shape[:2]
            lb = det._lb(im_h, im_w)(jnp.asarray(img))
            x = lb.astype(jnp.float32) / 255.0
            _blks, _mask, lines = det._apply(det.variables, x[None])
            shrink = np.asarray(lines[0, :, :, 0], np.float32)

            # project the GT text mask into letterbox coordinates and dilate
            # (confident lines NEAR text are fine; the hazard is the field
            # far from any text)
            nh, nw, _dw, _dh, _ = letterbox_shape(im_h, im_w, size)
            gt_lb = cv2.resize(gt_mask, (nw, nh), interpolation=cv2.INTER_NEAREST)
            gt_full = np.zeros(shrink.shape, np.uint8)
            gt_full[:nh, :nw] = gt_lb
            gt_dil = cv2.dilate(gt_full, np.ones((25, 25), np.uint8)) > 0

            b, s, v = db_decode_full_device(jnp.asarray(shrink), det.db_thresh)
            ln, sc = boxes_from_device_rects(
                np.asarray(b), np.asarray(s), np.asarray(v), size, size, size, size
            )
            off_lines = 0
            for q, score in zip(ln, sc):
                if score <= det.box_thresh:
                    continue
                cy = min(max(int(q[:, 1].mean()), 0), size - 1)
                cx = min(max(int(q[:, 0].mean()), 0), size - 1)
                if not gt_dil[cy, cx]:
                    off_lines += 1
            conf = shrink > 0.3
            frac = float((conf & ~gt_dil).sum()) / shrink.size
            ok = off_lines <= GATE
            print(
                f"{osp.basename(ckpt_path)} | {label:28s} off-text lines>"
                f"{det.box_thresh}: {off_lines:4d}  (pixel frac {frac:.5f})"
                f"  {'OK' if ok else 'SPECK HAZARD'}"
            )
            if not ok:
                rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
