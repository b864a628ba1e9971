"""Torch-side letterbox-pad hazard gate for candidate flagship checkpoints.

Our DB backends deliberately ignore lines that unproject past the page edge
(ops/db_decode.py; round-3 fact), so :mod:`scripts.eval_db_quality` can NEVER
see a DB head that fires in the letterbox pad — but the *reference* crashes
on the resulting empty crop (/root/reference/utils/textmask.py:159-169 via
inference.py:170, no clipping), which kills every same-weights golden.
This script exports the candidate to the reference's torch format
(models/convert.py::export_torch_checkpoint), runs the reference's own
preprocess + net + SegDetectorRepresenter on the real example page at 1024,
and reports every line candidate whose unprojected bbox lies outside the
page, with its score margin against the reference's 0.6 box threshold.

Round-4 measurements that motivated this gate (example page, 1024px):
flagship_r3 (ep1 warm-start db_best) fired 97 pad lines at scores up to
0.97; the epoch-9 db_last fired zero — pad firing is an epoch-dependent
training artifact, NOT cross-framework conv noise (scores 0.85 are 250
sigma beyond the ~1e-3 torch-vs-XLA jitter), so it must be gated per
checkpoint before promotion.

Run on CPU:  python scripts/check_pad_hazard.py data/flagship_r4.npz
Exit 0 = no pad hazards (promotable), 1 otherwise.
"""

from __future__ import annotations

import os
import os.path as osp
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, osp.join(ROOT, "tests"))

EXAMPLE = "/root/reference/data/examples/AisazuNihaIrarenai-003.jpg"


def main() -> int:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import cv2
    import numpy as np
    import torch

    from comic_text_detector_tpu.config import YOLOV5S_CFG
    from comic_text_detector_tpu.models.convert import export_torch_checkpoint
    from comic_text_detector_tpu.training.checkpoint import load_compact

    import oracles

    oracles.load_reference()
    import inference as ri  # the executed reference

    img = cv2.imread(EXAMPLE)
    im_h, im_w = img.shape[:2]

    rc = 0
    for ckpt_path in sys.argv[1:] or [osp.join(ROOT, "data", "flagship_r4.npz")]:
        variables = load_compact(ckpt_path)
        ck = export_torch_checkpoint(variables, YOLOV5S_CFG)
        ck["blk_det"]["cfg"] = oracles.torch_cfg(YOLOV5S_CFG)
        tmp = "/tmp/ctd_pad_hazard.pt"
        torch.save(ck, tmp)
        det = ri.TextDetector(model_path=tmp, input_size=1024, device="cpu", act="leaky")
        with torch.no_grad():
            img_in, _ratio, dw, dh = ri.preprocess_img(
                img, input_size=det.input_size, device="cpu", half=False, to_tensor=True
            )
            _blks, _mask, lines_map = det.net(img_in)
        lines, scores = det.seg_rep(det.input_size, lines_map)
        sc = np.asarray(scores[0])
        ln = np.asarray(lines[0], dtype=np.float64)
        rw = im_w / (det.input_size[0] - dw)
        rh = im_h / (det.input_size[1] - dh)
        ln[..., 0] *= rw
        ln[..., 1] *= rh
        # a line whose bbox min already sits past the page edge unprojects
        # entirely into the pad; the reference's expand_textwindow clamp then
        # yields an empty crop -> cv2 assertion (textmask.py:159-169)
        pad = (ln[..., 1].min(axis=1) >= im_h - 1) | (ln[..., 0].min(axis=1) >= im_w - 1)
        kept = pad & (sc > 0.6)
        top = np.sort(sc[pad])[::-1][:5] if pad.any() else np.zeros(0)
        print(
            f"{ckpt_path}: {int(kept.sum())} pad lines above the 0.6 box threshold "
            f"({int(pad.sum())} pad candidates at any score; top scores "
            f"{['%.4f' % s for s in top]})"
        )
        if kept.any():
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
