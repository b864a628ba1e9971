"""DB-head quality gate for a candidate flagship checkpoint (CPU-only).

Run before promoting a checkpoint to the parity/bench default:

    python scripts/eval_db_quality.py data/flagship_r3.npz

Checks, on the real example page at 1024px:
  1. block/line counts and geometry stability across two runs (the VERDICT
     round-2 "line set stable across reruns" criterion);
  2. out-of-bounds lines/blocks — a DB line firing in the letterbox pad
     unprojects past the page edge, and the *reference* crashes on the
     resulting empty crop (utils/textmask.py:159-169 via inference.py:170
     — no clipping), so a checkpoint that produces one cannot be
     golden-gated;
  3. degenerate blocks (zero/negative area).

Exit code 0 = promotable (no reference-crash hazards), 1 otherwise.
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

EXAMPLE = "/root/reference/data/examples/AisazuNihaIrarenai-003.jpg"


def main() -> int:
    from comic_text_detector_tpu.pipeline import TextDetector
    from comic_text_detector_tpu.utils.io import imread

    ckpt = sys.argv[1] if len(sys.argv) > 1 else osp.join(ROOT, "data", "flagship_r3.npz")
    img = imread(EXAMPLE)
    im_h, im_w = img.shape[:2]
    det = TextDetector(model_path=ckpt, input_size=1024, act="leaky", refine_backend="host")

    runs = []
    for _ in range(2):
        _mask, _refined, blks = det(img.copy())
        runs.append(blks)

    a, b = runs
    print(f"ckpt {ckpt}: {len(a)} blocks (run 1), {len(b)} blocks (run 2)")
    ok = True
    if len(a) != len(b):
        print("UNSTABLE: block count differs across reruns")
        ok = False
    else:
        deltas = [
            max(abs(int(x) - int(y)) for x, y in zip(p.xyxy, q.xyxy))
            for p, q in zip(a, b)
        ]
        if max(deltas, default=0) > 0:
            print(f"UNSTABLE: block geometry differs across reruns (max delta {max(deltas)} px)")
            ok = False

    n_lines = 0
    for blk in a:
        x1, y1, x2, y2 = (int(v) for v in blk.xyxy)
        if x2 <= x1 or y2 <= y1:
            print(f"DEGENERATE block {blk.xyxy}")
            ok = False
        # the reference clamps the expanded window to [0, im-1]; a block
        # starting at/past the edge yields an empty crop -> cv2 assertion
        if x1 >= im_w - 1 or y1 >= im_h - 1 or x2 <= 0 or y2 <= 0:
            print(f"OUT-OF-BOUNDS block {blk.xyxy} (page {im_w}x{im_h}) — reference would crash")
            ok = False
        lines = blk.lines_array(dtype=np.float64)
        n_lines += len(lines)
        for ln in lines:
            if ln[..., 0].min() >= im_w or ln[..., 1].min() >= im_h:
                print(f"OUT-OF-BOUNDS line {ln.tolist()} — pad-region DB firing")
                ok = False
    print(f"{n_lines} lines total; hazards: {'none' if ok else 'FOUND'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
