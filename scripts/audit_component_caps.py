"""Audit real per-window component counts against the refine BUCKETS caps.

The component capacity (BUCKETS[*][3]) sizes every `_component_sums` /
`_take_accept` table: the factored one-hot MXU matmuls scale linearly with
cap, and the mid buckets carry cap=8192 — 4x the 256x256 bucket — "so noisy
candidates don't overflow".  Components at rank >= cap are silently never
accepted (conservative), so an over-tight cap is a PARITY risk, not a
crash; this audit measures how many components real windows actually
produce at each accept point:

  * each of the 4 candidate sets after `_drop_tiny_components` (the merge
    tables), and
  * the inverse of the final merged mask (the `_fill_holes` table),

across the reference example page plus renderer pages from the bench's
mixed stream (including noisy color-model candidates on textured
backgrounds).  Runs entirely on CPU (grid CC backend) — no TPU needed.

Output: per (bucket, stage) max component count, vs the shipping cap.
"""

from __future__ import annotations

import os
import os.path as osp
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)

EXAMPLE = "/root/reference/data/examples/AisazuNihaIrarenai-003.jpg"


def _pages():
    from comic_text_detector_tpu.data.render import ComicTextRenderer
    from comic_text_detector_tpu.utils.io import imread

    yield "example page", imread(EXAMPLE)
    rng = np.random.default_rng(7)
    rend = ComicTextRenderer(seed=7, bubble_prob=0.5, blocks_per_page=(4, 10))
    for i, (h, w) in enumerate([(1500, 1060), (1056, 1500), (1170, 1685)]):
        lo, hi = int(rng.integers(165, 205)), int(rng.integers(220, 252))
        g = np.linspace(lo, hi, h).astype(np.uint8)
        bg = np.broadcast_to(g[:, None, None], (h, w, 3)).copy()
        bg = (
            (bg.astype(np.int16) + rng.integers(-18, 18, (h, w, 1)))
            .clip(0, 255)
            .astype(np.uint8)
        )
        yield f"renderer page {i} ({h}x{w})", rend.render_page(bg)["img"]


def main() -> int:
    from comic_text_detector_tpu.ops import refine as R
    from comic_text_detector_tpu.pipeline import TextDetector
    from comic_text_detector_tpu.utils.imgproc import expand_textwindow

    ckpt = sys.argv[1] if len(sys.argv) > 1 else osp.join(ROOT, "data", "flagship_r4.npz")
    det = TextDetector(model_path=ckpt, input_size=1024, refine_backend="host")

    worst: dict[tuple, int] = {}
    for label, img in _pages():
        mask, _refined, blks = det(img)
        if not blks:
            print(f"{label}: no blocks")
            continue
        boxes = np.asarray(
            [expand_textwindow(img.shape, b.xyxy, expand_r=16) for b in blks], np.int32
        )
        groups: dict[int, list[int]] = {}
        for j, (x1, y1, x2, y2) in enumerate(boxes):
            groups.setdefault(R._bucket_index(int(x2 - x1), int(y2 - y1)), []).append(j)
        img_d = jnp.asarray(img)[None]
        mask_d = jnp.asarray(mask)[None]
        for bi, idxs in sorted(groups.items()):
            bh, bw, _slots, cap = R.BUCKETS[bi]
            b = jnp.asarray(boxes[idxs])
            pids = jnp.zeros((len(idxs),), jnp.int32)
            win_img, win_msk, in_window = R.extract_windows(
                img_d, mask_d, b, pids, (bh, bw)
            )
            cands, xors = R._candidates(win_img, win_msk, in_window)
            k = len(idxs)
            fgs = R._drop_tiny_components((cands > 0).reshape(4 * k, bh, bw))
            ids_all = R._component_ids(fgs).reshape(4, k, bh, bw)
            fgs = fgs.reshape(4, k, bh, bw)
            cand_max = int(jnp.max(ids_all))
            pred = R._erode_ellipse3(jnp.where(in_window, win_msk, 255)) > 60
            pred &= in_window
            order = jnp.argsort(xors, axis=0)
            merged = jnp.zeros((k, bh, bw), bool)
            for rank in range(4):
                idx = order[rank][None, :, None, None]
                fg = jnp.take_along_axis(fgs, idx, axis=0)[0]
                ids = jnp.take_along_axis(ids_all, idx, axis=0)[0]
                merged = R._merge_labeled(merged, fg, ids, pred, cap=cap)
            dil = (R._dilate_rect3(merged.astype(jnp.uint8) * 255) > 0) & in_window
            inv_ids = R._component_ids(~dil)
            inv_max = int(jnp.max(inv_ids))
            key = (bh, bw)
            worst[key] = max(worst.get(key, 0), cand_max, inv_max)
            print(
                f"{label:28s} bucket {bh}x{bw} ({k:2d} win, cap {cap:5d}): "
                f"max candidate comps {cand_max:5d}, max fill-holes comps {inv_max:5d}"
            )

    print("\nworst per bucket shape (vs shipping cap):")
    for (bh, bw), m in sorted(worst.items()):
        cap = R.BUCKETS[R._bucket_index(bw, bh)][3]
        print(f"  {bh}x{bw}: worst {m:5d}  cap {cap:5d}  headroom {cap / max(m,1):.1f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
