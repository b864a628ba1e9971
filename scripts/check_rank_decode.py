"""ON-HARDWARE equality check for the rank-ids DB decode routing.

``db_decode_full_device``'s TPU path feeds the fused CC+rank kernel's dense
raster-ordered ids straight into the boundary-table/stats math
(ops/db_decode.py:74-153); the CPU test (tests/test_db_decode.py) can only
exercise it in Pallas interpret mode, which cannot catch Mosaic miscompiles
or scoped-VMEM overflows (CLAUDE.md round-3 facts).  This drives BOTH
routings on the real example page's DB probability map at 1024 on the TPU
and asserts identical rects/scores/valid, then reports amortized timings.

Run on the real TPU (training paused):  python scripts/check_rank_decode.py
"""

from __future__ import annotations

import os
import os.path as osp
import sys
import time

import numpy as np

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)

EXAMPLE = "/root/reference/data/examples/AisazuNihaIrarenai-003.jpg"


def main() -> int:
    os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("CTD_COMPILE_CACHE", osp.join(ROOT, ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from comic_text_detector_tpu.ops.db_decode import db_decode_full_device
    from comic_text_detector_tpu.pipeline import TextDetector
    from comic_text_detector_tpu.pipeline.detector import upload_page
    from comic_text_detector_tpu.utils.io import imread

    ckpt = sys.argv[1] if len(sys.argv) > 1 else osp.join(ROOT, "data", "flagship_r2.npz")
    det = TextDetector(model_path=ckpt, input_size=1024, half=True)
    img = imread(EXAMPLE)
    im_h, im_w = img.shape[:2]

    # the exact probability map the fused dispatch decodes (detector.py:250)
    lb_u8 = det._lb(im_h, im_w)(upload_page(img))
    x = lb_u8.astype(jnp.float32) / 255.0
    _, _, lines = jax.jit(det._apply)(det.variables, x[None])
    prob = jnp.asarray(lines[0, :, :, 0].astype(jnp.float32))
    jax.block_until_ready(prob)
    fg = float(jnp.mean(prob > det.db_thresh))
    print(f"ckpt {ckpt}: prob map {prob.shape}, fg frac {fg:.4f}")

    results = {}
    for tag, flag in (("label", False), ("rank", True)):
        t0 = time.perf_counter()
        r = db_decode_full_device(prob, det.db_thresh, rank_ids=flag)
        jax.block_until_ready(r)
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(10):
            r = db_decode_full_device(prob, det.db_thresh, rank_ids=flag)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / 10
        results[tag] = [np.asarray(a) for a in r]
        print(f"{tag:6s} decode: {dt * 1e3:7.2f} ms  (first call {first:.1f}s)")

    (ba, sa, va), (bb, sb, vb) = results["label"], results["rank"]
    if not np.array_equal(va, vb):
        print(f"VALID MISMATCH: {int(va.sum())} vs {int(vb.sum())}")
        return 1
    # scores are per-component mean probabilities; the rank path sums them
    # on the MXU (one-hot matmul, f32-via-bf16 3-pass) while the label path
    # scatter-adds sequentially — different reassociation, so ~1e-4 jitter
    # at 1M-pixel components is expected (measured 2.29e-04 max on the r2
    # fg=0.42 map, data/check_rank_decode_r4d.log), far under the 0.05+
    # margins scores are compared against downstream (box_thresh).
    # Tolerance = 2x the measured worst case: passes known reassociation
    # jitter while keeping headroom to catch a real score regression.
    if not np.allclose(sa[va], sb[vb], rtol=5e-4, atol=5e-4):
        print(f"SCORE MISMATCH: max |d| {np.abs(sa[va] - sb[vb]).max():.2e}")
        return 1
    if not np.allclose(ba[va], bb[vb], rtol=1e-4, atol=1e-3):
        print(f"BOX MISMATCH: max |d| {np.abs(ba[va] - bb[vb]).max():.2e}")
        return 1
    print(f"rank-vs-label decode equality on hardware: OK ({int(va.sum())} rects)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
