"""Sweep (batch size, stream depth) for the volume pipeline in ONE process.

Shares compiled executables across depth settings (and across B where
shapes coincide) so a full sweep costs one compile per B instead of one
bench.py process each.  Prints a table plus the best configuration as JSON.

Run on the real TPU:  python scripts/bench_sweep.py
Env: CTD_SWEEP_BATCHES (default "2,4,8"), CTD_SWEEP_DEPTHS (default "2,3"),
     CTD_SWEEP_PAGES (default 24 per measurement).
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


def main() -> None:
    os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
    import jax

    cache_dir = os.environ.get("CTD_COMPILE_CACHE", osp.join(ROOT, ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from comic_text_detector_tpu.pipeline import TextDetector
    from comic_text_detector_tpu.pipeline.batch import BatchTextDetector
    from comic_text_detector_tpu.utils.io import imread

    ckpt = os.environ.get("CTD_BENCH_CKPT", osp.join(ROOT, "data", "flagship_r4.npz"))
    det = TextDetector(
        model_path=ckpt, input_size=1024, half=True,
        refine_backend="device", mask_transfer="packed",
    )
    img = imread("/root/reference/data/examples/AisazuNihaIrarenai-003.jpg")

    batches = [int(x) for x in os.environ.get("CTD_SWEEP_BATCHES", "2,4,8").split(",")]
    depths = [int(x) for x in os.environ.get("CTD_SWEEP_DEPTHS", "2,3").split(",")]
    n_pages_env = int(os.environ.get("CTD_SWEEP_PAGES", "24"))

    best = None
    rows = []
    for bsz in batches:
        bdet = BatchTextDetector(
            det.variables, batch_size=bsz, input_size=1024, half=True,
            refine_backend="device", mask_transfer="packed",
        )
        n_pages = max(n_pages_env // bsz, 2) * bsz
        pages = [img] * n_pages
        list(bdet.stream(iter(pages[: bsz * 2]), prefetch=2))  # compile + warm
        for depth in depths:
            t0 = time.perf_counter()
            results = list(bdet.stream(iter(pages), prefetch=depth))
            dt = time.perf_counter() - t0
            assert len(results) == n_pages
            pps = n_pages / dt
            rows.append((bsz, depth, pps))
            print(f"B={bsz} depth={depth}: {pps:.3f} pages/s ({n_pages} pages in {dt:.1f}s)", flush=True)
            if best is None or pps > best[2]:
                best = (bsz, depth, pps)

    print(json.dumps({"best_batch": best[0], "best_depth": best[1], "pages_per_sec": round(best[2], 4)}))


if __name__ == "__main__":
    main()
