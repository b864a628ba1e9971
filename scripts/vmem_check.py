"""Hardware validation of the 'vmem' whole-canvas CC backend at 1024².

The 1024² DB-decode labeling currently routes to the banded Pallas sweeps
(22-30 ms measured, CLAUDE.md); the 'vmem' backend (ops/cc.py:102) runs the
whole canvas as ONE in-VMEM fixpoint window and was built to cut that, but
shipped explicit-only pending this check (VERDICT r3 weak #4): scoped-VMEM
overflows at novel shapes only surface on real hardware, never in interpret
mode.

This script, on the real TPU:
  1. builds a REAL DB shrink bitmap (flagship ckpt on the example page) plus
     a synthetic serpentine stress mask;
  2. equality-checks 'vmem' vs 'pallas' vs 'xla' labelings on both;
  3. times each backend amortized over many dispatches with one final sync
     (single-dispatch timings over the axon tunnel are garbage, CLAUDE.md).

Run in background:  python scripts/vmem_check.py 2>&1 | tee data/vmem_check.log
"""

from __future__ import annotations

import os
import os.path as osp
import sys
import time

import numpy as np

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)


def serpentine(h: int, w: int, pitch: int = 8) -> np.ndarray:
    """Worst-case single component: a boustrophedon stripe snake."""
    m = np.zeros((h, w), bool)
    for r in range(0, h - pitch, 2 * pitch):
        m[r : r + pitch // 2, :] = True
        m[r + pitch : r + pitch + pitch // 2, :] = True
        # connect alternating ends
        m[r : r + pitch + pitch // 2, :pitch] = True if (r // (2 * pitch)) % 2 else m[r : r + pitch + pitch // 2, :pitch]
        if (r // (2 * pitch)) % 2 == 0:
            m[r : r + pitch + pitch // 2, w - pitch :] = True
    return m


def main() -> None:
    os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("CTD_COMPILE_CACHE", osp.join(ROOT, ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)

    from comic_text_detector_tpu.ops.cc import connected_components
    from comic_text_detector_tpu.ops.resize import letterbox_np
    from comic_text_detector_tpu.pipeline import TextDetector
    from comic_text_detector_tpu.utils.io import imread

    size = 1024
    det = TextDetector(model_path=osp.join(ROOT, "data", "flagship_r2.npz"),
                       input_size=size, half=True)
    img = imread("/root/reference/data/examples/AisazuNihaIrarenai-003.jpg")
    lb, _, _ = letterbox_np(img, (size, size))

    @jax.jit
    def shrink_of(variables, x_u8):
        x = x_u8.astype(jnp.float32) / 255.0
        _, _, lines = det.model.apply(variables, x[None])
        return lines[0, :, :, 0].astype(jnp.float32)

    t0 = time.time()
    shrink = np.asarray(shrink_of(det.variables, jnp.asarray(lb)))
    print(f"real shrink map ready in {time.time()-t0:.0f}s "
          f"(fg {(shrink > 0.3).mean():.4f})", flush=True)

    cases = {
        "real-page": shrink > 0.3,
        "serpentine": serpentine(size, size),
        "dense-random": np.random.RandomState(0).rand(size, size) > 0.45,
    }

    for name, mask_np in cases.items():
        mask = jnp.asarray(mask_np)
        outs = {}
        for backend in ("xla", "pallas", "vmem"):
            t0 = time.time()
            try:
                out = connected_components(mask, 8, backend)
                out.block_until_ready()
            except Exception as e:  # noqa: BLE001 — report and continue
                print(f"{name:14s} {backend:7s} FAILED: {type(e).__name__}: {e}",
                      flush=True)
                continue
            compile_s = time.time() - t0
            # amortized timing: N back-to-back dispatches, one final sync
            n = 20
            t0 = time.time()
            for _ in range(n):
                out = connected_components(mask, 8, backend)
            out.block_until_ready()
            dt = (time.time() - t0) / n * 1e3
            outs[backend] = np.asarray(out)
            ncomp = len(np.unique(outs[backend])) - 1
            print(f"{name:14s} {backend:7s} {dt:8.2f} ms/label  "
                  f"(first call {compile_s:.1f}s, {ncomp} comps)", flush=True)
        ref = outs.get("xla")
        for backend, out in outs.items():
            if ref is not None and backend != "xla":
                eq = np.array_equal(out, ref)
                print(f"{name:14s} {backend:7s} equality vs xla: {eq}", flush=True)
                if not eq:
                    diff = (out != ref).sum()
                    print(f"  {diff} differing pixels", flush=True)


if __name__ == "__main__":
    main()
