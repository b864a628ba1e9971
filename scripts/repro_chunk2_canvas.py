"""Minimal repro for the chunk2 1024x1024 canvas-labels Mosaic failure.

Round-4 observed: the in-VMEM CC labels kernel (ops/pallas_kernels.py::
cc_windows_local) compiles and validates at every bucket shape with the
'chunk2' fixpoint variant, but at the whole-canvas (1, 1024, 1024) labels
shape the remote Mosaic compiler returns an internal error (HTTP 500) —
while 'base' compiles and runs at 3.54 ms on the same shape.  This script
pins the failure to its minimal form and records the full error text so
future kernel changes can check whether the compiler bug is still present.

It bisects the failing element count: (1, 1024, 1024) chunk2 vs the largest
known-good fused shape (512x512) and two intermediate canvas shapes, for
both the labels-only kernel and (for context) 'base'.

Run on hardware:  python scripts/repro_chunk2_canvas.py
Exit code is always 0 — this is a diagnostic recorder, not a gate.
"""

from __future__ import annotations

import os
import os.path as osp
import sys
import time
import traceback

import numpy as np

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("CTD_COMPILE_CACHE", osp.join(ROOT, ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from comic_text_detector_tpu.ops.pallas_kernels import cc_windows_local

    rng = np.random.default_rng(0)
    shapes = [
        (1, 512, 512),     # largest known-good fused shape
        (1, 512, 1024),    # 2x elements, same width as canvas
        (1, 1024, 512),    # 2x elements, canvas height
        (1, 1024, 1024),   # the failing whole-canvas labels shape
    ]
    for variant in ("base", "chunk2"):
        for shp in shapes:
            m = (rng.random(shp) < 0.35).astype(np.uint8)
            m_dev = jnp.asarray(m)
            jax.block_until_ready(m_dev)
            t0 = time.perf_counter()
            try:
                out = cc_windows_local(m_dev, None, variant)
                jax.block_until_ready(out)
                dt = (time.perf_counter() - t0) * 1e3
                print(f"{variant:8s} {str(shp):18s} OK  first-call {dt:8.1f} ms", flush=True)
            except Exception:
                print(f"{variant:8s} {str(shp):18s} FAIL", flush=True)
                tb = traceback.format_exc()
                print(tb[-3000:], flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
