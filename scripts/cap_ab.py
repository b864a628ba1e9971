"""Hardware A/B of the refine component caps: shipping vs audit-reduced.

The round-5 audit (scripts/audit_component_caps.py) measured worst-case real
per-window component counts 5-45x under the shipping BUCKETS caps, and every
accept-path table (`_component_sums` factored one-hots, `_take_accept`
tables) scales linearly with cap.  This script times `_refine_windows_jit`
per bucket — SAME process, SAME candidate windows, both cap values — and
asserts the outputs are bit-equal (they must be whenever the real component
count stays under the smaller cap; ranks >= cap are never accepted), then
times the whole-page `refine_page` under both cap sets.

Run on the real TPU (quiet host, training stopped):
    python scripts/cap_ab.py
Promotion rule (CLAUDE.md): a cap-set default flips only after this script
reports every bucket bit-equal ON HARDWARE and a real timing win.
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


def _pages():
    """Example page + the audit's noisiest renderer page (1567 comps at
    256x640 — the one that sized the caps)."""
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
        if i == 2:  # pages 0-1 only advance the rng to reproduce page 2
            yield f"renderer page {i} ({h}x{w})", rend.render_page(bg)["img"]
        else:
            rend.render_page(bg)


def main() -> int:
    os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("CTD_COMPILE_CACHE", osp.join(ROOT, ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from comic_text_detector_tpu.ops import refine as R
    from comic_text_detector_tpu.pipeline import TextDetector
    from comic_text_detector_tpu.utils.imgproc import expand_textwindow

    audit_caps = dict(zip(((h, w) for h, w, _, _ in R.BUCKETS), R._CAP_PRESETS["audit"]))
    ckpt = os.environ.get(
        "CTD_PROFILE_CKPT", osp.join(ROOT, "data", "flagship_r4.npz")
    )
    det = TextDetector(
        model_path=ckpt, input_size=1024, half=True,
        refine_backend="device", mask_transfer="packed",
    )
    reps = int(os.environ.get("CTD_AB_REPS", "10"))

    def t(fn, n=reps):
        jax.block_until_ready(fn())  # compile/warm
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n, out

    any_neq = False
    for label, img in _pages():
        mask, _refined, blks = det(img)
        if not blks:
            print(f"{label}: no blocks")
            continue
        windows = np.asarray(
            [expand_textwindow(img.shape, b.xyxy, expand_r=16) for b in blks],
            np.int32,
        ).reshape(-1, 4)
        img_d = jnp.asarray(img)[None]
        mask_d = jnp.asarray(mask)[None]
        groups: dict[int, list[int]] = {}
        for j, (x1, y1, x2, y2) in enumerate(windows):
            groups.setdefault(R._bucket_index(int(x2 - x1), int(y2 - y1)), []).append(j)
        print(f"\n== {label}: {len(blks)} blocks ==")
        for bi, idxs in sorted(groups.items()):
            exact = bi >= 0
            bh, bw, slots, cap_ship = R.BUCKETS[bi if exact else -1]
            cap_aud = audit_caps[(bh, bw)]
            sel = idxs[:slots]
            bb = np.zeros((slots, 4), np.int32)
            bb[:, 2:] = 1
            bb[: len(sel)] = windows[sel]
            vv = np.zeros((slots,), bool)
            vv[: len(sel)] = True
            pp = np.zeros((slots,), np.int32)
            bb_d, vv_d, pp_d = jnp.asarray(bb), jnp.asarray(vv), jnp.asarray(pp)

            def disp(cap):
                return R._refine_windows_jit(
                    img_d, mask_d, bb_d, vv_d, pp_d, jnp.int32(1),
                    (bh, bw), cap, exact,
                )

            dt_s, out_s = t(lambda: disp(cap_ship))
            if cap_aud == cap_ship:
                print(
                    f"bucket {bh}x{bw} ({len(sel)} win) cap {cap_ship:5d}: "
                    f"{dt_s*1e3:7.2f} ms  (audit cap identical)"
                )
                continue
            dt_a, out_a = t(lambda: disp(cap_aud))
            eq = bool(np.array_equal(np.asarray(out_s), np.asarray(out_a)))
            any_neq |= not eq
            print(
                f"bucket {bh}x{bw} ({len(sel)} win) cap {cap_ship:5d}->{cap_aud:5d}: "
                f"{dt_s*1e3:7.2f} -> {dt_a*1e3:7.2f} ms "
                f"({(dt_s-dt_a)/dt_s*100:+.1f}%)  bit-equal={eq}"
            )

        # whole-page refine under each cap set (BUCKETS swapped in place;
        # refine_pages reads the module constant per call)
        ship_buckets = R.BUCKETS
        audit_buckets = tuple(
            (h, w, s, audit_caps[(h, w)]) for h, w, s, _ in ship_buckets
        )
        results = {}
        for name, bset in (("ship", ship_buckets), ("audit", audit_buckets)):
            R.BUCKETS = bset
            try:
                dt, out = t(lambda: R.refine_page(img_d[0], mask_d[0], windows, 1))
            finally:
                R.BUCKETS = ship_buckets
            results[name] = (dt, np.asarray(out))
            print(f"refine_page [{name} caps]  {dt*1e3:7.2f} ms")
        eq = bool(np.array_equal(results["ship"][1], results["audit"][1]))
        any_neq |= not eq
        print(f"refine_page bit-equal={eq}")

    print("\nverdict:", "NOT bit-equal — do not flip" if any_neq else "all bit-equal")
    return 1 if any_neq else 0


if __name__ == "__main__":
    sys.exit(main())
