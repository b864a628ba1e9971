"""ON-HARDWARE A/B of the in-VMEM CC fixpoint variants.

The per-window CC fixpoint kernel (ops/pallas_kernels.py::_cc_fixpoint) has
exactness-preserving variants: 'chunk2' amortizes the convergence check over
two propagation rounds, 'diag' replaces the single-step diagonal hop with
doubling diagonal sweeps (thin anti-aliased diagonal strokes converge in one
round instead of one pixel per round), 'diagchunk2' combines both.  All
variants reach the identical fixpoint (interpret-mode equality is unit
-tested), but their Mosaic compile behavior and real round counts are only
observable on hardware — and a variant only enters the default path
(_DEFAULT_VARIANT) after this script records it faster AND bit-equal on the
real example page's candidate sets at every production bucket shape, plus
the 1024 whole-canvas labels shape (CLAUDE.md round-4 facts: every new
Pallas shape compiles once on hardware before entering a default path).

Run on the real TPU (training paused):  python scripts/cc_variant_ab.py
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
# CTD_AB_VARIANTS narrows the sweep (comma list); CTD_AB_CASES=synth runs
# ONLY synthetic window sets at every production bucket shape, skipping the
# detector build entirely — the quick compile+equality gate before a default
# flip (real-page timings come from the full run).
VARIANTS = tuple(
    os.environ.get("CTD_AB_VARIANTS", "base,chunk2,diag,diagchunk2").split(",")
)


def _synth_windows(np, bh: int, bw: int, n_win: int):
    """Serpentine snakes (the propagation worst case: one component whose
    label must walk the whole snake) interleaved with dense random blobs."""
    rng = np.random.default_rng(0)
    syn = np.zeros((n_win, bh, bw), np.uint8)
    for j in range(n_win):
        if j % 2 == 0:
            syn[j, ::2, :] = 1
            syn[j, 1::4, 0] = 1
            syn[j, 3::4, bw - 1] = 1
        else:
            syn[j] = (rng.random((bh, bw)) < 0.35).astype(np.uint8)
    return syn


def _text_windows(np, bh: int, bw: int, n_win: int):
    """Realistic-density candidate sets: kana-like glyph strokes at text
    scale, pasted at the window's natural orientation (vertical columns for
    tall buckets, rows for wide ones).  This is what thresholded color-model
    masks of real text windows look like — the serpentine worst case is
    unrepresentative for TIMING (its fixpoint converges in wildly different
    round counts than glyph components; the r4f 640x256 synth gate timed
    base at 0.03 ms, junk), so default-flip decisions use these."""
    import random

    from comic_text_detector_tpu.data.render import (
        ORIENTATION_HOR,
        ORIENTATION_VER,
        draw_kana_block,
    )

    rng = random.Random(0)
    out = np.zeros((n_win, bh, bw), np.uint8)
    vertical = bh >= bw
    orient = ORIENTATION_VER if vertical else ORIENTATION_HOR
    for j in range(n_win):
        s = rng.randint(16, 30)
        pitch = s + max(2, s // 6)
        chars_per_line = max(2, (bh if vertical else bw) // pitch - 1)
        n_lines = max(2, (bw if vertical else bh) // pitch - 1)
        counts = [rng.randint(max(1, chars_per_line - 3), chars_per_line)
                  for _ in range(n_lines)]
        _img, m, _p = draw_kana_block(counts, s, rng, orientation=orient)
        if m is None:
            continue
        m = (np.asarray(m) > 127).astype(np.uint8)
        mh, mw = min(m.shape[0], bh), min(m.shape[1], bw)
        y0 = rng.randint(0, bh - mh)
        x0 = rng.randint(0, bw - mw)
        out[j, y0:y0 + mh, x0:x0 + mw] = m[:mh, :mw]
    return out


def main() -> int:
    os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("CTD_COMPILE_CACHE", osp.join(ROOT, ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from comic_text_detector_tpu.ops import refine as R
    from comic_text_detector_tpu.ops.pallas_kernels import (
        cc_ids_windows_local,
        cc_windows_local,
    )
    from comic_text_detector_tpu.ops.resize import letterbox_shape
    from comic_text_detector_tpu.pipeline import TextDetector
    from comic_text_detector_tpu.pipeline.detector import _upsample_mask, upload_page
    from comic_text_detector_tpu.utils.imgproc import expand_textwindow
    from comic_text_detector_tpu.utils.io import imread

    def amortize(fn, n=10):
        jax.block_until_ready(fn())  # compile/warm
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / n

    case_mode = os.environ.get("CTD_AB_CASES", "all")
    if case_mode in ("synth", "text"):
        only = os.environ.get("CTD_AB_BUCKETS", "")  # e.g. "640x256,512x512"
        want = {tuple(map(int, s.split("x"))) for s in only.split(",") if s}
        unmatched = want - {(bh, bw) for bh, bw, _, _ in R.BUCKETS}
        if unmatched:  # a typo'd filter must not produce a silent all-pass
            print(f"CTD_AB_BUCKETS entries match no bucket: {sorted(unmatched)}")
            print(f"known buckets: {[(bh, bw) for bh, bw, _, _ in R.BUCKETS]}")
            return 2
        make = _text_windows if case_mode == "text" else _synth_windows
        cases = []
        for bh, bw, slots, _cap in R.BUCKETS:
            if want and (bh, bw) not in want:
                continue
            syn_dev = jnp.asarray(make(np, bh, bw, 4 * slots))
            jax.block_until_ready(syn_dev)
            cases.append((f"bucket {bh}x{bw} ({4 * slots} win, {case_mode})", syn_dev, cc_ids_windows_local))
        if not cases:
            print(f"no {case_mode} cases built — empty bucket selection")
            return 2
        return run_cases(cases, VARIANTS, amortize, np)

    ckpt = sys.argv[1] if len(sys.argv) > 1 else osp.join(ROOT, "data", "flagship_r4.npz")
    det = TextDetector(
        model_path=ckpt, input_size=1024, half=True,
        refine_backend="device", mask_transfer="packed",
    )
    img = imread(EXAMPLE)
    mask, refined, blk_list = det(img)
    print(f"ckpt {osp.basename(ckpt)}: {len(blk_list)} blocks")

    im_h, im_w = img.shape[:2]
    size = det.input_size[0]
    _, _, dw, dh, _ = letterbox_shape(im_h, im_w, size)
    img_dev = jnp.asarray(img)
    lb_u8 = det._lb(im_h, im_w)(img_dev)
    out = det._infer(im_h, im_w)(det.variables, lb_u8)
    mask_dev = _upsample_mask(out[6], size - dh, size - dw, (im_h, im_w))

    windows = np.asarray(
        [expand_textwindow(img.shape, blk.xyxy, expand_r=16) for blk in blk_list]
    ).reshape(-1, 4)

    failures = 0

    # --- per-bucket real candidate sets ---
    groups: dict[int, list[int]] = {}
    for j, (x1, y1, x2, y2) in enumerate(windows):
        groups.setdefault(R._bucket_index(int(x2 - x1), int(y2 - y1)), []).append(j)
    cases = []
    for bi, idxs in sorted(groups.items()):
        bh, bw, slots, cap = R.BUCKETS[bi if bi >= 0 else -1]
        sel = idxs[:slots]
        bb = np.zeros((slots, 4), np.int32)
        bb[:, 2:] = 1
        bb[: len(sel)] = windows[sel]
        vv = np.zeros((slots,), bool)
        vv[: len(sel)] = True
        win_img, win_msk, in_window = jax.jit(
            R.extract_windows, static_argnums=(4,)
        )(img_dev[None], mask_dev[None], jnp.asarray(bb), jnp.zeros((slots,), jnp.int32), (bh, bw))
        cands, _ = jax.jit(R._candidates)(win_img, win_msk, in_window)
        fgs = jax.jit(
            lambda c, s1=slots, h=bh, w=bw: R._drop_tiny_components(
                (c > 0).reshape(4 * s1, h, w)
            )
        )(cands)
        fgs_u8 = fgs.astype(jnp.uint8)
        jax.block_until_ready(fgs_u8)
        cases.append((f"bucket {bh}x{bw} ({4 * slots} win)", fgs_u8, cc_ids_windows_local))

    # --- synthetic fills for bucket shapes this page has no windows in ---
    # (a default flip must cover EVERY production shape)
    covered = {R.BUCKETS[bi if bi >= 0 else -1][:2] for bi in groups}
    for bh, bw, slots, _cap in R.BUCKETS:
        if (bh, bw) in covered:
            continue
        syn_dev = jnp.asarray(_synth_windows(np, bh, bw, 4 * slots))
        jax.block_until_ready(syn_dev)
        cases.append((f"bucket {bh}x{bw} ({4 * slots} win, synth)", syn_dev, cc_ids_windows_local))

    # --- whole-canvas labels shape (the 1024 DB-decode labeling) ---
    x = lb_u8.astype(jnp.float32) / 255.0
    _, _, lines = jax.jit(det._apply)(det.variables, x[None])
    prob = lines[0, :, :, 0].astype(jnp.float32)
    bitmap = (prob > det.db_thresh).astype(jnp.uint8)[None]
    jax.block_until_ready(bitmap)
    print(f"whole-canvas fg frac {float(jnp.mean(bitmap)):.4f}")
    cases.append(("canvas 1024x1024 labels", bitmap, cc_windows_local))

    return run_cases(cases, VARIANTS, amortize, np, failures)


def run_cases(cases, variants, amortize, np, failures=0):
    for label, data, kernel in cases:
        ref = None
        row = []
        for v in variants:
            try:
                dt = amortize(lambda k=kernel, d=data, vv=v: k(d, None, vv))
            except Exception as e:  # compile failure (e.g. scoped-VMEM blowout)
                print(f"{label:28s} {v:10s} COMPILE FAIL: {str(e)[:120]}", flush=True)
                failures += 1
                continue
            outv = np.asarray(kernel(data, None, v))
            if ref is None:
                ref = outv
                eq = True
            else:
                eq = np.array_equal(ref, outv)
                if not eq:
                    failures += 1
            row.append(f"{v}={dt * 1e3:6.2f}ms{'' if eq else ' MISMATCH'}")
        print(f"{label:28s} " + "  ".join(row), flush=True)

    if failures:
        print(f"FAILURES: {failures}")
        return 1
    print("all variants bit-equal on hardware")
    return 0


if __name__ == "__main__":
    sys.exit(main())
