"""Per-stage timing of the device refine dispatch + hardware CC check.

Reconstructs the exact windows/candidates of the real example page (same
path as TextDetector._refine_on_device), then times each internal stage of
refine_windows separately, and asserts — ON HARDWARE — that the production
Pallas in-VMEM CC kernel (cc_windows_local) agrees with the independent
grid-stacked XLA/sweep formulation on the real candidate set (a Mosaic
miscompile fails here, not silently in the bench).

Run on the real TPU:  python scripts/profile_refine.py
"""

from __future__ import annotations

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
    import jax.numpy as jnp

    cache_dir = os.environ.get("CTD_COMPILE_CACHE", osp.join(ROOT, ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from comic_text_detector_tpu.pipeline import TextDetector
    from comic_text_detector_tpu.pipeline.detector import _upsample_mask
    from comic_text_detector_tpu.ops import refine as R
    from comic_text_detector_tpu.ops.resize import letterbox_shape
    from comic_text_detector_tpu.utils.imgproc import expand_textwindow
    from comic_text_detector_tpu.utils.io import imread

    det = TextDetector(
        model_path=os.environ.get("CTD_PROFILE_CKPT", osp.join(ROOT, "data", "flagship_r4.npz")), input_size=1024, half=True,
        refine_backend="device", mask_transfer="packed",
    )
    img = imread("/root/reference/data/examples/AisazuNihaIrarenai-003.jpg")
    mask, refined, blk_list = det(img)
    print(f"blocks: {len(blk_list)}")

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
    # first SLOTS windows = the first (typical) dispatch
    chunk = windows[: R.SLOTS]
    boxes = np.zeros((R.SLOTS, 4), np.int32)
    boxes[:, 2:] = 1
    boxes[: len(chunk)] = chunk
    valid = np.zeros((R.SLOTS,), bool)
    valid[: len(chunk)] = True
    boxes_d, valid_d = jnp.asarray(boxes), jnp.asarray(valid)

    def t(label, fn, n=10):
        fn()  # compile/warm
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{label:42s} {dt*1e3:8.2f} ms")
        return out

    # --- stage timings (each stage jitted standalone) ---
    extract = jax.jit(R.extract_windows)
    win_img, win_msk, in_window = t(
        "extract_windows", lambda: extract(img_dev, mask_dev, boxes_d)
    )
    candidates = jax.jit(R._candidates)
    cands, xors = t("candidates (hist+otsu+bands)", lambda: candidates(win_img, win_msk, in_window))

    fg_all = jax.jit(lambda c: R._drop_tiny_components((c > 0).reshape(4 * R.SLOTS, R.S, R.S)))
    fgs = t("drop_tiny_components (32 windows)", lambda: fg_all(cands))

    ids_local_fn = jax.jit(lambda f: R._component_ids(f, backend="local"))
    ids = t("CC+ids fused Pallas (32 windows)", lambda: ids_local_fn(fgs))
    ids_grid_fn = jax.jit(lambda f: R._component_ids(f, backend="grid"))
    ids_grid = t("CC+ids grid oracle (32 windows)", lambda: ids_grid_fn(fgs))
    # labels-only kernel (no in-VMEM rank phase): its delta vs the fused
    # kernel is the budget an XLA-side rank lookup would have to beat
    from comic_text_detector_tpu.ops.pallas_kernels import cc_windows_local

    labels_fn = jax.jit(lambda f: cc_windows_local(f.astype(jnp.uint8)))
    t("CC labels-only Pallas (32 windows)", lambda: labels_fn(fgs))

    pred = jnp.zeros((R.SLOTS, R.S, R.S), bool) | (win_msk > 60)
    merge = jax.jit(
        lambda m, f, i, p: R._merge_labeled(m, f, i, p)
    )
    merged0 = jnp.zeros((R.SLOTS, R.S, R.S), bool)
    f0 = fgs.reshape(4, R.SLOTS, R.S, R.S)[0]
    i0 = ids.reshape(4, R.SLOTS, R.S, R.S)[0]
    t("merge_labeled (1 of 4)", lambda: merge(merged0, f0, i0, pred))
    # A/B the component-sum einsum operand dtype (bf16 default vs s8xs8->s32)
    signed_q = jnp.where(f0, jnp.where(pred, 1.0, -1.0), 0.0)[None]
    for dt in ("bfloat16", "int8"):
        sums_dt = jax.jit(lambda i, q, d=dt: R._component_sums(i, q, matmul=True, dtype=d))
        t(f"component_sums signed ({dt})", lambda: sums_dt(i0, signed_q))
    take = jax.jit(lambda i, a: R._take_accept(i, a))
    acc_probe = jnp.asarray(np.random.default_rng(0).random((R.SLOTS, R.CAP)) < 0.5)
    t("take_accept (factored)", lambda: take(i0, acc_probe))

    holes = jax.jit(lambda m, p, w: R._fill_holes(m, p, w))
    t("fill_holes", lambda: holes(f0, pred, in_window))

    paste = jax.jit(lambda m: R.paste_windows(m, boxes_d, valid_d, mask_dev.shape))
    t("paste_windows", lambda: paste(f0.astype(jnp.uint8) * 255))

    full = lambda: R.refine_windows(img_dev, mask_dev, boxes_d, valid_d, 1)
    t("FULL refine_windows dispatch", full, n=10)

    # --- per-bucket dispatch timings on the real page's window set ---
    groups: dict[int, list[int]] = {}
    for j, (x1, y1, x2, y2) in enumerate(windows):
        groups.setdefault(R._bucket_index(int(x2 - x1), int(y2 - y1)), []).append(j)
    for bi, idxs in sorted(groups.items()):
        exact = bi >= 0
        bh, bw, slots, cap = R.BUCKETS[bi if exact else -1]
        n_disp = (len(idxs) + slots - 1) // slots
        sel = idxs[:slots]
        bb = np.zeros((slots, 4), np.int32)
        bb[:, 2:] = 1
        bb[: len(sel)] = windows[sel]
        vv = np.zeros((slots,), bool)
        vv[: len(sel)] = True
        pp = np.zeros((slots,), np.int32)
        bb_d, vv_d, pp_d = jnp.asarray(bb), jnp.asarray(vv), jnp.asarray(pp)

        def one_dispatch():
            return R._refine_windows_jit(
                img_dev[None], mask_dev[None], bb_d, vv_d, pp_d,
                jnp.int32(1), (bh, bw), cap, exact,
            )
        t(f"bucket {bh}x{bw} ({len(idxs)} win, {n_disp} disp)", one_dispatch)

    def whole_page():
        return R.refine_page(img_dev, mask_dev, windows, 1)
    t("refine_page (all buckets, whole page)", whole_page, n=10)

    # --- ON-HARDWARE equality: Pallas fused CC+ids vs the independent grid
    # sweeps + cumsum/gather compaction, on the real candidate set ---
    a = np.asarray(ids)
    b = np.asarray(ids_grid)
    if np.array_equal(a, b):
        print("CC+ids equality (Pallas fused vs grid oracle on real candidates): OK")
    else:
        bad = np.argwhere(a != b)
        print(f"CC+ids MISMATCH at {len(bad)} pixels; first: {bad[:5]}")
        sys.exit(1)


if __name__ == "__main__":
    main()
