"""Device-side mask refinement (the reference's refine_mask on TPU).

The reference refits a color model per text block on the host
(utils/textmask.py:159-169): grey-histogram band + per-channel Otsu
candidate masks, then a greedy merge of candidate connected components that
reduce the byte-XOR distance to the predicted mask, then hole filling.  On a
1-vCPU host that loop dominates page latency.  This module is the TPU-native
re-design: all K block windows are processed in one batched dispatch at the
ORIGINAL page resolution (the page upload already feeds the device
letterbox; the raw mask upsamples on device — see
pipeline/detector.py::_refine_on_device), with the irregular parts recast
as MXU/VPU work:

* window extraction / paste-back — gather-based separable bilinear
  (each output pixel reads its 2x2 taps; O(pixels), not O(pixels*S)),
* histograms — fixed 256-level integer counts via fused compare+reduce,
  then rebinned to np.histogram's 255 data-range bins with 256-length math,
* connected components — all K windows stacked into one label map (8-row
  background gaps) through the Pallas CC sweeps,
* per-component statistics — one batched scatter-add per candidate,
* the "greedy" merge — provably order-independent within one candidate
  (components are disjoint, and a component's accept test only reads
  already-merged state at its own pixels), so each candidate's components
  are accepted in parallel; candidates stay sequential in XOR-score order
  exactly like the reference.

Windows dispatch through SHAPE BUCKETS (BUCKETS below): each window goes to
the smallest fixed kernel shape that fits it — (256, 256), wide (256, 640),
tall (640, 256), or (512, 512) — and is extracted 1:1, making the whole
per-window pipeline bit-exact against the host merge.  Resampling is
catastrophic here (candidate thresholds and component topology are
discrete: a 10% downscale flipped whole components, window IoU vs host as
low as 0.40 measured), so only windows exceeding the largest bucket — rare
at real page sizes — fall back to bilinear resampling into (512, 512).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp

from comic_text_detector_tpu.constants import REFINEMASK_INPAINT

S = 256  # default window side (the smallest bucket; kept for tests/back-compat)
GAP = 8  # background rows between stacked windows (breaks 8-connectivity)
CAP = 2048  # default per-window component capacity for segment reductions
_BIG = 2**30  # python int: module-level jnp arrays become committed captured constants

# (win_h, win_w, slots_per_dispatch, component_capacity) — smallest first.
# Slots shrink with window area so each dispatch stays a similar
# device-time quantum; capacity grows with area so noisy candidates don't
# overflow the component tables.  Every bucket runs the fused Pallas CC
# kernel — its ~25-copy scoped-VMEM footprint (21 MB at 512x512) compiles
# under a raised Mosaic vmem_limit_bytes (pallas_kernels._WINDOW_VMEM_LIMIT).
BUCKETS = (
    # caps audit-sized in r5 (data/audit_component_caps_r5.log: worst real
    # counts 128/183/324/1567/-/483, >=5x headroom kept) and flipped after
    # the on-hardware bit-equality + timing A/B (scripts/cap_ab.py,
    # data/cap_ab_r5.log: every bucket bit-equal, mid buckets -8..-19%,
    # whole-page refine -6% example / -27% busy renderer page)
    (256, 256, 8, 1024),
    (256, 512, 6, 2048),  # wide-mid (real pages: most "wide" blocks are <512 wide)
    (512, 256, 6, 2048),  # tall-mid (most vertical ja columns are <512 tall)
    (256, 640, 4, 8192),  # wide blocks (worst audited count 1567: cap stays)
    (640, 256, 4, 8192),  # tall blocks (never audited: cap stays)
    (512, 512, 3, 4096),  # big blocks; doubles as the resample fallback
)

# Sweep knob: scale every bucket's slots-per-dispatch (fewer, fatter
# dispatches).  Per-window device compute is invariant (the CC kernel grids
# over windows), so this only trades per-dispatch overhead against pad-slot
# waste — measured by scripts/bench_sweep.py before any default changes.
# Safe for the grid-CC fallback too: _stacked_cc stacks columns k=min(n,
# SLOTS) tall with the UNSCALED module constant, so the mult widens the grid
# canvas (more columns) without growing the validated 2112-row height, and
# ops/cc.py's shape guards route any oversized canvas to the XLA sweeps.
try:
    _slots_mult = max(1, int(os.environ.get("CTD_REFINE_SLOTS_MULT", "1")))
except ValueError:
    _slots_mult = 1
if _slots_mult > 1:
    BUCKETS = tuple((h, w, s * _slots_mult, c) for h, w, s, c in BUCKETS)

# Capacity knob: the component caps bound which window components can ever
# be accepted (ranks >= cap are conservatively never merged), and the
# accept-path cost — the factored one-hot component sums and take_accept
# tables — scales linearly with cap.  The round-5 audit
# (scripts/audit_component_caps.py, data/audit_component_caps_r5.log)
# measured worst-case real component counts 5-45x under the shipping caps.
# CTD_REFINE_CAPS overrides them for hardware A/Bs without a code edit:
# either the named preset 'audit' (reduced caps sized >=5x the audited
# worst case, multiples of the 64-wide factored one-hot radix) or a comma
# list matched to BUCKETS order.  Malformed values raise — a typo must not
# silently benchmark the wrong configuration.
_CAP_PRESETS = {
    # (256x256, 256x512, 512x256, 256x640, 640x256, 512x512)
    # 'audit' = the r5-audited reduced set (the shipping default since the
    # r5 hardware gate); 'r4' = the pre-audit capacities, kept for rollback
    # A/Bs.
    "audit": (1024, 2048, 2048, 8192, 8192, 4096),
    "r4": (2048, 8192, 8192, 8192, 8192, 8192),
}
def _parse_caps(spec: str, n: int):
    """Parse a CTD_REFINE_CAPS value: preset name or comma list of n caps,
    each a positive multiple of the 64-wide one-hot radix.  Raises on
    anything else."""
    caps = _CAP_PRESETS.get(spec)
    if caps is None:
        try:
            caps = tuple(int(v) for v in spec.split(","))
        except ValueError:
            caps = ()
    if len(caps) != n or any(c <= 0 or c % 64 for c in caps):
        raise ValueError(
            f"CTD_REFINE_CAPS={spec!r}: need {n} positive multiples of 64 "
            f"(or a preset in {sorted(_CAP_PRESETS)})"
        )
    return caps


_caps_env = os.environ.get("CTD_REFINE_CAPS", "")
if _caps_env:
    _caps = _parse_caps(_caps_env, len(BUCKETS))
    BUCKETS = tuple((h, w, s, c) for (h, w, s, _), c in zip(BUCKETS, _caps))


# ---------------------------------------------------------------------------
# Window extraction / paste-back (gather-based separable bilinear)
# ---------------------------------------------------------------------------


def _ext_hi(b, win_hw):
    """Effective source extents: windows no larger than win_hw are extracted
    1:1 (exact pixel copies, padded with a validity mask) so the whole
    per-window pipeline is bit-exact against the host path; only windows
    larger than the bucket get resampled."""
    sh, sw = win_hw
    x_hi = jnp.maximum(b[2], b[0] + sw)
    y_hi = jnp.maximum(b[3], b[1] + sh)
    return x_hi, y_hi


def _sample_coords(lo, hi, n_src: int, n_dst: int):
    """2-tap bilinear sampling grid for [lo, hi) -> n_dst samples (cv2
    INTER_LINEAR grid convention): (i0, i1, frac) each (n_dst,)."""
    span = (hi - lo).astype(jnp.float32)
    d = jnp.arange(n_dst, dtype=jnp.float32)
    src = lo + (d + 0.5) * span / n_dst - 0.5
    src = jnp.clip(src, lo, hi - 1.0)
    i0f = jnp.floor(src)
    frac = src - i0f
    i0 = jnp.clip(i0f, 0, n_src - 1).astype(jnp.int32)
    i1 = jnp.clip(i0f + 1.0, 0, n_src - 1).astype(jnp.int32)
    # i0+1 can equal hi after the hi-1 clamp; its weight is 0 there
    frac = jnp.where(i1.astype(jnp.float32) <= i0f, 0.0, frac)
    return i0, i1, frac


def extract_windows(
    img: jax.Array,
    mask: jax.Array,
    boxes: jax.Array,
    page_ids: jax.Array | None = None,
    win_hw: Tuple[int, int] = (S, S),
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Extract K boxes of (img, mask) into fixed (K, sh, sw[, 3]) uint8 windows.

    img (H, W, 3) or (P, H, W, 3) uint8 BGR, mask (H, W) / (P, H, W) uint8,
    boxes (K, 4) int32 xyxy, page_ids (K,) int32 into the page stack (None =
    single page).  Returns (window imgs, window masks, in_window validity
    (K, S, S) bool); pixels outside the true box are zeroed.

    Sampling is gather-based separable bilinear (each output pixel reads its
    2x2 source taps) — O(K*S*S) work.  The earlier interpolation-matrix
    einsum formulation was O(K*S*H*W) (~10 TFLOP per dispatch on a real
    page), which made refinement the pipeline bottleneck.  Stacked pages
    simply flatten to P*H gatherable rows, so windows from a whole batch of
    same-shaped pages share one dispatch (no per-page padding waste).
    """
    sh, sw = win_hw
    if mask.ndim == 2:
        img, mask = img[None], mask[None]
    p, h, w = mask.shape
    if page_ids is None:
        page_ids = jnp.zeros((boxes.shape[0],), jnp.int32)
    planes = jnp.concatenate([img, mask[..., None]], axis=-1).astype(jnp.float32)
    planes = planes.reshape(p * h, w, 4)  # page stack -> flat gatherable rows

    def coords(b):
        x_hi, y_hi = _ext_hi(b, win_hw)
        y0, y1, fy = _sample_coords(b[1], y_hi, h, sh)
        x0, x1, fx = _sample_coords(b[0], x_hi, w, sw)
        dy = jnp.arange(sh, dtype=jnp.int32)
        dx = jnp.arange(sw, dtype=jnp.int32)
        vy = (b[1] + dy < b[3]) | (b[3] - b[1] > sh)
        vx = (b[0] + dx < b[2]) | (b[2] - b[0] > sw)
        return y0, y1, fy, x0, x1, fx, vy[:, None] & vx[None, :]

    y0, y1, fy, x0, x1, fx, in_window = jax.vmap(coords)(boxes)  # (K,S) each
    off = (page_ids * h)[:, None]  # row offset of each window's page
    rows0 = planes[(off + y0).reshape(-1)].reshape(y0.shape + planes.shape[1:])  # (K,S,W,4)
    rows1 = planes[(off + y1).reshape(-1)].reshape(y1.shape + planes.shape[1:])
    rows = rows0 * (1.0 - fy)[..., None, None] + rows1 * fy[..., None, None]
    cols0 = jnp.take_along_axis(rows, x0[:, None, :, None], axis=2)  # (K,S,S,4)
    cols1 = jnp.take_along_axis(rows, x1[:, None, :, None], axis=2)
    out = cols0 * (1.0 - fx)[:, None, :, None] + cols1 * fx[:, None, :, None]
    out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    out = jnp.where(in_window[..., None], out, 0)
    return out[..., :3], out[..., 3], in_window


def paste_windows(
    merged: jax.Array,
    boxes: jax.Array,
    valid: jax.Array,
    out_hw,
    page_ids: jax.Array | None = None,
    n_pages: int = 1,
    win_hw: Tuple[int, int] | None = None,
) -> jax.Array:
    """OR the (K, sh, sw) uint8 0/255 window masks back onto (H, W) canvases,
    resampling windows larger than their bucket back to box size.

    Returns (H, W) when ``page_ids`` is None, else (n_pages, H, W) with each
    window routed to its page's canvas.

    Gather formulation: every canvas pixel samples its window-coordinate
    2x2 taps from the (K, sh, sw) merged masks (O(K*H*W) elementwise work).
    This is the RESAMPLE-capable paste; exact-bucket dispatches use the
    O(K*sh*sw) :func:`paste_windows_exact` instead."""
    h, w = out_hw
    sh, sw = win_hw or merged.shape[-2:]
    m = merged.astype(jnp.float32)

    def one(mk, b):
        x_hi, y_hi = _ext_hi(b, (sh, sw))
        span_y = jnp.maximum((y_hi - b[1]).astype(jnp.float32), 1.0)
        span_x = jnp.maximum((x_hi - b[0]).astype(jnp.float32), 1.0)
        yy = (jnp.arange(h, dtype=jnp.float32) - b[1] + 0.5) * sh / span_y - 0.5
        xx = (jnp.arange(w, dtype=jnp.float32) - b[0] + 0.5) * sw / span_x - 0.5
        yy = jnp.clip(yy, 0.0, sh - 1.0)
        xx = jnp.clip(xx, 0.0, sw - 1.0)
        y0 = jnp.floor(yy)
        x0 = jnp.floor(xx)
        fy = yy - y0
        fx = xx - x0
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)
        y1i = jnp.minimum(y0i + 1, sh - 1)
        x1i = jnp.minimum(x0i + 1, sw - 1)
        top = mk[y0i][:, x0i] * (1 - fx)[None, :] + mk[y0i][:, x1i] * fx[None, :]
        bot = mk[y1i][:, x0i] * (1 - fx)[None, :] + mk[y1i][:, x1i] * fx[None, :]
        v = top * (1 - fy)[:, None] + bot * fy[:, None]
        iy = (jnp.arange(h) >= b[1]) & (jnp.arange(h) < b[3])
        ix = (jnp.arange(w) >= b[0]) & (jnp.arange(w) < b[2])
        return (v > 127.0) & iy[:, None] & ix[None, :]

    on = jax.vmap(one)(m, boxes) & valid[:, None, None]
    if page_ids is None:
        return jnp.where(jnp.any(on, axis=0), jnp.uint8(255), jnp.uint8(0))
    per_page = jax.vmap(
        lambda pg: jnp.any(on & (page_ids == pg)[:, None, None], axis=0)
    )(jnp.arange(n_pages, dtype=jnp.int32))
    return jnp.where(per_page, jnp.uint8(255), jnp.uint8(0))


def paste_windows_exact(
    merged: jax.Array,
    boxes: jax.Array,
    valid: jax.Array,
    out_hw,
    page_ids: jax.Array,
    n_pages: int,
) -> jax.Array:
    """OR 1:1-extracted window masks onto per-page canvases at their box
    positions: one dynamic_slice + dynamic_update_slice per window —
    O(K*sh*sw) instead of the resampling paste's O(K*H*W) (34x less work
    for a 256px window on a full page).  Valid only for exact buckets
    (windows never larger than (sh, sw)); ``merged`` is already zero outside
    each window's true box (the in_window masking), so the read-OR-write
    cannot disturb canvas pixels outside the box.  The canvas is padded by
    the window size so edge boxes never trigger dynamic_slice's start
    clamping."""
    h, w = out_hw
    k, sh, sw = merged.shape
    m = jnp.where(valid[:, None, None], merged, 0)
    canvas = jnp.zeros((n_pages, h + sh, w + sw), jnp.uint8)

    def body(i, cv):
        start = (page_ids[i], boxes[i, 1], boxes[i, 0])
        cur = jax.lax.dynamic_slice(cv, start, (1, sh, sw))
        return jax.lax.dynamic_update_slice(cv, jnp.bitwise_or(cur, m[i][None]), start)

    canvas = jax.lax.fori_loop(0, k, body, canvas)
    return canvas[:, :h, :w]


# ---------------------------------------------------------------------------
# Histograms / thresholds (integer levels, no scatters)
# ---------------------------------------------------------------------------


def _hist256(plane: jax.Array, weight: jax.Array) -> jax.Array:
    """(K, N) uint8 values + (K, N) weights -> (K, 256) float32 counts.

    Fixed integer levels make this a fused compare+reduce (no scatter — TPU
    scatters serialize); XLA folds the one-hot compare into the reduction."""
    levels = jnp.arange(256, dtype=jnp.uint8)
    return jnp.sum(
        (plane[:, :, None] == levels[None, None, :]) * weight[:, :, None].astype(jnp.float32),
        axis=1,
    )


def bgr2gray_u8(img: jax.Array) -> jax.Array:
    """cv2 BGR->GRAY (rounded uint8)."""
    g = (
        img[..., 0].astype(jnp.float32) * 0.114
        + img[..., 1].astype(jnp.float32) * 0.587
        + img[..., 2].astype(jnp.float32) * 0.299
    )
    return jnp.clip(jnp.round(g), 0, 255).astype(jnp.uint8)


def _otsu_from_hist(hist: jax.Array) -> jax.Array:
    """(K, 256) counts -> (K,) Otsu thresholds (maximize inter-class var)."""
    total = jnp.sum(hist, axis=1, keepdims=True)
    idx = jnp.arange(256, dtype=jnp.float32)
    w0 = jnp.cumsum(hist, axis=1)
    w1 = total - w0
    s0 = jnp.cumsum(hist * idx, axis=1)
    mu = s0[:, -1:]
    m0 = jnp.where(w0 > 0, s0 / jnp.maximum(w0, 1), 0.0)
    m1 = jnp.where(w1 > 0, (mu - s0) / jnp.maximum(w1, 1), 0.0)
    between = w0 * w1 * jnp.square(m0 - m1)
    return jnp.argmax(between, axis=1)


_XOR_INVALID = 2**30  # sentinel above any real score (max 255*S*S)


def _xor_sum(a: jax.Array, b: jax.Array) -> jax.Array:
    """Byte-XOR objective over trailing 2 axes (reference textmask.py:36)."""
    return jnp.sum(jnp.bitwise_xor(a, b).astype(jnp.int32), axis=(-2, -1))


def _pick_polarity(
    threshed: jax.Array, mask: jax.Array, in_window: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """minxor_thresh: keep the polarity closer to the predicted mask.
    Pixels outside the true window are excluded from the objective and from
    the returned mask (the host operates on the exact crop)."""
    threshed = jnp.where(in_window, threshed, 0)
    neg = jnp.where(in_window, 255 - threshed, 0)
    x_pos = _xor_sum(threshed, mask)
    x_neg = _xor_sum(neg, mask)
    take_neg = x_neg < x_pos
    out = jnp.where(take_neg[:, None, None], neg, threshed)
    return out, jnp.minimum(x_pos, x_neg)


def _topk_colors(counts255: jax.Array, edges_lo: jax.Array, edges_step: jax.Array):
    """Reference get_topk_color (textmask.py:16-27) vectorized over windows.

    counts255 (K, 255); returns (K, 3) band-center colors + (K,) counts of
    valid colors.  Ties in the descending count sort may order differently
    than np.argsort's quicksort — accepted (affects only equal-count bins).
    """
    k = counts255.shape[0]
    order = jnp.argsort(-counts255, axis=1)  # stable desc
    sorted_counts = jnp.take_along_axis(counts255, order, axis=1)
    colors = edges_lo[:, None] + order.astype(jnp.float32) * edges_step[:, None]
    tol = jnp.sum(counts255, axis=1) * 0.001

    sel0 = colors[:, 0]
    init = (
        jnp.stack([sel0, jnp.full_like(sel0, 1e9), jnp.full_like(sel0, 1e9)], axis=1),
        jnp.ones((k,), jnp.int32),
        jnp.zeros((k,), bool),
    )

    def body(i, state):
        sel, n, stopped = state
        c = colors[:, i]
        cnt = sorted_counts[:, i]
        dist = jnp.min(jnp.abs(sel - c[:, None]), axis=1)
        can_add = (~stopped) & (dist > 10.0)
        new_sel = jnp.where(
            can_add[:, None] & (jnp.arange(3)[None, :] == n[:, None]), c[:, None], sel
        )
        new_n = jnp.where(can_add, n + 1, n)
        # reference breaks AFTER the append when k colors reached or the
        # current bin falls under tolerance
        new_stopped = stopped | (new_n >= 3) | (cnt < tol)
        return new_sel, new_n, new_stopped

    sel, n, _ = jax.lax.fori_loop(1, 255, body, init)
    return sel, n


# ---------------------------------------------------------------------------
# Stacked-window connected components + segment reductions
# ---------------------------------------------------------------------------

ROWS = S + GAP  # stacked rows per window
GAPC = 128  # column gap between stacked-grid columns (Mosaic 128-lane unit)


def _stacked_cc(cands: jax.Array, backend: str | None = None) -> jax.Array:
    """CC-label N windows in a single pass over a 2-D grid layout.

    cands (N, S, S) bool -> (N, S, S) int32 window-local root indices
    (row * S + col of the component min pixel), _BIG on background.

    ``backend``: 'local' = per-window in-VMEM Pallas fixpoint kernel (the
    TPU default), 'grid' = all windows stacked onto one canvas through the
    global CC sweeps (the off-TPU default; also the independent oracle the
    hardware CC equality check in scripts/profile_refine.py compares
    against).

    In grid mode windows stack SLOTS-tall into ``g = ceil(N / SLOTS)`` grid
    columns separated by GAPC background columns (8-row gaps break vertical
    connectivity, the column gaps horizontal).  The grid keeps the column
    height at SLOTS*ROWS regardless of N, so one CC invocation can label
    e.g. all 4 candidate sets of a refine dispatch at once while the Pallas
    column sweeps stay inside the scoped-VMEM budget.
    """
    from comic_text_detector_tpu.ops.cc import connected_components

    n = cands.shape[0]
    if backend is None:
        backend = "local" if jax.default_backend() == "tpu" else "grid"
    if backend == "local":
        # per-window in-VMEM fixpoint kernel: rounds cost no HBM traffic and
        # each window stops at its own convergence (the global grid pass
        # paid ~70 full-canvas HBM rounds on serpentine candidates)
        from comic_text_detector_tpu.ops.pallas_kernels import cc_windows_local

        return cc_windows_local(cands.astype(jnp.uint8))
    sh, sw = cands.shape[1:]
    rows = sh + GAP
    k = min(n, SLOTS)
    g = (n + k - 1) // k
    pitch = sw + GAPC
    width = (g - 1) * pitch + sw
    pad_n = g * k - n
    grid = jnp.pad(cands, ((0, pad_n), (0, GAP), (0, 0)))  # (g*k, rows, sw)
    # (g, k*rows, sw) -> place column c at x offset c*pitch
    grid = grid.reshape(g, k * rows, sw).transpose(1, 0, 2)  # (k*rows, g, sw)
    grid = jnp.pad(grid, ((0, 0), (0, 0), (0, GAPC)))  # (k*rows, g, pitch)
    canvas = grid.reshape(k * rows, g * pitch)[:, :width]
    labels = connected_components(canvas, 8)  # 0 = background
    glob = labels.astype(jnp.int32) - 1  # global linear root index in canvas
    row_of = glob // width
    col_of = glob % width
    c_of = col_of // pitch
    local = (row_of % rows) * sw + (col_of - c_of * pitch)
    out = jnp.where(glob >= 0, local, _BIG)  # (k*rows, width)
    # slice each window back out: window i lives at column i//k, rows (i%k)*rows
    out = jnp.pad(out, ((0, 0), (0, g * pitch - width)), constant_values=_BIG)
    out = out.reshape(k, rows, g, pitch)[:, :sh, :, :sw]  # (k, sh, g, sw)
    out = out.transpose(2, 0, 1, 3).reshape(g * k, sh, sw)
    return out[:n]


def _component_ids(fg: jax.Array, backend: str | None = None) -> jax.Array:
    """fg (K, S, S) bool -> 1-based compact component ids (0 = background),
    raster-ordered by component root.

    On TPU the Pallas kernel computes the ids in-VMEM (labels + ranks +
    rank propagation, zero HBM gathers); elsewhere the grid CC + cumsum/
    gather compaction serves (CPU gathers are cheap, and it doubles as the
    independent oracle for the hardware equality check).

    All BUCKETS shapes run the fused kernel: it compiles with a raised
    Mosaic ``vmem_limit_bytes`` (the ~25-copy footprint measured 21 MB at
    512x512 — over Mosaic's default 16 MB scoped limit but far under the
    128 MB physical VMEM; see pallas_kernels._WINDOW_VMEM_LIMIT)."""
    if backend is None:
        fits_local = fg.shape[1] * fg.shape[2] <= 1024 * 1024
        backend = "local" if (jax.default_backend() == "tpu" and fits_local) else "grid"
    if backend == "local":
        from comic_text_detector_tpu.ops.pallas_kernels import cc_ids_windows_local

        return cc_ids_windows_local(fg.astype(jnp.uint8))
    return _compact_ids(_stacked_cc(fg, backend=backend), fg)


def _compact_ids(local_labels: jax.Array, fg: jax.Array) -> jax.Array:
    """Window-local root labels -> 1-based component ranks (0 = background).
    Scatter-free: a pixel is a root iff its label equals its own linear
    index; ranks come from a cumsum over the window."""
    k, sh, sw = local_labels.shape
    n = sh * sw
    flat = local_labels.reshape(k, n)
    lin = jnp.arange(n, dtype=jnp.int32)[None, :]
    is_root = (flat == lin) & fg.reshape(k, n)
    rank = jnp.cumsum(is_root.astype(jnp.int32), axis=1)  # inclusive
    ids = jnp.take_along_axis(rank, jnp.clip(flat, 0, n - 1), axis=1)
    ids = jnp.where(fg.reshape(k, n), ids, 0)
    return ids.reshape(k, sh, sw)


_LO = 64  # low-radix width of the factored one-hot bincount (lane-friendly)


def _component_sums(
    ids: jax.Array,
    quantities: jax.Array,
    matmul: bool | None = None,
    cap: int = CAP,
    dtype=None,
) -> jax.Array:
    """Per-component sums of small-integer quantities, scatter-free.

    ids (K, sh, sw) int32 component ranks (0 = background; ranks >= cap clip
    to 0, i.e. beyond-capacity components are never accepted — conservative
    for noise-heavy candidates); quantities (Q, K, sh, sw) float32 with
    values in {-1, 0, 1}.  Returns (Q, K, cap) float32 sums.

    TPU scatters serialize (~10 ms per 0.5M-row scatter — they were the fat
    half of the refine dispatch).  Instead the rank factors as
    ``id = hi*_LO + lo`` and the bincount becomes one batched MXU matmul
    between the two one-hot factors:  out[hi, lo] = sum_n q_n * [hi_n==hi] *
    [lo_n==lo].  The factored one-hots are (N, cap/_LO) + (N, _LO) instead
    of the (N, cap) full one-hot (32x less HBM traffic), and ±1/0 bf16
    operands with f32 accumulation keep integer counts < 2^24 exact (the
    signed form lets callers fold an on-vs-off pair of 0/1 quantities into
    ONE ``(2*pred - 1) * mask`` quantity — half the einsum volume for the
    accept tests, whose threshold is on - off > 0)."""
    q, k = quantities.shape[0], ids.shape[0]
    n = ids.shape[1] * ids.shape[2]
    flat = jnp.where(ids < cap, ids, 0).reshape(k, n)
    if matmul is None:
        matmul = jax.default_backend() == "tpu"
    if matmul:
        # bf16 operands ride the MXU natively; CPU XLA lacks bf16 dots, so
        # the (equally exact for ±1/0 values) f32 form serves tests there.
        # dtype='int8' is the half-the-bytes s8xs8->s32 variant (v5e native;
        # ±1/0 values are int8-exact) — A/B'd by scripts/profile_refine.py.
        if dtype is None:
            dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        else:
            dt = jnp.dtype(dtype)
        acc_t = jnp.int32 if dt == jnp.int8 else jnp.float32
        hi = flat // _LO
        lo = flat % _LO
        hi_n = cap // _LO
        # LAYOUT: both dot operands keep the contraction dim n minor-most,
        # so XLA lowers straight to a batched MXU matmul with fused one-hot
        # producers — the earlier (Q, K, N, HI) einsum forced a minor-dim
        # transpose of the 33 MB lhs before every dot (measured 2.94 ms per
        # 8-slot dispatch; this form cut the signed merge sum to sub-ms).
        oh_hi = hi[:, None, :] == jnp.arange(hi_n, dtype=jnp.int32)[None, :, None]
        qv = jnp.swapaxes(quantities.reshape(q, k, n), 0, 1).astype(dt)  # (K, Q, N)
        lhs = (qv[:, :, None, :] * oh_hi[:, None, :, :].astype(dt)).reshape(
            k, q * hi_n, n
        )
        oh_lo = lo[:, :, None] == jnp.arange(_LO, dtype=jnp.int32)[None, None, :]
        out = jax.lax.dot_general(
            lhs,
            oh_lo.astype(dt),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=acc_t,
        )  # (K, Q*HI, LO)
        return out.reshape(k, q, cap).transpose(1, 0, 2).astype(jnp.float32)
    # off-TPU (tests): one batched scatter-add, which CPU handles well
    gid = (jnp.arange(k, dtype=jnp.int32)[:, None] * cap + flat).reshape(-1)
    vals = quantities.reshape(q, -1).T  # (k*N, q)
    out = jnp.zeros((k * cap, q), jnp.float32).at[gid].add(vals)
    return out.reshape(k, cap, q).transpose(2, 0, 1)


def _take_accept(
    ids: jax.Array, accept: jax.Array, matmul: bool | None = None
) -> jax.Array:
    """(K, cap) per-component accept bits -> (K, sh, sw) pixel mask (bucket 0
    = background and beyond-capacity ranks are never accepted).

    On TPU the table lookup runs gather-free through the same ``id = hi*_LO
    + lo`` factorization as :func:`_component_sums`: contract the low-radix
    one-hot against the (HI, _LO)-shaped table on the MXU, then select the
    high radix with a fused compare+reduce (XLA per-element gathers measured
    ~12 ms/M on v5e; this is ~0.3 ms for a full dispatch)."""
    k = ids.shape[0]
    cap = accept.shape[1]
    n = ids.shape[1] * ids.shape[2]
    acc = accept.at[:, 0].set(False)
    flat = jnp.where(ids < cap, ids, 0).reshape(k, n)
    if matmul is None:
        matmul = jax.default_backend() == "tpu"
    if matmul:
        dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        hi = flat // _LO
        lo = flat % _LO
        table = acc.reshape(k, cap // _LO, _LO).astype(dt)  # (K, HI, LO)
        # both contraction dims (l) minor-most -> clean NT-form MXU matmul
        oh_lo = (lo[:, :, None] == jnp.arange(_LO, dtype=jnp.int32)[None, None, :]).astype(dt)
        picked = jax.lax.dot_general(
            oh_lo, table, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (K, N, HI) — 0/1 values
        oh_hi = hi[:, :, None] == jnp.arange(cap // _LO, dtype=jnp.int32)[None, None, :]
        out = jnp.sum(jnp.where(oh_hi, picked, 0.0), axis=2) > 0.5
        return out.reshape(ids.shape)
    return jnp.take_along_axis(acc, flat, axis=1).reshape(ids.shape)


def _count_neighbors(fg: jax.Array, offsets) -> jax.Array:
    p = jnp.pad(fg, ((0, 0), (1, 1), (1, 1)))
    acc = jnp.zeros(fg.shape, jnp.int32)
    for dy, dx in offsets:
        acc = acc + p[:, dy:dy + fg.shape[1], dx:dx + fg.shape[2]].astype(jnp.int32)
    return acc


def _drop_tiny_components(fg: jax.Array) -> jax.Array:
    """Remove exactly the components the reference's ``w*h < 3`` bbox test
    skips (textmask.py:100-101): singletons and straight 2-pixel pairs —
    diagonal pairs have a 2x2 bbox and stay.  A pure stencil, which also
    keeps noisy candidates inside the component-capacity budget."""
    n8 = _count_neighbors(fg, [(a, b) for a in range(3) for b in range(3) if (a, b) != (1, 1)])
    n4 = _count_neighbors(fg, [(0, 1), (2, 1), (1, 0), (1, 2)])
    # a straight pair: both ends have exactly one 8-neighbor, adjacent 4-wise
    p = jnp.pad((n8 == 1) & fg, ((0, 0), (1, 1), (1, 1)))
    partner_lone = jnp.zeros(fg.shape, bool)
    for dy, dx in ((0, 1), (2, 1), (1, 0), (1, 2)):
        partner_lone |= p[:, dy:dy + fg.shape[1], dx:dx + fg.shape[2]]
    singleton = n8 == 0
    straight_pair = (n8 == 1) & (n4 == 1) & partner_lone
    return fg & ~(singleton | straight_pair)


def _merge_labeled(
    merged: jax.Array, fg: jax.Array, ids: jax.Array, pred: jax.Array, cap: int = CAP
) -> jax.Array:
    """Absorb every component of a pre-labeled candidate whose un-merged
    pixels match the predicted mask more than they miss it (exactly the
    reference's xor_merged < xor_origin test, reference textmask.py:95-110;
    components are disjoint, so all decisions commute)."""
    new = fg & ~merged
    # one SIGNED quantity instead of an (on, off) pair: the accept test is
    # on > off, i.e. sum over the un-merged component pixels of +1 where the
    # prediction agrees / -1 where it misses — half the einsum volume of the
    # two-quantity form, identical decisions
    signed = jnp.where(new, jnp.where(pred, 1.0, -1.0), 0.0)
    sums = _component_sums(ids, signed[None], cap=cap)  # (1, K, cap)
    take = _take_accept(ids, sums[0] > 0)
    return merged | (fg & take)


def _merge_candidate(merged: jax.Array, cand: jax.Array, pred: jax.Array, cap: int = CAP) -> jax.Array:
    """CC + tiny-drop + :func:`_merge_labeled` for a single candidate set."""
    fg = _drop_tiny_components(cand)
    ids = _component_ids(fg)
    return _merge_labeled(merged, fg, ids, pred, cap=cap)


def _fill_holes(
    merged: jax.Array, pred: jax.Array, in_window: jax.Array, cap: int = CAP
) -> jax.Array:
    """Adopt small components of the inverse mask that reduce the XOR
    objective (reference textmask.py:113-131).  The area threshold is the
    second-largest area among {merged region, inverse components}; the
    padding dead zone rides whichever component touches the window edge, so
    its pixels are subtracted from that component's effective area and never
    adopted."""
    inv = ~merged
    ids = _component_ids(inv)
    # signed on-vs-off quantity (see _merge_labeled) + effective area in one
    # pass: area counts +1 per component pixel minus the padding dead zone,
    # i.e. +1 inside the window and 0 outside — which is just in_window
    signed = jnp.where(inv & in_window, jnp.where(pred, 1.0, -1.0), 0.0)
    area_eff = (inv & in_window).astype(jnp.float32)
    sums = _component_sums(ids, jnp.stack([signed, area_eff]), cap=cap)  # (2, K, cap)
    eff_area = sums[1]  # (K, CAP), dead-zone pixels removed
    merged_area = jnp.sum(merged & in_window, axis=(1, 2)).astype(jnp.float32)  # cv2 label 0
    all_areas = jnp.concatenate([merged_area[:, None], eff_area[:, 1:]], axis=1)
    thresh = jax.lax.top_k(all_areas, 2)[0][:, 1]  # second largest
    accept = (sums[0] > 0) & (eff_area < thresh[:, None])
    take = _take_accept(ids, accept)
    return merged | (inv & take & in_window)


# ---------------------------------------------------------------------------
# Morphology on window batches (3x3, zero border like cv2 on crops)
# ---------------------------------------------------------------------------


def _erode_rect3(x: jax.Array) -> jax.Array:
    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), constant_values=255)
    acc = x
    for dy in range(3):
        for dx in range(3):
            acc = jnp.minimum(acc, jax.lax.dynamic_slice_in_dim(
                jax.lax.dynamic_slice_in_dim(p, dy, x.shape[1], 1), dx, x.shape[2], 2))
    return acc


def _dilate_rect3(x: jax.Array) -> jax.Array:
    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), constant_values=0)
    acc = x
    for dy in range(3):
        for dx in range(3):
            acc = jnp.maximum(acc, jax.lax.dynamic_slice_in_dim(
                jax.lax.dynamic_slice_in_dim(p, dy, x.shape[1], 1), dx, x.shape[2], 2))
    return acc


def _erode_ellipse3(x: jax.Array) -> jax.Array:
    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), constant_values=255)
    acc = x
    for dy, dx in ((0, 1), (2, 1), (1, 0), (1, 2)):
        acc = jnp.minimum(acc, jax.lax.dynamic_slice_in_dim(
            jax.lax.dynamic_slice_in_dim(p, dy, x.shape[1], 1), dx, x.shape[2], 2))
    return acc


# ---------------------------------------------------------------------------
# The full per-dispatch refinement
# ---------------------------------------------------------------------------


def _candidates(win_img: jax.Array, win_msk: jax.Array, in_window: jax.Array):
    """The 4 candidate masks per window: 3 grey-histogram bands + the best
    per-channel Otsu (reference get_topk_masklist :56 / get_otsuthresh :43).

    Returns (4, K, sh, sw) uint8 candidates + (4, K) int32 XOR scores;
    invalid band slots come back all-zero with a huge score.
    """
    k, sh, sw = win_msk.shape
    n = sh * sw
    grey = bgr2gray_u8(win_img)
    # erosion with the window edge as the border (cv2 border for erode is
    # +inf: the edge does not erode)
    eroded = _erode_rect3(jnp.where(in_window, win_msk, 255))
    sel = ((eroded > 127) & in_window).reshape(k, n).astype(jnp.float32)
    any_sel = jnp.sum(sel, axis=1) > 0
    weights = jnp.where(any_sel[:, None], sel, in_window.reshape(k, n).astype(jnp.float32))

    gflat = grey.reshape(k, n)
    hist = _hist256(gflat, weights)  # (K, 256)
    present = hist > 0
    lvl = jnp.arange(256, dtype=jnp.float32)
    lo = jnp.min(jnp.where(present, lvl, 256.0), axis=1)
    hi = jnp.max(jnp.where(present, lvl, -1.0), axis=1)
    # np.histogram: 255 bins over [lo, hi]; all-equal data degenerates to a
    # single level — handle with a minimum span of 1
    span = jnp.maximum(hi - lo, 1e-6)
    width = span / 255.0
    # rebin the 256 integer levels into the 255 data-range bins
    bin_of = jnp.clip(((lvl[None, :] - lo[:, None]) / width[:, None]).astype(jnp.int32), 0, 254)
    counts255 = jnp.sum(
        hist[:, :, None] * (bin_of[:, :, None] == jnp.arange(255)[None, None, :]), axis=1
    )
    edges_lo = lo
    edges_step = width
    colors, n_colors = _topk_colors(counts255, edges_lo, edges_step)  # (K,3), (K,)

    cands = []
    xors = []
    for b in range(3):
        c = colors[:, b]
        c_top = jnp.minimum(c + 30.0, 255.0)
        c_bot = c_top - 60.0
        g = grey.astype(jnp.float32)
        band = ((g >= c_bot[:, None, None]) & (g <= c_top[:, None, None])).astype(jnp.uint8) * 255
        band, x = _pick_polarity(band, win_msk, in_window)
        # invalid slots contribute nothing in the merge (all-zero mask,
        # sorted last)
        x = jnp.where(n_colors > b, x, _XOR_INVALID)
        band = jnp.where((n_colors > b)[:, None, None], band, 0)
        cands.append(band)
        xors.append(x)

    # per-channel Otsu, keep the best
    best_x = jnp.full((k,), _XOR_INVALID, jnp.int32)
    best_m = jnp.zeros((k, sh, sw), jnp.uint8)
    for ch in range(3):
        plane = win_img[..., ch]
        hist_c = _hist256(plane.reshape(k, n), in_window.reshape(k, n).astype(jnp.float32))
        t = _otsu_from_hist(hist_c)  # (K,)
        th = (plane > t[:, None, None].astype(plane.dtype)).astype(jnp.uint8) * 255
        th, x = _pick_polarity(th, win_msk, in_window)
        better = x < best_x
        best_x = jnp.where(better, x, best_x)
        best_m = jnp.where(better[:, None, None], th, best_m)
    cands.append(best_m)
    xors.append(best_x)

    return jnp.stack(cands), jnp.stack(xors)  # (4, K, S, S), (4, K)


def refine_windows(
    img: jax.Array,
    mask: jax.Array,
    boxes: jax.Array,
    valid: jax.Array,
    refine_mode: int = REFINEMASK_INPAINT,
    win_hw: Tuple[int, int] = (S, S),
    cap: int = CAP,
) -> jax.Array:
    """Single-page wrapper over :func:`_refine_windows_jit` (returns (H, W)).
    Uses the resample-capable paste, so any window size is accepted."""
    # refine_mode rides as a traced scalar so both modes share one
    # executable (a static-arg variant pair tripped an executable-cache
    # buffer-count bug on the multi-device CPU test backend)
    pids = jnp.zeros((boxes.shape[0],), jnp.int32)
    return _refine_windows_jit(
        img[None], mask[None], boxes, valid, pids, jnp.int32(refine_mode),
        win_hw, cap, False,
    )[0]


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def _refine_windows_jit(
    img: jax.Array,
    mask: jax.Array,
    boxes: jax.Array,
    valid: jax.Array,
    page_ids: jax.Array,
    refine_mode: jax.Array,
    win_hw: Tuple[int, int],
    cap: int,
    exact: bool,
) -> jax.Array:
    """Refine K block windows (possibly spanning pages) in one dispatch.

    img (P, H, W, 3) uint8 BGR page stack at ORIGINAL resolution; mask
    (P, H, W) uint8 raw predicted masks (device-upsampled); boxes (K, 4)
    int32 xyxy windows (already expanded/clamped); valid (K,) bool;
    page_ids (K,) int32.  Static: ``win_hw`` the bucket shape, ``cap`` the
    component capacity, ``exact`` whether every window fits the bucket
    (enables the O(K*sh*sw) dynamic-slice paste; bit-exact vs the host
    merge).  Returns (P, H, W) uint8 0/255 refined canvases (OR of each
    page's window results).
    """
    sh, sw = win_hw
    win_img, win_msk, in_window = extract_windows(img, mask, boxes, page_ids, win_hw)
    cands, xors = _candidates(win_img, win_msk, in_window)  # (4,K,sh,sw), (4,K)

    # eroded+binarized prediction target (textmask.py:88-91); the window edge
    # is erode-neutral like cv2's crop border
    pred = _erode_ellipse3(jnp.where(in_window, win_msk, 255)) > 60
    pred &= in_window
    order = jnp.argsort(xors, axis=0)  # (4, K) stable: bands before otsu on ties

    k = win_msk.shape[0]
    # candidate CCs are independent of the sequential merge state, so label
    # all 4 candidate sets in ONE batched CC pass; only the cheap
    # accept/merge math stays sequential in XOR-score order
    fgs = _drop_tiny_components((cands > 0).reshape(4 * k, sh, sw))
    ids_all = _component_ids(fgs).reshape(4, k, sh, sw)
    fgs = fgs.reshape(4, k, sh, sw)
    merged = jnp.zeros((k, sh, sw), bool)
    for rank in range(4):
        idx = order[rank][None, :, None, None]  # (1, K, 1, 1)
        fg = jnp.take_along_axis(fgs, idx, axis=0)[0]
        ids = jnp.take_along_axis(ids_all, idx, axis=0)[0]
        merged = _merge_labeled(merged, fg, ids, pred, cap=cap)

    dilated = (_dilate_rect3(merged.astype(jnp.uint8) * 255) > 0) & in_window
    merged = jnp.where(refine_mode == REFINEMASK_INPAINT, dilated, merged)
    merged = _fill_holes(merged, pred, in_window, cap=cap)

    out = (merged.astype(jnp.uint8)) * 255
    if exact:
        return paste_windows_exact(
            out, boxes, valid, mask.shape[-2:], page_ids, mask.shape[0]
        )
    return paste_windows(
        out, boxes, valid, mask.shape[-2:], page_ids=page_ids, n_pages=mask.shape[0]
    )


# Windows per dispatch for the default (256, 256) bucket (BUCKETS carries
# per-bucket slot counts — larger windows get fewer slots so every dispatch
# is a similar device-time quantum).  8 slots also keep the off-TPU
# grid-stacked CC at 8*(S+GAP) = 2112 rows, within the Pallas column-sweep
# scoped-VMEM budget when the grid path is forced on TPU.
SLOTS = 8


def _bucket_index(w: int, h: int) -> int:
    """Smallest BUCKETS entry that fits a (w, h) box 1:1; -1 = none
    (resample fallback into the last bucket)."""
    for bi, (bh, bw, _slots, _cap) in enumerate(BUCKETS):
        if h <= bh and w <= bw:
            return bi
    return -1


def refine_pages(
    imgs: jax.Array,
    masks: jax.Array,
    window_boxes,
    page_ids,
    refine_mode: int = REFINEMASK_INPAINT,
) -> jax.Array:
    """Refine an arbitrary number of block windows across a page stack.

    imgs (P, H, W, 3) uint8, masks (P, H, W) uint8, window_boxes (N, 4)
    int xyxy in page coords (already expanded+clamped), page_ids (N,) int.

    Windows route to the smallest shape bucket that holds them 1:1 (exact —
    bit-identical to the host merge), resampling only beyond the largest
    bucket; within each bucket, windows from ALL pages pack into shared
    slot-sized dispatches and the per-page canvases OR across chunks.
    Returns (P, H, W) uint8.
    """
    import numpy as np

    boxes = np.asarray(window_boxes, np.int32).reshape(-1, 4)
    pids = np.asarray(page_ids, np.int32).reshape(-1)
    canvases = None

    groups: dict[int, list[int]] = {}
    for j, (x1, y1, x2, y2) in enumerate(boxes):
        groups.setdefault(_bucket_index(int(x2 - x1), int(y2 - y1)), []).append(j)

    for bi, idxs in groups.items():
        exact = bi >= 0
        bh, bw, slots, cap = BUCKETS[bi if exact else -1]
        for start in range(0, len(idxs), slots):
            sel = idxs[start:start + slots]
            valid = np.zeros((slots,), bool)
            valid[: len(sel)] = True
            padded = np.zeros((slots, 4), np.int32)
            padded[:, 2:] = 1  # degenerate-but-valid geometry for empty slots
            padded[: len(sel)] = boxes[sel]
            pchunk = np.zeros((slots,), np.int32)
            pchunk[: len(sel)] = pids[sel]
            c = _refine_windows_jit(
                imgs, masks, jnp.asarray(padded), jnp.asarray(valid),
                jnp.asarray(pchunk), jnp.int32(refine_mode),
                (bh, bw), cap, exact,
            )
            canvases = c if canvases is None else jnp.bitwise_or(canvases, c)
    if canvases is None:
        canvases = jnp.zeros(masks.shape, jnp.uint8)
    return canvases


def warm_refine_buckets(page_shape, p: int = 1, refine_mode: int = REFINEMASK_INPAINT) -> None:
    """Compile every bucket kernel (and the resample fallback) for a
    (H, W) page shape with a P-page stack, OUTSIDE any timed region.

    Remote-TPU compiles take minutes; a first-seen (page-shape, bucket)
    combination inside a timed stream destroys the measurement (r5c).  The
    batch pipeline canonicalizes P to batch_size, so one call per distinct
    page shape covers a whole heterogeneous stream.  Zero masks converge in
    one fixpoint round, so the warm run itself is cheap."""
    import numpy as np

    h, w = page_shape
    imgs = jnp.zeros((p, h, w, 3), jnp.uint8)
    masks = jnp.zeros((p, h, w), jnp.uint8)
    boxes = []
    for bh, bw, _slots, _cap in BUCKETS:
        boxes.append([0, 0, min(w, bw), min(h, bh)])
    # a window too big for every bucket: the resample-fallback trace
    fh, fw = min(h, BUCKETS[-1][0] + 64), min(w, BUCKETS[-1][1] + 64)
    boxes.append([0, 0, fw, fh])
    boxes = np.asarray(boxes, np.int32)
    jax.block_until_ready(
        refine_pages(imgs, masks, boxes, np.zeros((len(boxes),), np.int32), refine_mode)
    )


def refine_page(img, mask, window_boxes, refine_mode: int = REFINEMASK_INPAINT):
    """Single-page :func:`refine_pages` (returns the (H, W) canvas)."""
    import numpy as np

    n = len(np.asarray(window_boxes).reshape(-1, 4))
    return refine_pages(
        img[None], mask[None], window_boxes, np.zeros((n,), np.int32), refine_mode
    )[0]
