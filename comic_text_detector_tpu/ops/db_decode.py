"""DB (differentiable binarization) map -> text-line polygons.

TPU-first split of the reference SegDetectorRepresenter
(utils/db_utils.py:32-211):

* device: binarize the shrink map, label components, reduce per-component
  bbox/area/probability-sum (ops/cc.py) — the O(H·W) pixel work.
* host: per component (dozens), convex hull -> rotating-calipers min-area
  rect -> closed-form unclip (rect Minkowski-inflation replaces
  pyclipper JT_ROUND offset + second minAreaRect) -> reference corner
  ordering + clipping (ops/geometry.py).

Scores are exact component means of the probability map (the reference's
box_score_fast fills the outer contour; identical for hole-free components,
and holey low-score components are filtered by box_thresh downstream).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from comic_text_detector_tpu.constants import MAX_DB_COMPONENTS
from comic_text_detector_tpu.ops import geometry as geo
from comic_text_detector_tpu.ops.cc import ComponentStats, component_stats, connected_components


@functools.partial(jax.jit, static_argnums=(2,))
def db_device_decode(shrink_map: jax.Array, thresh, capacity: int = MAX_DB_COMPONENTS) -> ComponentStats:
    """Device half: (H, W) prob map -> component stats (+ compact label map)."""
    bitmap = shrink_map > thresh
    labels = connected_components(bitmap, 8)
    return component_stats(labels, shrink_map, capacity)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def db_decode_full_device(
    shrink_map: jax.Array,
    thresh,
    capacity: int = MAX_DB_COMPONENTS,
    angle_steps: int = 90,
    max_boundary: int = 8192,
    rank_ids: bool | None = None,
):
    """Fused all-device DB decode: prob map -> (boxes, scores, valid).

    The minimal-transfer path: only ~10 KB of rect corners/scores leave the
    device (no label-map download).  TPU-native formulation of rotating
    calipers: the kernel compacts each component's *boundary* pixels into a
    sorted table (one argsort + top-K instead of per-component gathers —
    large scatters cost ~12 ms/pass on v5e, so all heavy reductions run on
    the ≤``max_boundary``-point table), then scans ``angle_steps``
    orientations in [0, 90°), computing per-component projected extents with
    two segment reductions over the table, and picks the min-area angle.
    Exact for axis-aligned text (angle 0 is on the grid), within
    (90/angle_steps)° otherwise.

    Returns (boxes (C,4,2) f32 inflated by the DB unclip rule, scores (C,),
    valid (C,)).  Components beyond ``capacity``-1 or boundary points beyond
    ``max_boundary`` are dropped (text pages use a few thousand).
    """
    h, w = shrink_map.shape
    bitmap = shrink_map > thresh
    # On TPU the fused CC+rank kernel emits DENSE raster-ordered component
    # ids directly (1-based by root linear index — the same numbering the
    # sorted-boundary-table path derives), which deletes the label->dense
    # LUT scatter, the full-canvas dense gather, and the 1M-row stats
    # scatter-add below (each ~12 ms/M on v5e).  Off-TPU (and for canvases
    # beyond the in-VMEM budget) the original label formulation serves.
    if rank_ids is None:
        rank_ids = (
            jax.default_backend() == "tpu"
            and h % 8 == 0
            and w % 128 == 0
            and h * w <= 1024 * 1024
        )
    if rank_ids:
        from comic_text_detector_tpu.ops.pallas_kernels import cc_ids_windows_local

        labels = cc_ids_windows_local(bitmap.astype(jnp.uint8)[None])[0]
    else:
        labels = connected_components(bitmap, 8)  # raw = min linear index + 1

    # boundary pixels: any 4-neighbor differs (image border counts)
    big = jnp.int32(h * w + 1)
    pad = jnp.pad(labels, 1, constant_values=-1)
    nbr_same = (
        (pad[:-2, 1:-1] == labels)
        & (pad[2:, 1:-1] == labels)
        & (pad[1:-1, :-2] == labels)
        & (pad[1:-1, 2:] == labels)
    )
    boundary = (labels > 0) & ~nbr_same
    key = jnp.where(boundary, labels, big).reshape(-1)
    # sort key + linear index only (f32 payloads through a 1M sort cost
    # ~4 ms each); coordinates come from an 8K gather afterwards
    lin = jnp.arange(h * w, dtype=jnp.int32)
    skey, sidx = jax.lax.sort([key, lin], num_keys=1)
    k = min(max_boundary, skey.shape[0])
    skey, sidx = skey[:k], sidx[:k]
    bx = (sidx % w).astype(jnp.float32)
    by = (sidx // w).astype(jnp.float32)
    valid_pt = skey < big

    if rank_ids:
        # the kernel ids ARE the dense numbering (roots ascend in raster
        # order, exactly like first-appearance order in the sorted table)
        dense = jnp.where(valid_pt & (skey < capacity), skey, 0)
    else:
        # dense component ids in sorted (row-major-min-index) order
        first = valid_pt & jnp.concatenate([jnp.ones(1, bool), skey[1:] != skey[:-1]])
        dense = jnp.cumsum(first.astype(jnp.int32))
        dense = jnp.where(valid_pt & (dense < capacity), dense, 0)

    # batched angle scan over the boundary table: extents per (comp, angle)
    angles = jnp.arange(angle_steps, dtype=jnp.float32) * (jnp.pi / 2 / angle_steps)
    ca, sa = jnp.cos(angles), jnp.sin(angles)
    U = bx[:, None] * ca[None, :] + by[:, None] * sa[None, :]  # (K, A)
    V = -bx[:, None] * sa[None, :] + by[:, None] * ca[None, :]
    UV = jnp.concatenate([U, V], axis=1)  # (K, 2A)
    uv_min = jax.ops.segment_min(UV, dense, num_segments=capacity, indices_are_sorted=True)
    uv_max = jax.ops.segment_max(UV, dense, num_segments=capacity, indices_are_sorted=True)
    umin, vmin = uv_min[:, :angle_steps], uv_min[:, angle_steps:]
    umax, vmax = uv_max[:, :angle_steps], uv_max[:, angle_steps:]
    rw = umax - umin  # (C, A)
    rh = vmax - vmin
    areas = rw * rh
    best = jnp.argmin(areas, axis=1)  # (C,)
    ci = jnp.arange(capacity)
    e0, e1 = umin[ci, best], umax[ci, best]
    e2, e3 = vmin[ci, best], vmax[ci, best]
    a = angles[best]
    bw = e1 - e0
    bh = e3 - e2

    # component area & probability sum over the full map
    if rank_ids:
        # scatter-free: the dense ids factor as id = hi*LO + lo, so the
        # per-component reduction is one f32 MXU matmul between the two
        # one-hot factors (the refine stack's _component_sums trick; f32
        # operands keep the probability sums at scatter-add precision)
        lo_r = 64
        hi_n = (capacity + lo_r - 1) // lo_r
        flat = jnp.where(labels < capacity, labels, 0).reshape(-1)
        hi = flat // lo_r
        lo = flat % lo_r
        # contraction dim n minor-most on BOTH dot operands (no XLA minor-dim
        # transpose of the big one-hot; see ops/refine.py::_component_sums)
        oh_lo = (lo[:, None] == jnp.arange(lo_r, dtype=jnp.int32)[None, :]).astype(jnp.float32)
        qv = jnp.stack(
            [jnp.ones((h * w,), jnp.float32), shrink_map.reshape(-1).astype(jnp.float32)]
        )  # (2, N)
        oh_hi = hi[None, :] == jnp.arange(hi_n, dtype=jnp.int32)[:, None]  # (HI, N)
        lhs = (qv[:, None, :] * oh_hi[None].astype(jnp.float32)).reshape(2 * hi_n, h * w)
        sums = jax.lax.dot_general(
            lhs, oh_lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (2*HI, LO)
        sums = sums.reshape(2, hi_n * lo_r)[:, :capacity]
        # ids beyond the truncated boundary table have no extents in the
        # angle scan (their segment reductions stay at init) — zero their
        # area so `valid` excludes them, exactly like the LUT path, whose
        # lut rows only exist for table-present components.  Table ids are
        # contiguous 1..max, so presence is a <= test.
        in_table = jnp.arange(capacity) <= jnp.max(dense)
        area = jnp.where(in_table, sums[0], 0.0).at[0].set(0.0)
        vsum = sums[1]
    else:
        # tiny LUT scatter + one full-map pass
        lut = jnp.zeros(h * w + 2, jnp.int32).at[jnp.where(valid_pt, skey, 0)].max(dense)
        lut = lut.at[0].set(0)
        compact = lut[labels.reshape(-1)]
        sums = (
            jnp.zeros((capacity, 2), jnp.float32)
            .at[compact]
            .add(jnp.stack([jnp.ones_like(compact, jnp.float32), shrink_map.reshape(-1)], axis=-1))
        )
        area = sums[:, 0].at[0].set(0.0)
        vsum = sums[:, 1]

    per = 2.0 * (bw + bh)
    dist = jnp.where(per > 0, bw * bh * 1.5 / per, 0.0)
    u0, u1 = e0 - dist, e1 + dist
    v0, v1 = e2 - dist, e3 + dist
    cu = jnp.stack([u0, u1, u1, u0], axis=-1)  # (C, 4)
    cv = jnp.stack([v0, v0, v1, v1], axis=-1)
    cb, sb = jnp.cos(a)[:, None], jnp.sin(a)[:, None]
    boxes = jnp.stack([cu * cb - cv * sb, cu * sb + cv * cb], axis=-1)  # (C,4,2)
    sside = jnp.minimum(bw, bh)
    valid = (area > 0) & (sside >= 2.0)
    boxes = jnp.where(valid[:, None, None], boxes, 0.0)
    scores = jnp.where(area > 0, vsum / jnp.maximum(area, 1.0), 0.0)
    return boxes, scores, valid


def boxes_from_device_rects(
    boxes: np.ndarray,
    scores: np.ndarray,
    valid: np.ndarray,
    dest_width: int,
    dest_height: int,
    src_width: int,
    src_height: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host finisher for the all-device path: reference corner ordering,
    rescale, round+clip."""
    out_boxes: List[np.ndarray] = []
    out_scores: List[float] = []
    for i in range(len(scores)):
        if not valid[i]:
            continue
        box = geo.order_rect_points(boxes[i].astype(np.float64))
        box[:, 0] = np.clip(np.round(box[:, 0] / src_width * dest_width), 0, dest_width)
        box[:, 1] = np.clip(np.round(box[:, 1] / src_height * dest_height), 0, dest_height)
        out_boxes.append(box.astype(np.int32))
        out_scores.append(float(scores[i]))
    if out_boxes:
        return np.stack(out_boxes), np.asarray(out_scores, np.float32)
    return np.zeros((0, 4, 2), np.int32), np.zeros((0,), np.float32)


def _component_points(labels_np: np.ndarray, idx: int, bbox) -> np.ndarray:
    x0, y0, x1, y1 = bbox
    win = labels_np[y0 : y1 + 1, x0 : x1 + 1] == idx
    ys, xs = np.nonzero(win)
    return np.stack([xs + x0, ys + y0], axis=1).astype(np.float64)


def boxes_from_stats(
    stats: ComponentStats,
    dest_width: int,
    dest_height: int,
    src_width: int,
    src_height: int,
    unclip_ratio: float = 1.5,
    min_sside: float = 2.0,
    max_candidates: int = 1000,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host half: stats -> (N,4,2) quad boxes + (N,) scores.

    Mirrors boxes_from_bitmap (db_utils.py:123-166): min-area rect per
    component, skip short sides < 2, unclip by area·ratio/perimeter, rescale
    to dest size, round+clip.
    """
    labels_np = np.asarray(stats.compact_labels)
    area = np.asarray(stats.area)
    vsum = np.asarray(stats.value_sum)
    xmin, ymin = np.asarray(stats.xmin), np.asarray(stats.ymin)
    xmax, ymax = np.asarray(stats.xmax), np.asarray(stats.ymax)

    boxes: List[np.ndarray] = []
    scores: List[float] = []

    from comic_text_detector_tpu.native import get_native

    native = get_native()
    if native is not None:
        n_comp = int((area[1:] > 0).sum())
        if n_comp == 0:
            return np.zeros((0, 4, 2), np.int32), np.zeros((0,), np.float32)
        nboxes, nssides, _ = native.component_min_area_rects(
            labels_np.astype(np.int32), int(len(area) - 1), None, unclip_ratio
        )
        n = 0
        for i in range(1, len(area)):
            if area[i] <= 0:
                continue
            n += 1
            if n > max_candidates:
                break
            if nssides[i - 1] < min_sside:
                continue
            box = geo.order_rect_points(nboxes[i - 1])
            box[:, 0] = np.clip(np.round(box[:, 0] / src_width * dest_width), 0, dest_width)
            box[:, 1] = np.clip(np.round(box[:, 1] / src_height * dest_height), 0, dest_height)
            boxes.append(box.astype(np.int32))
            scores.append(float(vsum[i] / area[i]))
        if boxes:
            return np.stack(boxes), np.asarray(scores, np.float32)
        return np.zeros((0, 4, 2), np.int32), np.zeros((0,), np.float32)

    n = 0
    for i in range(1, len(area)):
        if area[i] <= 0:
            continue
        n += 1
        if n > max_candidates:
            break
        pts = _component_points(labels_np, i, (xmin[i], ymin[i], xmax[i], ymax[i]))
        box, sside = geo.mini_box(pts)
        if sside < min_sside:
            continue
        score = float(vsum[i] / area[i])
        _, (w, h) = geo.min_area_rect(pts)
        per = 2.0 * (w + h)
        distance = (w * h) * unclip_ratio / per if per > 0 else 0.0
        box = geo.order_rect_points(geo.inflate_rect(box, distance))
        box[:, 0] = np.clip(np.round(box[:, 0] / src_width * dest_width), 0, dest_width)
        box[:, 1] = np.clip(np.round(box[:, 1] / src_height * dest_height), 0, dest_height)
        boxes.append(box.astype(np.int32))
        scores.append(score)
    if boxes:
        return np.stack(boxes), np.asarray(scores, np.float32)
    return np.zeros((0, 4, 2), np.int32), np.zeros((0,), np.float32)


def polygons_from_stats(
    stats: ComponentStats,
    dest_width: int,
    dest_height: int,
    src_width: int,
    src_height: int,
    unclip_ratio: float = 1.5,
    box_thresh: float = 0.7,
    min_size: float = 3.0,
    max_candidates: int = 1000,
) -> Tuple[List[np.ndarray], List[float]]:
    """Polygon-output mode (polygons_from_bitmap, db_utils.py:74-121):
    boundary trace -> Douglas-Peucker simplify (0.5% of arc length) ->
    score filter -> round-join polygon offset -> rescale."""
    labels_np = np.asarray(stats.compact_labels)
    area = np.asarray(stats.area)
    vsum = np.asarray(stats.value_sum)
    xmin, ymin = np.asarray(stats.xmin), np.asarray(stats.ymin)
    xmax, ymax = np.asarray(stats.xmax), np.asarray(stats.ymax)

    polys: List[np.ndarray] = []
    scores: List[float] = []
    n = 0
    for i in range(1, len(area)):
        if area[i] <= 0:
            continue
        n += 1
        if n > max_candidates:
            break
        x0, y0, x1, y1 = xmin[i], ymin[i], xmax[i], ymax[i]
        win = labels_np[y0 : y1 + 1, x0 : x1 + 1] == i
        contour = trace_boundary(win)
        if len(contour) < 4:
            continue
        contour = contour + np.array([x0, y0])
        eps = 0.005 * geo.perimeter(contour.astype(np.float64))
        approx = douglas_peucker_closed(contour.astype(np.float64), eps)
        if len(approx) < 4:
            continue
        score = float(vsum[i] / area[i])
        if score < box_thresh:
            continue
        expanded = geo.offset_polygon(approx, _poly_unclip_distance(approx, unclip_ratio))
        if len(expanded) < 3:
            continue
        _, sside = geo.mini_box(expanded)
        if sside < min_size + 2:
            continue
        out = expanded.copy()
        out[:, 0] = np.clip(np.round(out[:, 0] / src_width * dest_width), 0, dest_width)
        out[:, 1] = np.clip(np.round(out[:, 1] / src_height * dest_height), 0, dest_height)
        polys.append(out.astype(np.int32))
        scores.append(score)
    return polys, scores


def _poly_unclip_distance(poly: np.ndarray, unclip_ratio: float) -> float:
    a = abs(geo.shoelace_area(poly))
    p = geo.perimeter(poly)
    return a * unclip_ratio / p if p > 0 else 0.0


_MOORE = [(-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1)]


def trace_boundary(mask: np.ndarray) -> np.ndarray:
    """Moore-neighbor boundary trace of the largest True region in ``mask``.

    Returns (N,2) int (x, y) boundary pixel coordinates in order — the
    cv2.findContours outer-contour analog.
    """
    ys, xs = np.nonzero(mask)
    if len(ys) == 0:
        return np.zeros((0, 2), np.int64)
    start = (ys[0], xs[0])  # topmost-leftmost (row-major first)
    h, w = mask.shape

    def at(p):
        y, x = p
        return 0 <= y < h and 0 <= x < w and mask[y, x]

    contour = [start]
    # backtrack starts pointing "up-left" of start per Moore tracing
    prev_dir = 6  # coming from the left
    cur = start
    for _ in range(4 * mask.size):
        found = False
        for k in range(8):
            d = (prev_dir + 1 + k) % 8
            ny, nx = cur[0] + _MOORE[d][0], cur[1] + _MOORE[d][1]
            if at((ny, nx)):
                if (ny, nx) == start and len(contour) > 1:
                    return np.array([(x, y) for y, x in contour], np.int64)
                contour.append((ny, nx))
                cur = (ny, nx)
                prev_dir = (d + 4) % 8  # new backtrack = opposite of arrival
                found = True
                break
        if not found:  # isolated pixel
            break
    return np.array([(x, y) for y, x in contour], np.int64)


def douglas_peucker_closed(poly: np.ndarray, eps: float) -> np.ndarray:
    """Ramer–Douglas–Peucker simplification of a closed polygon
    (cv2.approxPolyDP(closed=True) analog): split at the two farthest points,
    simplify both open chains."""
    n = len(poly)
    if n < 3:
        return poly
    i0 = 0
    d = np.linalg.norm(poly - poly[i0], axis=1)
    i1 = int(np.argmax(d))
    if i1 == 0:
        return poly[:1]
    chain1 = poly[i0 : i1 + 1]
    chain2 = np.vstack([poly[i1:], poly[:1]])
    s1 = _dp_open(chain1, eps)
    s2 = _dp_open(chain2, eps)
    return np.vstack([s1[:-1], s2[:-1]])


def _dp_open(pts: np.ndarray, eps: float) -> np.ndarray:
    if len(pts) < 3:
        return pts
    a, b = pts[0], pts[-1]
    ab = b - a
    nrm = np.linalg.norm(ab)
    if nrm < 1e-12:
        d = np.linalg.norm(pts - a, axis=1)
    else:
        rel = pts - a
        d = np.abs(ab[0] * rel[:, 1] - ab[1] * rel[:, 0]) / nrm
    i = int(np.argmax(d))
    if d[i] > eps:
        left = _dp_open(pts[: i + 1], eps)
        right = _dp_open(pts[i:], eps)
        return np.vstack([left[:-1], right])
    return np.vstack([a, b])
