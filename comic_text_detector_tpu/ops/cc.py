"""Connected-component labeling + per-component stats on device (JAX/XLA).

Replaces cv2.connectedComponentsWithStats / cv2.findContours component
discovery (reference utils/textmask.py:93,113,138 and utils/db_utils.py:136)
with a TPU-friendly formulation:

* labels start as each pixel's linear index and converge to the component
  minimum by alternating segmented min-scans along rows/columns
  (``jax.lax.associative_scan``) plus diagonal hops for 8-connectivity,
  inside a ``lax.while_loop`` fixpoint.  Scan-based propagation crosses an
  entire row/column run per iteration, so convergence takes O(#turns of the
  most serpentine component), not O(diameter) — single digits for text.
* stats (bbox, area, centroid, value-sums) are fixed-capacity scatter
  reductions keyed on compacted labels.

Everything is static-shape; ragged component sets are (arrays, count).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from comic_text_detector_tpu.constants import MAX_DB_COMPONENTS

# python int, not jnp.int32: a module-level jax array would be captured as
# a committed single-device constant in every trace (breaks re-execution on
# multi-device backends)
_BIG = 2**30


def _segmented_min_scan(vals: jax.Array, mask: jax.Array, axis: int, reverse: bool) -> jax.Array:
    """Min-scan of ``vals`` along ``axis``, restarting wherever ``mask`` is
    False (segment boundaries). Background keeps _BIG."""
    gate = mask & jnp.roll(mask, 1 if not reverse else -1, axis=axis)
    # first element of each line has no predecessor
    idx = jnp.arange(vals.shape[axis])
    first = idx == (0 if not reverse else vals.shape[axis] - 1)
    shape = [1, 1]
    shape[axis] = vals.shape[axis]
    gate = gate & ~first.reshape(shape)

    def combine(a, b):
        ag, av = a
        bg, bv = b
        v = jnp.where(bg, jnp.minimum(av, bv), bv)
        return ag & bg, v

    _, out = jax.lax.associative_scan(combine, (gate, vals), axis=axis, reverse=reverse)
    return jnp.where(mask, out, _BIG)


def _propagate_once(labels: jax.Array, mask: jax.Array, connectivity: int) -> jax.Array:
    h, w = labels.shape
    l = labels
    l = _segmented_min_scan(l, mask, axis=1, reverse=False)
    l = _segmented_min_scan(l, mask, axis=1, reverse=True)
    l = _segmented_min_scan(l, mask, axis=0, reverse=False)
    l = _segmented_min_scan(l, mask, axis=0, reverse=True)
    if connectivity == 8:
        # diagonal hops via one padded buffer + static slices (no wraparound)
        p = jnp.pad(l, 1, constant_values=_BIG)
        diag = jnp.minimum(
            jnp.minimum(p[:-2, :-2], p[:-2, 2:]), jnp.minimum(p[2:, :-2], p[2:, 2:])
        )
        l = jnp.where(mask, jnp.minimum(l, diag), _BIG)
    return l


def _use_pallas(shape) -> bool:
    """Pallas CC path: on TPU, for lane/sublane-aligned shapes.  Off-TPU the
    XLA scan path wins (Pallas interpret mode is orders slower)."""
    return (
        jax.default_backend() == "tpu"
        and shape[0] % 8 == 0
        and shape[1] % 128 == 0
        # column strips have a 128-lane tiling floor; taller canvases would
        # blow the sweep kernel's scoped-VMEM budget (pallas_kernels.py)
        and shape[0] * 128 <= (1 << 19)
    )


def _use_vmem(shape) -> bool:
    """Whole-canvas in-VMEM fixpoint: hardware-validated r4 (scripts/
    vmem_check.py, data/vmem_check.log) — bit-equal to the XLA path at
    1024² on a real DB shrink bitmap (28.6k comps), a serpentine snake and
    45%-dense noise, and faster than the banded sweeps on the dense cases
    (22.4 vs 25.3 ms real page, 37.6 vs 42.4 ms dense noise).  Fits
    canvases <= 1M elements (~40 MB scoped VMEM at the measured ~10-copy
    labels-only footprint)."""
    return (
        jax.default_backend() == "tpu"
        and shape[0] % 8 == 0
        and shape[1] % 128 == 0
        and shape[0] * shape[1] <= 1024 * 1024
    )


@functools.partial(jax.jit, static_argnums=(1, 2))
def connected_components(mask: jax.Array, connectivity: int = 8, backend: str = "auto") -> jax.Array:
    """Label connected True-regions of a (H, W) bool mask.

    Returns int32 (H, W): 0 = background, else (min linear index in the
    component) + 1 — a deterministic canonical labeling (row-major order of
    component tops, like cv2's label order up to renumbering).

    ``backend``: 'auto' picks the fused Pallas propagation kernel on TPU
    (one HBM round-trip per propagation round instead of ~40 for the
    log-depth associative scans); 'xla'/'pallas' force a path.
    """
    h, w = mask.shape
    lin = (jnp.arange(h * w, dtype=jnp.int32)).reshape(h, w)
    labels0 = jnp.where(mask, lin, _BIG)

    if backend == "vmem" or (backend == "auto" and _use_vmem(mask.shape)):
        # whole-canvas in-VMEM fixpoint (the refine windows' labels-only
        # kernel on a 1-window batch): zero HBM round-trips between
        # propagation rounds.  'auto' routes fitting canvases here since the
        # r4 hardware vmem_check (see _use_vmem) proved equality + a win
        # over the banded sweeps on the 1024² DB-decode labeling.
        from comic_text_detector_tpu.ops.pallas_kernels import cc_windows_local

        out = cc_windows_local(mask.astype(jnp.uint8)[None])[0]
        return jnp.where(mask, out + 1, 0).astype(jnp.int32)

    if backend == "pallas" or (backend == "auto" and _use_pallas(mask.shape)):
        from comic_text_detector_tpu.ops.pallas_kernels import cc_col_sweep, cc_row_sweep

        mask_u8 = mask.astype(jnp.uint8)

        def round_p(l):
            l = cc_row_sweep(l, mask_u8)
            l = cc_col_sweep(l, mask_u8)
            if connectivity == 8:
                # diagonal hop + re-mask fuse into one XLA stencil pass
                p = jnp.pad(l, 1, constant_values=_BIG)
                diag = jnp.minimum(
                    jnp.minimum(p[:-2, :-2], p[:-2, 2:]), jnp.minimum(p[2:, :-2], p[2:, 2:])
                )
                l = jnp.where(mask, jnp.minimum(l, diag), _BIG)
            return l

        def cond_p(state):
            _, changed = state
            return changed

        def body_p(state):
            labels, _ = state
            mid = round_p(labels)
            nxt = round_p(mid)
            # if the second round changed nothing, nxt IS the fixpoint
            return nxt, jnp.any(nxt != mid)

        labels, _ = jax.lax.while_loop(cond_p, body_p, (labels0, jnp.bool_(True)))
        return jnp.where(mask, labels + 1, 0).astype(jnp.int32)

    def cond(state):
        labels, changed = state
        return changed

    def body(state):
        labels, _ = state
        # two propagation rounds per convergence test (halves loop overhead;
        # text components converge in a handful of rounds)
        mid = _propagate_once(labels, mask, connectivity)
        nxt = _propagate_once(mid, mask, connectivity)
        return nxt, jnp.any(nxt != labels)

    labels, _ = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True)))
    return jnp.where(mask, labels + 1, 0).astype(jnp.int32)


class ComponentStats(NamedTuple):
    """Fixed-capacity per-component statistics (index 0 unused/background)."""

    count: jax.Array  # () int32 — number of valid components (may exceed capacity-1 => truncated)
    area: jax.Array  # (C,) int32
    xmin: jax.Array  # (C,) int32
    ymin: jax.Array  # (C,) int32
    xmax: jax.Array  # (C,) int32
    ymax: jax.Array  # (C,) int32
    value_sum: jax.Array  # (C,) float32 — sum of ``values`` over the component
    compact_labels: jax.Array  # (H, W) int32 in [0, C)


@functools.partial(jax.jit, static_argnums=(2,))
def component_stats(
    labels: jax.Array, values: Optional[jax.Array] = None, capacity: int = MAX_DB_COMPONENTS
) -> ComponentStats:
    """Compact raw CC labels to [1..C-1] and reduce per-component stats.

    ``values`` (H, W) float — summed per component (e.g. the DB probability
    map, for box_score; reference db_utils.py box_score_fast :197).
    Components beyond ``capacity-1`` are dropped (count still reports the
    true total so callers can detect truncation).
    """
    h, w = labels.shape
    flat = labels.reshape(-1)
    present = jnp.zeros(h * w + 1, jnp.int32).at[flat].max(jnp.where(flat > 0, 1, 0))
    comp_id_full = jnp.cumsum(present)  # label value -> compact id (1-based)
    total = comp_id_full[-1]
    comp_id = jnp.where(present > 0, comp_id_full, 0)
    compact = comp_id[flat].astype(jnp.int32)
    compact = jnp.where(compact < capacity, compact, 0).reshape(h, w)

    cflat = compact.reshape(-1)
    ys = jnp.repeat(jnp.arange(h, dtype=jnp.int32), w)
    xs = jnp.tile(jnp.arange(w, dtype=jnp.int32), h)
    ones = jnp.ones_like(cflat)

    area = jnp.zeros(capacity, jnp.int32).at[cflat].add(ones)
    area = area.at[0].set(0)
    xmin = jnp.full(capacity, w, jnp.int32).at[cflat].min(xs)
    ymin = jnp.full(capacity, h, jnp.int32).at[cflat].min(ys)
    xmax = jnp.full(capacity, -1, jnp.int32).at[cflat].max(xs)
    ymax = jnp.full(capacity, -1, jnp.int32).at[cflat].max(ys)
    if values is None:
        vsum = jnp.zeros(capacity, jnp.float32)
    else:
        vsum = jnp.zeros(capacity, jnp.float32).at[cflat].add(values.reshape(-1).astype(jnp.float32))
        vsum = vsum.at[0].set(0.0)
    return ComponentStats(
        count=total.astype(jnp.int32),
        area=area,
        xmin=xmin,
        ymin=ymin,
        xmax=xmax,
        ymax=ymax,
        value_sum=vsum,
        compact_labels=compact,
    )
