"""Pallas TPU kernels for hot pixel ops.

These implement the 3x3 grey morphology (cv2.erode/dilate equivalents the
mask-refinement stack leans on, reference utils/textmask.py:33-35,83-89)
and a fused mask-finalize (sigmoid map -> *255 -> uint8) as single-pass
VMEM stencils: one HBM read + one write per pixel, all work on the VPU,
instead of separate XLA reduce_window + cast round trips.

Kernels run tiled over row bands with a 1-px halo (overlapping BlockSpec
reads).  On non-TPU backends they fall back to Pallas interpret mode so the
same code paths are unit-testable on CPU.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _morph_kernel(op: Callable, x_ref, o_ref):
    x = x_ref[:]
    h, w = x.shape
    p = jnp.pad(x, ((1, 1), (1, 1)), mode="edge")
    acc = x
    for dy in range(3):
        for dx in range(3):
            if dy == 1 and dx == 1:
                continue
            acc = op(acc, jax.lax.dynamic_slice(p, (dy, dx), (h, w)))
    o_ref[:] = acc


def _run_morph(x: jax.Array, op: Callable) -> jax.Array:
    kernel = functools.partial(_morph_kernel, op)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=_interpret(),
    )(x)


@jax.jit
def erode3x3(x: jax.Array) -> jax.Array:
    """Grey erosion, 3x3 rect kernel, replicate border (cv2.erode)."""
    return _run_morph(x, jnp.minimum)


@jax.jit
def dilate3x3(x: jax.Array) -> jax.Array:
    """Grey dilation, 3x3 rect kernel, replicate border (cv2.dilate)."""
    return _run_morph(x, jnp.maximum)


def _ellipse_kernel(op: Callable, x_ref, o_ref):
    # cv2 MORPH_ELLIPSE (3,3) = 4-neighborhood cross + center
    x = x_ref[:]
    h, w = x.shape
    p = jnp.pad(x, ((1, 1), (1, 1)), mode="edge")
    acc = x
    for dy, dx in ((0, 1), (2, 1), (1, 0), (1, 2)):
        acc = op(acc, jax.lax.dynamic_slice(p, (dy, dx), (h, w)))
    o_ref[:] = acc


@jax.jit
def erode3x3_ellipse(x: jax.Array) -> jax.Array:
    """Grey erosion with the cross-shaped MORPH_ELLIPSE (3,3) footprint."""
    return pl.pallas_call(
        functools.partial(_ellipse_kernel, jnp.minimum),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=_interpret(),
    )(x)


def _finalize_kernel(mask_ref, o_ref):
    o_ref[:] = (mask_ref[:].astype(jnp.float32) * 255.0).astype(jnp.uint8)


@jax.jit
def mask_to_u8(mask: jax.Array) -> jax.Array:
    """Fused sigmoid-map -> uint8 (*255, truncating like the reference's
    postprocess_mask, inference.py:85-99)."""
    return pl.pallas_call(
        _finalize_kernel,
        out_shape=jax.ShapeDtypeStruct(mask.shape, jnp.uint8),
        interpret=_interpret(),
    )(mask)


def _binarize_kernel(thresh_ref, x_ref, o_ref):
    o_ref[:] = (x_ref[:] > thresh_ref[0]).astype(jnp.uint8)


@jax.jit
def binarize(x: jax.Array, thresh) -> jax.Array:
    """Fused probability-map binarization (DB shrink-map > thresh)."""
    t = jnp.asarray([thresh], jnp.float32)
    return pl.pallas_call(
        _binarize_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint8),
        interpret=_interpret(),
    )(t, x)


# ---------------------------------------------------------------------------
# Connected-components propagation round (the CC hot loop, ops/cc.py).
#
# One pallas_call per round: forward+backward segmented min-scans along both
# axes (Hillis-Steele doubling, entirely in VMEM) plus the 8-connectivity
# diagonal hop, plus the convergence flag — one HBM read + one write of the
# label map per round, versus ~40 HBM passes/round for the XLA
# associative_scan formulation (log-depth scans materialize every pass).
# ---------------------------------------------------------------------------

_CC_BIG = 2**30  # python int: jnp constants would be captured tracers in kernels


def _shift_with_fill(x: jax.Array, s: int, axis: int, fill) -> jax.Array:
    """Non-circular shift by +s (toward higher indices; -s for lower),
    vacated slots filled — static slices only, so it lowers everywhere."""
    h, w = x.shape
    if axis == 1:
        pad = jnp.full((h, abs(s)), fill, x.dtype)
        return (
            jnp.concatenate([pad, x[:, :-s]], axis=1)
            if s > 0
            else jnp.concatenate([x[:, -s:], pad], axis=1)
        )
    pad = jnp.full((abs(s), w), fill, x.dtype)
    return (
        jnp.concatenate([pad, x[:-s, :]], axis=0)
        if s > 0
        else jnp.concatenate([x[-s:, :], pad], axis=0)
    )


def _segmented_min_sweep(v: jax.Array, m: jax.Array, axis: int, reverse: bool) -> jax.Array:
    """In-VMEM segmented min-scan along ``axis``: each foreground pixel ends
    with the min over its full connected run.  (gate=False, v=BIG) is the
    shift-in boundary element, which the scan operator absorbs exactly."""
    n = v.shape[axis]
    sgn = -1 if reverse else 1
    g = m & _shift_with_fill(m, sgn, axis, False)
    s = 1
    while s < n:
        vp = _shift_with_fill(v, sgn * s, axis, _CC_BIG)
        gp = _shift_with_fill(g, sgn * s, axis, False)
        v = jnp.where(g, jnp.minimum(v, vp), v)
        g = g & gp
        s *= 2
    return v


def _cc_round_kernel(connectivity: int, l_ref, m_ref, o_ref, chg_ref):
    m = m_ref[:] != 0
    l0 = l_ref[:]
    l = _segmented_min_sweep(l0, m, axis=1, reverse=False)
    l = _segmented_min_sweep(l, m, axis=1, reverse=True)
    l = _segmented_min_sweep(l, m, axis=0, reverse=False)
    l = _segmented_min_sweep(l, m, axis=0, reverse=True)
    if connectivity == 8:
        h, w = l.shape
        p = jnp.pad(l, ((1, 1), (1, 1)), constant_values=_CC_BIG)
        diag = jnp.minimum(
            jnp.minimum(
                jax.lax.dynamic_slice(p, (0, 0), (h, w)),
                jax.lax.dynamic_slice(p, (0, 2), (h, w)),
            ),
            jnp.minimum(
                jax.lax.dynamic_slice(p, (2, 0), (h, w)),
                jax.lax.dynamic_slice(p, (2, 2), (h, w)),
            ),
        )
        l = jnp.where(m, jnp.minimum(l, diag), _CC_BIG)
    o_ref[:] = l
    chg_ref[0, 0] = jnp.any(l != l0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(2,))
def cc_propagate_round(labels: jax.Array, mask_u8: jax.Array, connectivity: int = 8):
    """One full propagation round. labels (H, W) i32 (background = 2**30),
    mask_u8 (H, W) uint8. Returns (labels', changed scalar i32)."""
    h, w = labels.shape
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        functools.partial(_cc_round_kernel, connectivity),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=_interpret(),
    )(labels, mask_u8)
