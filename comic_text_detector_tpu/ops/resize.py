"""Bilinear resize + letterbox with OpenCV INTER_LINEAR semantics.

The reference letterboxes on host with cv2 (utils/imgproc_utils.py:86-117)
and un-letterboxes the mask with cv2.resize (inference.py:164-165).  We
reproduce the exact sampling convention (half-pixel centers, no antialias,
edge clamp) so masks line up to IoU≥0.99, with both a jittable device path
and a NumPy host path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np



def _lerp_weights(dst: int, src: int):
    """Source indices + weights for cv2-style half-pixel bilinear sampling."""
    x = (np.arange(dst, dtype=np.float64) + 0.5) * (src / dst) - 0.5
    x0 = np.floor(x)
    frac = (x - x0).astype(np.float32)
    i0 = np.clip(x0, 0, src - 1).astype(np.int32)
    i1 = np.clip(x0 + 1, 0, src - 1).astype(np.int32)
    # cv2 clamps the *coordinate* before computing weights only at borders;
    # effectively fractional part is zeroed when x<0.
    frac = np.where(x < 0, 0.0, frac).astype(np.float32)
    return i0, i1, frac


def resize_bilinear_np(img: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Host bilinear resize matching cv2.resize(..., INTER_LINEAR) on floats.

    For uint8 inputs the result matches cv2 within ±1 (cv2 uses fixed-point
    arithmetic internally).
    """
    h, w = img.shape[:2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return img.copy()
    if img.dtype == np.uint8:
        return resize_cv2exact_u8_np(img, out_hw)
    dtype = img.dtype
    x = img.astype(np.float32)
    r0, r1, rf = _lerp_weights(oh, h)
    c0, c1, cf = _lerp_weights(ow, w)
    top = x[r0][:, c0] * (1 - cf[None, :, None] if x.ndim == 3 else 1 - cf[None, :]) + (
        x[r0][:, c1] * (cf[None, :, None] if x.ndim == 3 else cf[None, :])
    )
    bot = x[r1][:, c0] * (1 - cf[None, :, None] if x.ndim == 3 else 1 - cf[None, :]) + (
        x[r1][:, c1] * (cf[None, :, None] if x.ndim == 3 else cf[None, :])
    )
    out = top * (1 - rf[:, None, None] if x.ndim == 3 else 1 - rf[:, None]) + bot * (
        rf[:, None, None] if x.ndim == 3 else rf[:, None]
    )
    if np.issubdtype(dtype, np.integer):
        return np.clip(np.round(out), 0, 255).astype(dtype)
    return out.astype(dtype)


def resize_bilinear(img: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Device bilinear resize (half-pixel, no antialias) — jittable.

    Works on (H,W,C) or (H,W) arrays; out_hw is static.
    """
    h, w = img.shape[0], img.shape[1]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return img
    r0, r1, rf = _lerp_weights(oh, h)
    c0, c1, cf = _lerp_weights(ow, w)
    x = img.astype(jnp.float32)
    rf = jnp.asarray(rf)[:, None] if x.ndim == 2 else jnp.asarray(rf)[:, None, None]
    cf = jnp.asarray(cf)[None, :] if x.ndim == 2 else jnp.asarray(cf)[None, :, None]
    xr0 = x[jnp.asarray(r0)]
    xr1 = x[jnp.asarray(r1)]
    top = xr0[:, jnp.asarray(c0)] * (1 - cf) + xr0[:, jnp.asarray(c1)] * cf
    bot = xr1[:, jnp.asarray(c0)] * (1 - cf) + xr1[:, jnp.asarray(c1)] * cf
    out = top * (1 - rf) + bot * rf
    if jnp.issubdtype(img.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255).astype(img.dtype)
    return out


# --- cv2 bit-exact uint8 bilinear ------------------------------------------------
#
# cv2.resize(..., INTER_LINEAR) on uint8 runs in 11-bit fixed point: per-axis
# coefficients `saturate_cast<short>(f * 2048)` (float32 products, round half
# to even), an integer horizontal pass, and the 8U vertical specialization
#   dst = ((b0*(S0>>4))>>16) + ((b1*(S1>>4))>>16) + 2) >> 2.
# All intermediates provably fit int32 (coef pairs sum to 2048).  Replicating
# it exactly removes the ±1 LSB noise of float bilinear, which otherwise
# flips conf-threshold/NMS decisions in golden-parity runs.


def _cv2_linear_coefs(dst: int, src: int):
    """(src index, coef0, coef1) per dst sample, cv2 INTER_LINEAR 8U rules."""
    scale = src / dst
    x = (np.arange(dst, dtype=np.float64) + 0.5) * scale - 0.5
    sx = np.floor(x).astype(np.int64)
    fx = (x - sx).astype(np.float32)
    fx = np.where(sx < 0, np.float32(0.0), fx)
    sx = np.maximum(sx, 0)
    if src > 1:
        fx = np.where(sx >= src - 1, np.float32(1.0), fx)
        sx = np.minimum(sx, src - 2)
    else:
        fx = np.zeros_like(fx)
        sx = np.zeros_like(sx)
    a0 = np.rint((np.float32(1.0) - fx) * np.float32(2048)).astype(np.int32)
    a1 = np.rint(fx * np.float32(2048)).astype(np.int32)
    return sx.astype(np.int32), a0, a1


def resize_cv2exact_u8_np(img: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Bit-exact cv2.resize INTER_LINEAR for uint8 (H,W[,C]) images."""
    h, w = img.shape[:2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return img.copy()
    sx, a0, a1 = _cv2_linear_coefs(ow, w)
    sy, b0, b1 = _cv2_linear_coefs(oh, h)
    # the +1 tap has weight 0 when clamped (src==1 degenerate axis) — clamp
    # so numpy fancy indexing cannot go out of bounds (jnp.take self-clamps)
    sx1 = np.minimum(sx + 1, w - 1)
    sy1 = np.minimum(sy + 1, h - 1)
    im = img.astype(np.int32)
    exp = (slice(None), None, None) if img.ndim == 3 else (slice(None), None)
    if img.ndim == 3:
        row = im[:, sx] * a0[None, :, None] + im[:, sx1] * a1[None, :, None]
    else:
        row = im[:, sx] * a0[None, :] + im[:, sx1] * a1[None, :]
    s0, s1 = row[sy], row[sy1]
    t = ((b0[exp] * (s0 >> 4)) >> 16) + ((b1[exp] * (s1 >> 4)) >> 16)
    out = np.clip((t + 2) >> 2, 0, 255)
    # vertically-copied rows (coef 2048/0) take cv2's 1-D cast instead:
    # (S + 1023) >> 11 — round half DOWN, not the 2-D (+2)>>2 rounding.
    # (cv2 5.0's IPP-backed non-dyadic scales truncate these rows instead;
    # that residual ±1 LSB on <0.5% of edge-row pixels is accepted.)
    edge0 = np.clip((s0 + 1023) >> 11, 0, 255)
    edge1 = np.clip((s1 + 1023) >> 11, 0, 255)
    out = np.where(b0[exp] == 2048, edge0, out)
    out = np.where(b1[exp] == 2048, edge1, out)
    return out.astype(np.uint8)


def resize_cv2exact_u8(img_u8: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Device twin of :func:`resize_cv2exact_u8_np`.

    On TPU this routes to the MXU matmul formulation (bit-identical, ~10x
    faster than per-element gathers); off-TPU the gather form wins and also
    serves as the mm path's independent equality oracle in tests."""
    if jax.default_backend() == "tpu":
        return resize_cv2exact_u8_mm(img_u8, out_hw)
    return resize_cv2exact_u8_gather(img_u8, out_hw)


def resize_cv2exact_u8_gather(img_u8: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Gather formulation (same integer math; coefficients precomputed on
    host from the static shapes)."""
    h, w = img_u8.shape[0], img_u8.shape[1]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return img_u8
    sx, a0, a1 = _cv2_linear_coefs(ow, w)
    sy, b0, b1 = _cv2_linear_coefs(oh, h)
    im = img_u8.astype(jnp.int32)
    g0 = jnp.take(im, jnp.asarray(sx), axis=1)
    g1 = jnp.take(im, jnp.asarray(sx + 1), axis=1)
    if img_u8.ndim == 3:
        row = g0 * jnp.asarray(a0)[None, :, None] + g1 * jnp.asarray(a1)[None, :, None]
        bb0 = jnp.asarray(b0)[:, None, None]
        bb1 = jnp.asarray(b1)[:, None, None]
    else:
        row = g0 * jnp.asarray(a0)[None, :] + g1 * jnp.asarray(a1)[None, :]
        bb0 = jnp.asarray(b0)[:, None]
        bb1 = jnp.asarray(b1)[:, None]
    s0 = jnp.take(row, jnp.asarray(sy), axis=0)
    s1 = jnp.take(row, jnp.asarray(sy + 1), axis=0)
    t = ((bb0 * (s0 >> 4)) >> 16) + ((bb1 * (s1 >> 4)) >> 16)
    out = jnp.clip((t + 2) >> 2, 0, 255)
    edge0 = jnp.clip((s0 + 1023) >> 11, 0, 255)
    edge1 = jnp.clip((s1 + 1023) >> 11, 0, 255)
    out = jnp.where(bb0 == 2048, edge0, out)
    out = jnp.where(bb1 == 2048, edge1, out)
    return out.astype(jnp.uint8)


def resize_cv2exact_u8_mm(img_u8: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """MXU formulation of :func:`resize_cv2exact_u8` — bit-identical output.

    The gather twin pays XLA's per-element gather cost (~12 ms/M points on
    v5e; the 1024² letterbox + original-resolution mask upsample measured
    25.8 + 27.8 ms/page, profile_page r4).  Here both passes become f32
    matmuls: the horizontal fixed-point pass contracts the (w, ow) sparse
    coefficient matrix, and the vertical tap selection contracts a stacked
    (2·oh, h) one-hot.  Exactness: every intermediate is an integer
    ≤ 255·2048 = 522240 < 2²³, and each output sums at most two nonzero
    products, so f32 accumulation is exact; the nonlinear 8U vertical tail
    (``>>4``/``>>16`` truncations, edge-row cast) stays in int32 elementwise
    exactly like the gather twin."""
    h, w = img_u8.shape[0], img_u8.shape[1]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return img_u8
    sx, a0, a1 = _cv2_linear_coefs(ow, w)
    sy, b0, b1 = _cv2_linear_coefs(oh, h)
    cols = np.arange(ow)
    wx = np.zeros((w, ow), np.float32)
    wx[sx, cols] += a0
    wx[np.minimum(sx + 1, w - 1), cols] += a1
    sel = np.zeros((2 * oh, h), np.float32)
    sel[np.arange(oh), sy] = 1.0
    sel[oh + np.arange(oh), np.minimum(sy + 1, h - 1)] = 1.0

    squeeze = img_u8.ndim == 2
    x = (img_u8[..., None] if squeeze else img_u8).astype(jnp.float32)  # (h, w, c)
    c = x.shape[2]
    row = jax.lax.dot_general(
        x.transpose(0, 2, 1).reshape(h * c, w),
        jnp.asarray(wx),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(h, c * ow)  # (h, c·ow), integer-valued
    ss = jax.lax.dot_general(
        jnp.asarray(sel), row, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # (2·oh, c·ow)
    s0 = ss[:oh].reshape(oh, c, ow)
    s1 = ss[oh:].reshape(oh, c, ow)
    bb0 = jnp.asarray(b0)[:, None, None]
    bb1 = jnp.asarray(b1)[:, None, None]
    t = ((bb0 * (s0 >> 4)) >> 16) + ((bb1 * (s1 >> 4)) >> 16)
    out = jnp.clip((t + 2) >> 2, 0, 255)
    edge0 = jnp.clip((s0 + 1023) >> 11, 0, 255)
    edge1 = jnp.clip((s1 + 1023) >> 11, 0, 255)
    out = jnp.where(bb0 == 2048, edge0, out)
    out = jnp.where(bb1 == 2048, edge1, out)
    out = out.astype(jnp.uint8).transpose(0, 2, 1)  # (oh, ow, c)
    return out[..., 0] if squeeze else out


def letterbox_shape(h: int, w: int, new_shape: int | Tuple[int, int]) -> Tuple[int, int, int, int, float]:
    """(resized_h, resized_w, dw, dh, r) for a letterbox to ``new_shape``.

    Mirrors reference letterbox math (imgproc_utils.py:93-110, auto=False):
    scale r=min(target/h, target/w), round to nearest, pad bottom/right only.
    """
    if not isinstance(new_shape, tuple):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / h, new_shape[1] / w)
    nw, nh = int(round(w * r)), int(round(h * r))
    dw, dh = new_shape[1] - nw, new_shape[0] - nh
    return nh, nw, dw, dh, r


@functools.partial(jax.jit, static_argnums=(1,))
def letterbox_device(img_u8: jax.Array, new_shape: int) -> jax.Array:
    """uint8 (H,W,3) -> float32 (new,new,3) in [0,1]: resize + bottom/right
    zero-pad + /255, fused into one device graph (one compile per input shape)."""
    h, w = img_u8.shape[0], img_u8.shape[1]
    nh, nw, dw, dh, _ = letterbox_shape(h, w, new_shape)
    x = resize_cv2exact_u8(img_u8, (nh, nw)).astype(jnp.float32)
    x = jnp.pad(x, ((0, dh), (0, dw), (0, 0)))
    return x / 255.0


def letterbox_np(img: np.ndarray, new_shape: int | Tuple[int, int]) -> Tuple[np.ndarray, Tuple[float, float], Tuple[int, int]]:
    """Host letterbox mirroring the reference API: returns (img, (r, r), (dw, dh))."""
    h, w = img.shape[:2]
    nh, nw, dw, dh, r = letterbox_shape(h, w, new_shape)
    out = resize_bilinear_np(img, (nh, nw))
    if img.ndim == 3:
        out = np.pad(out, ((0, dh), (0, dw), (0, 0)))
    else:
        out = np.pad(out, ((0, dh), (0, dw)))
    return out, (r, r), (dw, dh)


def resize_bilinear_fast(img: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Fast host bilinear resize.

    Upscales go through PIL's SIMD path (identical sampling convention,
    within ±1 uint8 level of cv2); downscales use the exact gather-based
    implementation (PIL antialiases downscales, cv2/this framework do not).
    """
    h, w = img.shape[:2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return img.copy()
    if oh >= h and ow >= w and img.dtype == np.uint8:
        from PIL import Image

        return np.asarray(Image.fromarray(img).resize((ow, oh), Image.BILINEAR))
    return resize_bilinear_np(img, out_hw)


def resize_keepasp_np(img: np.ndarray, max_size: int, fast: bool = False) -> np.ndarray:
    """Aspect-keeping resize (reference resize_keepasp, imgproc_utils.py:119).

    ``fast=True`` routes uint8 images through PIL's SIMD resampler (the
    training loaders use it on this 1-vCPU host; inference keeps the exact
    path)."""
    h, w = img.shape[:2]
    r = min(max_size / h, max_size / w)
    out_hw = (int(round(h * r)), int(round(w * r)))
    if fast and img.dtype == np.uint8:
        from PIL import Image

        return np.asarray(Image.fromarray(img).resize((out_hw[1], out_hw[0]), Image.BILINEAR))
    return resize_bilinear_np(img, out_hw)


def letterbox_fast_np(img: np.ndarray, new_shape) -> Tuple[np.ndarray, Tuple[float, float], Tuple[int, int]]:
    """Letterbox with PIL resampling (training-loader speed path)."""
    h, w = img.shape[:2]
    nh, nw, dw, dh, r = letterbox_shape(h, w, new_shape)
    if img.dtype == np.uint8:
        from PIL import Image

        out = np.asarray(Image.fromarray(img).resize((nw, nh), Image.BILINEAR))
    else:
        out = resize_bilinear_np(img, (nh, nw))
    pad = ((0, dh), (0, dw), (0, 0)) if img.ndim == 3 else ((0, dh), (0, dw))
    return np.pad(out, pad), (r, r), (dw, dh)


def letterbox_device_u8(img_u8: jax.Array, new_shape: int) -> jax.Array:
    """uint8 (H,W,3) -> uint8 (new,new,3): resize + bottom/right zero-pad,
    staying in uint8 so the letterboxed page can feed both the net (after
    /255) and the device mask-refinement windows."""
    h, w = img_u8.shape[0], img_u8.shape[1]
    nh, nw, dw, dh, _ = letterbox_shape(h, w, new_shape)
    x = resize_cv2exact_u8(img_u8, (nh, nw))
    return jnp.pad(x, ((0, dh), (0, dw), (0, 0)))
