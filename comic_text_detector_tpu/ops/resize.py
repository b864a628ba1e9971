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
    x = resize_bilinear(img_u8.astype(jnp.float32), (nh, nw))
    x = jnp.clip(jnp.round(x), 0, 255)  # match the uint8 quantization cv2 applies
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
    x = resize_bilinear(img_u8.astype(jnp.float32), (nh, nw))
    x = jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)
    return jnp.pad(x, ((0, dh), (0, dw), (0, 0)))
