"""Device-side histogram / threshold primitives (JAX).

The SURVEY §2.3 rebuild plan for the mask-refinement stack: Otsu as a
256-bin histogram reduction + inter-class-variance argmax, plus masked
histograms and band thresholds — the device building blocks for moving
refine_mask's candidate generation on-TPU (host versions live in
utils/imgproc.py and remain the parity-tested default).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def histogram256(img: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """256-bin histogram of a uint8 image, optionally masked. -> (256,) int32."""
    flat = img.reshape(-1).astype(jnp.int32)
    weights = jnp.ones_like(flat)
    if mask is not None:
        weights = mask.reshape(-1).astype(jnp.int32)
    return jnp.zeros(256, jnp.int32).at[flat].add(weights)


@jax.jit
def otsu_threshold(img: jax.Array, mask: jax.Array | None = None):
    """Otsu threshold + binarized (0/255 uint8) map on device.

    Same bin convention as the host implementation (utils/imgproc.py
    otsu_threshold): maximize inter-class variance; output = (img > t)*255.
    """
    hist = histogram256(img, mask).astype(jnp.float32)
    total = jnp.sum(hist)
    idx = jnp.arange(256, dtype=jnp.float32)
    w0 = jnp.cumsum(hist)
    w1 = total - w0
    s0 = jnp.cumsum(hist * idx)
    mu = s0[-1]
    m0 = jnp.where(w0 > 0, s0 / jnp.maximum(w0, 1), 0.0)
    m1 = jnp.where(w1 > 0, (mu - s0) / jnp.maximum(w1, 1), 0.0)
    between = w0 * w1 * jnp.square(m0 - m1)
    t = jnp.argmax(between)
    binary = jnp.where(img > t.astype(img.dtype), jnp.uint8(255), jnp.uint8(0))
    return t, binary


@jax.jit
def in_range(img: jax.Array, low, high) -> jax.Array:
    """cv2.inRange analog on device: inclusive band -> 0/255 uint8."""
    return jnp.where((img >= low) & (img <= high), jnp.uint8(255), jnp.uint8(0))


@jax.jit
def bgr2gray(img: jax.Array) -> jax.Array:
    """cv2 BGR->GRAY weights on device, rounded uint8."""
    g = (
        img[..., 0].astype(jnp.float32) * 0.114
        + img[..., 1].astype(jnp.float32) * 0.587
        + img[..., 2].astype(jnp.float32) * 0.299
    )
    return jnp.clip(jnp.round(g), 0, 255).astype(jnp.uint8)


@jax.jit
def xor_sum(a: jax.Array, b: jax.Array) -> jax.Array:
    """Byte-level XOR sum — the refine-mask greedy objective
    (reference utils/textmask.py:36-37) as a device reduction."""
    return jnp.sum(jnp.bitwise_xor(a, b).astype(jnp.int32))
