"""Bit-packing for 1-bpp mask transfers.

``jnp.packbits(x, axis=-1)`` reshapes the minor axis to (..., W/8, 8) and
reduces over the 8-element axis — an 8-lane minor dimension, the worst TPU
layout (measured 28 ms for a 1654x1170 canvas pack, profile_page r4).  The
strided-slice formulation below keeps the lane dimension W/8-wide: eight
(..., W/8) slices combined with shifts on the VPU.

Output is byte-identical to np.packbits/jnp.packbits (MSB-first, zero-pad
to a byte boundary), which the host unpacks with np.unpackbits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def packbits_rows(bits: jax.Array) -> jax.Array:
    """(..., W) bool/int -> (..., ceil(W/8)) uint8, MSB-first per byte."""
    w = bits.shape[-1]
    pad = (-w) % 8
    if pad:
        bits = jnp.pad(bits, [(0, 0)] * (bits.ndim - 1) + [(0, pad)])
    x = (bits != 0).astype(jnp.int32)
    acc = x[..., 0::8] << 7
    for k in range(1, 8):
        acc = acc | (x[..., k::8] << (7 - k))
    return acc.astype(jnp.uint8)
