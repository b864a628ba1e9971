"""Weight initialization transforms (reference utils/weight_init.py).

Flax modules in this package already initialize with sensible defaults;
these pytree transforms reproduce the reference's explicit init recipe
(init_weights :91-103 — kaiming-normal convs, unit BatchNorm) and the
bilinear transposed-conv kernel (:75-88) for users who want identical
from-scratch starting points.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def bilinear_kernel(in_channels: int, out_channels: int, kernel_size: int) -> np.ndarray:
    """Bilinear-upsampling ConvTranspose kernel in this package's HWIO
    (flipped) layout."""
    factor = (kernel_size + 1) // 2
    center = factor - 1 if kernel_size % 2 == 1 else factor - 0.5
    og = np.arange(kernel_size)
    filt = (1 - np.abs(og[:, None] - center) / factor) * (1 - np.abs(og[None, :] - center) / factor)
    weight = np.zeros((kernel_size, kernel_size, in_channels, out_channels), np.float32)
    for i in range(min(in_channels, out_channels)):
        weight[:, :, i, i] = filt
    return weight[::-1, ::-1].copy()


def kaiming_normal(key, shape, a: float = 0.0, mode: str = "fan_in"):
    """He-normal for HWIO conv kernels with leaky-relu gain (torch
    kaiming_normal_ semantics)."""
    kh, kw, cin, cout = shape
    fan = kh * kw * (cin if mode == "fan_in" else cout)
    gain = np.sqrt(2.0 / (1 + a**2))
    std = gain / np.sqrt(fan)
    return jax.random.normal(key, shape, jnp.float32) * std


def apply_reference_init(params: Dict, rng: jax.Array) -> Dict:
    """Re-initialize a head's param tree the reference way: kaiming-normal
    4-D kernels, zero biases, unit BN scale / zero BN bias."""
    leaves_with_path = jax.tree_util.tree_flatten_with_path(params)[0]
    keys = jax.random.split(rng, len(leaves_with_path))
    flat = {}
    for (path, leaf), key in zip(leaves_with_path, keys):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "kernel" and jnp.ndim(leaf) == 4:
            flat[path] = kaiming_normal(key, leaf.shape)
        elif name == "scale":
            flat[path] = jnp.ones_like(leaf)
        elif name == "bias":
            flat[path] = jnp.zeros_like(leaf)
        else:
            flat[path] = leaf
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(params), list(flat.values()))
