"""NHWC neural-net primitives with torch-compatible semantics.

All tensors are NHWC (TPU-native layout; channels ride the 128-lane axis).
Kernels are HWIO.  These wrappers pin down the exact padding / dilation
conventions of ``torch.nn.Conv2d`` / ``ConvTranspose2d`` / pooling so
converted checkpoints are numerically identical (unit-tested against torch
in tests/test_nn_ops.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def autopad(k: int, p: Optional[int] = None) -> int:
    """'same' padding for odd kernels (reference models/yolov5/common.py:24)."""
    return k // 2 if p is None else p


def conv2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: int = 1,
    padding: int = 0,
    groups: int = 1,
) -> jax.Array:
    """torch.nn.functional.conv2d equivalent, NHWC x HWIO -> NHWC."""
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=dn,
        feature_group_count=groups,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv_transpose2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: int = 2,
    padding: int = 0,
) -> jax.Array:
    """torch.nn.functional.conv_transpose2d equivalent.

    ``kernel`` is HWIO where I = input channels (i.e. already converted from
    torch's (I, O, kh, kw) layout by flipping spatial dims and transposing;
    see models/convert.py).  Implemented as an input-dilated convolution:
    lhs_dilation=stride with per-side padding ``k - 1 - padding``.
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    return_bias = bias is not None
    y = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding=[(kh - 1 - padding, kh - 1 - padding), (kw - 1 - padding, kw - 1 - padding)],
        lhs_dilation=(stride, stride),
        dimension_numbers=dn,
    )
    if return_bias:
        y = y + bias.astype(y.dtype)
    return y


def torch_convt_kernel_to_hwio(w) -> jnp.ndarray:
    """(I, O, kh, kw) torch ConvTranspose2d weight -> HWIO conv kernel.

    The equivalent forward convolution uses the spatially flipped kernel with
    input/output channels swapped relative to a normal conv.
    """
    w = jnp.asarray(w)
    # (I, O, kh, kw) -> (kh, kw, I, O), then flip spatial dims.
    w = jnp.transpose(w, (2, 3, 0, 1))
    return w[::-1, ::-1]


def torch_conv_kernel_to_hwio(w) -> jnp.ndarray:
    """(O, I/g, kh, kw) torch Conv2d weight -> HWIO."""
    w = jnp.asarray(w)
    return jnp.transpose(w, (2, 3, 1, 0))


def max_pool2d(x: jax.Array, k: int, stride: int = 1, padding: int = 0) -> jax.Array:
    """torch.nn.MaxPool2d(k, stride, padding) on NHWC."""
    # -inf (not finfo.min) so JAX lowers to the differentiable
    # reduce_window_max primitive — needed when the backbone trains
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        neg,
        lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding=[(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )


def avg_pool2d(x: jax.Array, k: int, stride: int) -> jax.Array:
    """torch.nn.AvgPool2d(k, stride) on NHWC (no padding)."""
    # literal 0 init so JAX lowers to the differentiable reduce_window_sum
    y = lax.reduce_window(
        x,
        0.0 if jnp.issubdtype(x.dtype, jnp.floating) else 0,
        lax.add,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )
    return y / jnp.asarray(k * k, x.dtype)


def upsample_nearest2x(x: jax.Array) -> jax.Array:
    """torch.nn.Upsample(scale_factor=2, mode='nearest') on NHWC."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def leaky_relu(x: jax.Array, slope: float = 0.1) -> jax.Array:
    return jnp.where(x >= 0, x, x * jnp.asarray(slope, x.dtype))


ACTIVATIONS = {
    "silu": silu,
    "leaky": leaky_relu,
    "relu": jax.nn.relu,
    "identity": lambda x: x,
}


def batch_norm_inference(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    eps: float,
) -> jax.Array:
    """Eval-mode BatchNorm as a single fused multiply-add (folds into the
    preceding conv's epilogue under XLA)."""
    inv = lax.rsqrt(var.astype(jnp.float32) + eps) * scale.astype(jnp.float32)
    b = bias.astype(jnp.float32) - mean.astype(jnp.float32) * inv
    return x * inv.astype(x.dtype) + b.astype(x.dtype)
