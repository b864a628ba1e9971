"""NN building blocks (flax.linen, NHWC) for the YOLOv5-style graph.

Functional re-design of the block zoo the reference uses
(models/yolov5/common.py: Conv :30, Bottleneck :94, C3 :126, SPP :165,
SPPF :181, Focus :199).  Semantics (channel math, shortcut rules, pooling
windows, activation choices) are identical so torch checkpoints convert
weight-for-weight; the implementation is JAX/NHWC from scratch.

BatchNorm follows torch conventions (biased batch variance for
normalization, unbiased for the running estimate, torch-style momentum) so
training dynamics and converted running stats match.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from comic_text_detector_tpu.ops import nn as tnn

Dtype = Any


class Conv2d(nn.Module):
    """Bare convolution, torch-compatible padding. Params: kernel (HWIO), bias."""

    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c1 = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal"),
            (self.k, self.k, c1 // self.g, self.c2),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.c2,), jnp.float32)
            if self.use_bias
            else None
        )
        return tnn.conv2d(
            x.astype(self.dtype),
            kernel,
            bias,
            stride=self.s,
            padding=tnn.autopad(self.k, self.p),
            groups=self.g,
        )


class ConvTranspose2d(nn.Module):
    """Transposed convolution. Kernel stored HWIO (already-converted layout)."""

    c2: int
    k: int = 2
    s: int = 2
    p: int = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c1 = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (self.k, self.k, c1, self.c2),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.c2,), jnp.float32)
            if self.use_bias
            else None
        )
        return tnn.conv_transpose2d(x.astype(self.dtype), kernel, bias, stride=self.s, padding=self.p)


class BatchNorm(nn.Module):
    """torch-convention BatchNorm2d over the channel (last) axis.

    ``momentum`` is the torch momentum (update fraction of the new batch
    statistic).  Running stats live in the ``batch_stats`` collection.
    """

    eps: float = 1e-5
    momentum: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2))  # biased
            n = x.shape[0] * x.shape[1] * x.shape[2]
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
            inv = jax.lax.rsqrt(var + self.eps) * scale
            y = (xf - mean) * inv + bias
            return y.astype(x.dtype)
        return tnn.batch_norm_inference(x, scale, bias, ra_mean.value, ra_var.value, self.eps)


class ConvBnAct(nn.Module):
    """Conv + BatchNorm + activation (reference common.py:30 ``Conv``)."""

    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    act: str = "silu"
    bn_eps: float = 1e-3  # reference initialize_weights sets eps=1e-3 on the yolo graph
    bn_momentum: float = 0.03
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = Conv2d(self.c2, self.k, self.s, self.p, self.g, use_bias=False, dtype=self.dtype, name="conv")(x)
        y = BatchNorm(eps=self.bn_eps, momentum=self.bn_momentum, dtype=self.dtype, name="bn")(y, train)
        return tnn.ACTIVATIONS[self.act](y)


class Bottleneck(nn.Module):
    """Standard bottleneck (reference common.py:94)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = ConvBnAct(c_, 1, 1, act=self.act, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBnAct(self.c2, 3, 1, g=self.g, act=self.act, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and c1 == self.c2 else y


class C3(nn.Module):
    """CSP bottleneck with 3 convolutions (reference common.py:126)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.c2 * self.e)
        y1 = ConvBnAct(c_, 1, 1, act=self.act, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.g, e=1.0, act=self.act, dtype=self.dtype, name=f"m_{i}")(
                y1, train
            )
        y2 = ConvBnAct(c_, 1, 1, act=self.act, dtype=self.dtype, name="cv2")(x, train)
        return ConvBnAct(self.c2, 1, 1, act=self.act, dtype=self.dtype, name="cv3")(
            jnp.concatenate([y1, y2], axis=-1), train
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling - fast (reference common.py:181)."""

    c2: int
    k: int = 5
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c1 = x.shape[-1]
        c_ = c1 // 2
        y = ConvBnAct(c_, 1, 1, act=self.act, dtype=self.dtype, name="cv1")(x, train)
        p1 = tnn.max_pool2d(y, self.k, 1, self.k // 2)
        p2 = tnn.max_pool2d(p1, self.k, 1, self.k // 2)
        p3 = tnn.max_pool2d(p2, self.k, 1, self.k // 2)
        return ConvBnAct(self.c2, 1, 1, act=self.act, dtype=self.dtype, name="cv2")(
            jnp.concatenate([y, p1, p2, p3], axis=-1), train
        )


class SPP(nn.Module):
    """Spatial pyramid pooling (reference common.py:165)."""

    c2: int
    ks: tuple = (5, 9, 13)
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = x.shape[-1] // 2
        y = ConvBnAct(c_, 1, 1, act=self.act, dtype=self.dtype, name="cv1")(x, train)
        pools = [tnn.max_pool2d(y, k, 1, k // 2) for k in self.ks]
        return ConvBnAct(self.c2, 1, 1, act=self.act, dtype=self.dtype, name="cv2")(
            jnp.concatenate([y] + pools, axis=-1), train
        )


class Focus(nn.Module):
    """Space-to-depth stem (reference common.py:199), NHWC slicing order
    matches torch's [::2,::2], [1::2,::2], [::2,1::2], [1::2,1::2]."""

    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        parts = [
            x[:, ::2, ::2, :],
            x[:, 1::2, ::2, :],
            x[:, ::2, 1::2, :],
            x[:, 1::2, 1::2, :],
        ]
        return ConvBnAct(self.c2, self.k, self.s, self.p, self.g, act=self.act, dtype=self.dtype, name="conv")(
            jnp.concatenate(parts, axis=-1), train
        )
