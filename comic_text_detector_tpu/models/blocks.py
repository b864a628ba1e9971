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


# ---------------------------------------------------------------------------
# Block variants (reference common.py:58-266).  Unused by the deployed
# comictextdetector config, but parse_model can build them from any
# checkpoint-embedded yaml, so arbitrary yolov5 ckpts load here too.
# Param naming matches torch module paths through models/convert.py.
# ---------------------------------------------------------------------------


class TorchLinear(nn.Module):
    """Linear layer with torch's (out, in) kernel layout so checkpoint
    matrices convert verbatim."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (self.features, x.shape[-1]),
            jnp.float32,
        )
        y = x.astype(self.dtype) @ kernel.T.astype(self.dtype)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32).astype(
                self.dtype
            )
        return y


class TorchMultiheadAttention(nn.Module):
    """torch nn.MultiheadAttention with packed in_proj (batch-first inputs).

    Parameters mirror torch's state dict: ``in_proj_weight`` (3C, C),
    ``in_proj_bias`` (3C,), ``out_proj``.{kernel, bias}.
    """

    embed: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
        c, h = self.embed, self.num_heads
        d = c // h
        w = self.param(
            "in_proj_weight",
            nn.initializers.variance_scaling(1.0, "fan_avg", "uniform"),
            (3 * c, c),
            jnp.float32,
        ).astype(self.dtype)
        b = self.param("in_proj_bias", nn.initializers.zeros, (3 * c,), jnp.float32).astype(self.dtype)

        def proj(x, i):
            return x.astype(self.dtype) @ w[i * c:(i + 1) * c].T + b[i * c:(i + 1) * c]

        def heads(x):  # (B, L, C) -> (B, h, L, d)
            bsz, length, _ = x.shape
            return x.reshape(bsz, length, h, d).transpose(0, 2, 1, 3)

        qh = heads(proj(q, 0)) * (d ** -0.5)
        kh, vh = heads(proj(k, 1)), heads(proj(v, 2))
        attn = jax.nn.softmax((qh @ kh.transpose(0, 1, 3, 2)).astype(jnp.float32), axis=-1)
        out = (attn.astype(self.dtype) @ vh).transpose(0, 2, 1, 3)
        out = out.reshape(out.shape[0], out.shape[1], c)
        return TorchLinear(c, dtype=self.dtype, name="out_proj")(out)


class TransformerLayer(nn.Module):
    """Pre-projection attention + 2-layer MLP, both residual, no LayerNorm
    (reference common.py:58-73).  Operates on (B, L, C)."""

    c: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        q = TorchLinear(self.c, use_bias=False, dtype=self.dtype, name="q")(x)
        k = TorchLinear(self.c, use_bias=False, dtype=self.dtype, name="k")(x)
        v = TorchLinear(self.c, use_bias=False, dtype=self.dtype, name="v")(x)
        x = TorchMultiheadAttention(self.c, self.num_heads, dtype=self.dtype, name="ma")(q, k, v) + x
        y = TorchLinear(self.c, use_bias=False, dtype=self.dtype, name="fc1")(x)
        return TorchLinear(self.c, use_bias=False, dtype=self.dtype, name="fc2")(y) + x


class TransformerBlock(nn.Module):
    """ViT-style block over flattened spatial positions with a learned
    position embedding (reference common.py:75-91)."""

    c2: int
    num_heads: int
    num_layers: int
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if x.shape[-1] != self.c2:
            x = ConvBnAct(self.c2, 1, 1, act=self.act, dtype=self.dtype, name="conv")(x, train)
        bsz, hh, ww, c = x.shape
        p = x.reshape(bsz, hh * ww, c)  # row-major == torch flatten(2) order
        p = p + TorchLinear(c, dtype=self.dtype, name="linear")(p)
        for i in range(self.num_layers):
            p = TransformerLayer(c, self.num_heads, dtype=self.dtype, name=f"tr_{i}")(p)
        return p.reshape(bsz, hh, ww, c)


class GhostConv(nn.Module):
    """Primary conv + cheap depthwise expansion (reference common.py:212)."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = self.c2 // 2
        y = ConvBnAct(c_, self.k, self.s, g=self.g, act=self.act, dtype=self.dtype, name="cv1")(x, train)
        y2 = ConvBnAct(c_, 5, 1, g=c_, act=self.act, dtype=self.dtype, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class _GhostMain(nn.Module):
    """GhostBottleneck main path: pw GhostConv, optional dw stride conv,
    linear pw GhostConv (torch Sequential -> seq0/seq1/seq2 names)."""

    c2: int
    k: int
    s: int
    act: str
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, act=self.act, dtype=self.dtype, name="seq0")(x, train)
        if self.s == 2:
            y = ConvBnAct(c_, self.k, self.s, g=c_, act="identity", dtype=self.dtype, name="seq1")(y, train)
        return GhostConv(self.c2, 1, 1, act="identity", dtype=self.dtype, name="seq2")(y, train)


class _GhostShortcut(nn.Module):
    """GhostBottleneck stride-2 shortcut: dw conv + pw conv, linear."""

    c2: int
    k: int
    s: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c1 = x.shape[-1]
        y = ConvBnAct(c1, self.k, self.s, g=c1, act="identity", dtype=self.dtype, name="seq0")(x, train)
        return ConvBnAct(self.c2, 1, 1, act="identity", dtype=self.dtype, name="seq1")(y, train)


class GhostBottleneck(nn.Module):
    """GhostNet bottleneck (reference common.py:224)."""

    c2: int
    k: int = 3
    s: int = 1
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = _GhostMain(self.c2, self.k, self.s, self.act, dtype=self.dtype, name="conv")(x, train)
        if self.s == 2:
            return y + _GhostShortcut(self.c2, self.k, self.s, dtype=self.dtype, name="shortcut")(x, train)
        return y + x  # identity shortcut (torch requires c1 == c2 here too)


class BottleneckCSP(nn.Module):
    """CSP bottleneck, v4-style: bare-conv split branches re-joined through a
    standalone BN + SiLU (reference common.py:109-124; the join activation is
    hardcoded SiLU there regardless of the graph act)."""

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
        y1 = Conv2d(c_, 1, 1, use_bias=False, dtype=self.dtype, name="cv3")(y1)
        y2 = Conv2d(c_, 1, 1, use_bias=False, dtype=self.dtype, name="cv2")(x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = BatchNorm(eps=1e-3, momentum=0.03, dtype=self.dtype, name="bn")(y, train)
        y = tnn.silu(y)
        return ConvBnAct(self.c2, 1, 1, act=self.act, dtype=self.dtype, name="cv4")(y, train)


class C3TR(nn.Module):
    """C3 with a TransformerBlock inner stage (reference common.py:141)."""

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
        y1 = TransformerBlock(c_, 4, self.n, act=self.act, dtype=self.dtype, name="m")(y1, train)
        y2 = ConvBnAct(c_, 1, 1, act=self.act, dtype=self.dtype, name="cv2")(x, train)
        return ConvBnAct(self.c2, 1, 1, act=self.act, dtype=self.dtype, name="cv3")(
            jnp.concatenate([y1, y2], axis=-1), train
        )


class C3SPP(nn.Module):
    """C3 with an SPP inner stage (reference common.py:148)."""

    c2: int
    ks: tuple = (5, 9, 13)
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.c2 * self.e)
        y1 = ConvBnAct(c_, 1, 1, act=self.act, dtype=self.dtype, name="cv1")(x, train)
        y1 = SPP(c_, ks=self.ks, act=self.act, dtype=self.dtype, name="m")(y1, train)
        y2 = ConvBnAct(c_, 1, 1, act=self.act, dtype=self.dtype, name="cv2")(x, train)
        return ConvBnAct(self.c2, 1, 1, act=self.act, dtype=self.dtype, name="cv3")(
            jnp.concatenate([y1, y2], axis=-1), train
        )


class C3Ghost(nn.Module):
    """C3 with GhostBottleneck inner stages (reference common.py:156)."""

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
            y1 = GhostBottleneck(c_, act=self.act, dtype=self.dtype, name=f"m_{i}")(y1, train)
        y2 = ConvBnAct(c_, 1, 1, act=self.act, dtype=self.dtype, name="cv2")(x, train)
        return ConvBnAct(self.c2, 1, 1, act=self.act, dtype=self.dtype, name="cv3")(
            jnp.concatenate([y1, y2], axis=-1), train
        )


def contract(x: jax.Array, gain: int = 2) -> jax.Array:
    """Fold space into channels, matching torch Contract's channel order
    (reference common.py:235-245): c' = (s1 * gain + s2) * C + c."""
    b, h, w, c = x.shape
    s = gain
    y = x.reshape(b, h // s, s, w // s, s, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, h // s, w // s, s * s * c)


def expand(x: jax.Array, gain: int = 2) -> jax.Array:
    """Unfold channels into space, inverse channel order of torch Expand
    (reference common.py:248-258)."""
    b, h, w, c = x.shape
    s = gain
    y = x.reshape(b, h, w, s, s, c // (s * s))
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, h * s, w * s, c // (s * s))
