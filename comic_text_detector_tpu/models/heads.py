"""UNet mask head and DBNet text-line head (flax.linen, NHWC).

Functional re-design of the reference heads (basemodel.py: UnetHead :47,
DBHead :83, double_conv_up_c3 :21, double_conv_c3 :34).  Channel plumbing is
identical (so torch checkpoints convert 1:1); execution is JAX/NHWC with
torch-exact ConvTranspose semantics (ops/nn.py).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from comic_text_detector_tpu.constants import TEXTDET_DET, TEXTDET_MASK
from comic_text_detector_tpu.models.blocks import (
    BatchNorm,
    C3,
    Conv2d,
    ConvTranspose2d,
)
from comic_text_detector_tpu.ops import nn as tnn

Dtype = Any

# Head BatchNorms are plain torch defaults (eps=1e-5, momentum=0.1), unlike
# the yolo graph whose BNs get eps=1e-3 via initialize_weights.
_BN_EPS = 1e-5
_BN_MOM = 0.1


class DoubleConvUpC3(nn.Module):
    """C3 -> ConvTranspose(x2) -> BN -> ReLU (reference double_conv_up_c3)."""

    mid_ch: int
    out_ch: int
    act: str = "leaky"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = C3(self.mid_ch, n=1, act=self.act, dtype=self.dtype, name="c3")(x, train)
        y = ConvTranspose2d(self.out_ch, k=4, s=2, p=1, use_bias=False, dtype=self.dtype, name="up")(y)
        y = BatchNorm(eps=_BN_EPS, momentum=_BN_MOM, dtype=self.dtype, name="bn")(y, train)
        return jax.nn.relu(y)


class DoubleConvC3(nn.Module):
    """AvgPool(stride) -> C3 (reference double_conv_c3)."""

    out_ch: int
    stride: int = 1
    act: str = "leaky"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.stride > 1:
            x = tnn.avg_pool2d(x, 2, 2)
        return C3(self.out_ch, n=1, act=self.act, dtype=self.dtype, name="c3")(x, train)


class UnetHead(nn.Module):
    """U-Net decoder over the 5 backbone taps -> full-res sigmoid text mask.

    Mirrors reference UnetHead.forward (basemodel.py:62-78): DET mode stops
    at u40 and returns (f80, f40, u40) for the DB head; MASK/INFERENCE modes
    decode to a 1-channel mask at input resolution.
    """

    act: str = "leaky"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        f160: jax.Array,
        f80: jax.Array,
        f40: jax.Array,
        f20: jax.Array,
        f3: jax.Array,
        forward_mode: int = TEXTDET_MASK,
        train: bool = False,
    ):
        d10 = DoubleConvC3(512, stride=2, act=self.act, dtype=self.dtype, name="down_conv1")(f3, train)
        u20 = DoubleConvUpC3(512, 256, act=self.act, dtype=self.dtype, name="upconv0")(d10, train)
        u40 = DoubleConvUpC3(512, 256, act=self.act, dtype=self.dtype, name="upconv2")(
            jnp.concatenate([f20, u20], axis=-1), train
        )
        if forward_mode == TEXTDET_DET:
            return f80, f40, u40
        u80 = DoubleConvUpC3(512, 256, act=self.act, dtype=self.dtype, name="upconv3")(
            jnp.concatenate([f40, u40], axis=-1), train
        )
        u160 = DoubleConvUpC3(256, 128, act=self.act, dtype=self.dtype, name="upconv4")(
            jnp.concatenate([f80, u80], axis=-1), train
        )
        u320 = DoubleConvUpC3(128, 64, act=self.act, dtype=self.dtype, name="upconv5")(
            jnp.concatenate([f160, u160], axis=-1), train
        )
        mask = ConvTranspose2d(1, k=4, s=2, p=1, use_bias=False, dtype=self.dtype, name="upconv6")(u320)
        mask = jax.nn.sigmoid(mask.astype(jnp.float32))
        if forward_mode == TEXTDET_MASK:
            return mask
        return mask, (f80, f40, u40)


class _ConvBNReLU(nn.Module):
    """1x1 conv + BN + ReLU projection (DBHead.conv, basemodel.py:90-94)."""

    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = Conv2d(self.out_ch, 1, use_bias=True, dtype=self.dtype, name="seq0")(x)
        y = BatchNorm(eps=_BN_EPS, momentum=_BN_MOM, dtype=self.dtype, name="seq1")(y, train)
        return jax.nn.relu(y)


class _BinarizeTower(nn.Module):
    """conv3x3 -> BN -> ReLU -> ConvT(x2) -> BN -> ReLU -> ConvT(x2) -> 1ch.

    Mirrors DBHead.binarize (basemodel.py:95-103). ``conv_bias`` covers the
    difference between the binarize tower (bias=True) and the thresh tower
    (bias=False on conv layers, basemodel.py:130-143).
    """

    in_ch: int
    conv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c4 = self.in_ch // 4
        y = Conv2d(c4, 3, p=1, use_bias=self.conv_bias, dtype=self.dtype, name="seq0")(x)
        y = BatchNorm(eps=_BN_EPS, momentum=_BN_MOM, dtype=self.dtype, name="seq1")(y, train)
        y = jax.nn.relu(y)
        y = ConvTranspose2d(c4, k=2, s=2, p=0, use_bias=True, dtype=self.dtype, name="seq3")(y)
        y = BatchNorm(eps=_BN_EPS, momentum=_BN_MOM, dtype=self.dtype, name="seq4")(y, train)
        y = jax.nn.relu(y)
        return ConvTranspose2d(1, k=2, s=2, p=0, use_bias=True, dtype=self.dtype, name="seq6")(y)


class DBHead(nn.Module):
    """DBNet head: shrink (prob) map + threshold map + differentiable
    binarization ``1/(1+exp(-k(x-y)))``, k=50 (reference DBHead,
    basemodel.py:83-160).

    Owns its private copies of upconv3/upconv4 (grafted from a trained
    UnetHead at train time, basemodel.py:186-189).

    Eval returns (B,H,W,2) = cat(shrink, thresh); train returns
    (B,H,W,3) = cat(shrink, thresh, binary) or (B,H,W,4) with raw logits
    appended when ``shrink_with_sigmoid=False`` (basemodel.py:115-120).
    """

    in_channels: int = 64
    k: float = 50.0
    shrink_with_sigmoid: bool = True
    act: str = "leaky"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        f80: jax.Array,
        f40: jax.Array,
        u40: jax.Array,
        train: bool = False,
        step_eval: bool = False,
    ) -> jax.Array:
        u80 = DoubleConvUpC3(512, 256, act=self.act, dtype=self.dtype, name="upconv3")(
            jnp.concatenate([f40, u40], axis=-1), train
        )
        x = DoubleConvUpC3(256, 128, act=self.act, dtype=self.dtype, name="upconv4")(
            jnp.concatenate([f80, u80], axis=-1), train
        )
        x = _ConvBNReLU(self.in_channels, dtype=self.dtype, name="conv")(x, train)
        thresh = jax.nn.sigmoid(
            _BinarizeTower(self.in_channels, conv_bias=False, dtype=self.dtype, name="thresh")(x, train).astype(
                jnp.float32
            )
        )
        logits = _BinarizeTower(self.in_channels, conv_bias=True, dtype=self.dtype, name="binarize")(
            x, train
        ).astype(jnp.float32)
        shrink = jax.nn.sigmoid(logits)

        if train:
            binary = self.step_function(shrink, thresh)
            outs = [shrink, thresh, binary]
            if not self.shrink_with_sigmoid:
                outs.append(logits)
            return jnp.concatenate(outs, axis=-1)
        if step_eval:
            return self.step_function(shrink, thresh)
        return jnp.concatenate([shrink, thresh], axis=-1)

    def step_function(self, x: jax.Array, y: jax.Array) -> jax.Array:
        return 1.0 / (1.0 + jnp.exp(-self.k * (x - y)))
