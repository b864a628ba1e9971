"""Config-driven YOLOv5-style graph + Detect decode (JAX/NHWC).

TPU-first re-design of the reference's ``Model``/``parse_model``/``Detect``
(models/yolov5/yolo.py:7-259): the graph spec is resolved statically
(config.parse_graph), the forward is a single traced pass with Python-level
layer iteration (unrolled at trace time, no dynamic control flow), and the
anchor-decode is fully vectorized with grids built at trace time from static
shapes.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from comic_text_detector_tpu.config import OUT_INDICES, GraphSpec
from comic_text_detector_tpu.models import blocks
from comic_text_detector_tpu.ops import nn as tnn

Dtype = Any


class Detect(nn.Module):
    """Per-level 1x1 prediction convs + anchor decode.

    Matches the reference Detect (models/yolov5/yolo.py:23-44): output rows
    are ordered (level, anchor, row, col); xy/wh use the v5 decode
    ``xy = (2σ-0.5+grid)·stride``, ``wh = (2σ)²·anchor``.
    """

    nc: int
    anchors: Tuple[Tuple[float, ...], ...]  # pixel units per level
    strides: Tuple[int, ...] = (8, 16, 32)
    dtype: Dtype = jnp.float32

    @property
    def na(self) -> int:
        return len(self.anchors[0]) // 2

    @property
    def no(self) -> int:
        return self.nc + 5

    @nn.compact
    def __call__(
        self, feats: Sequence[jax.Array], decode: bool = True
    ) -> Tuple[Optional[jax.Array], List[jax.Array]]:
        """Returns (decoded (B, Σ na·h·w, no) or None, raw per-level maps).

        Raw maps are (B, na, h, w, no) — the layout the training loss uses.
        """
        na, no = self.na, self.no
        raw: List[jax.Array] = []
        decoded: List[jax.Array] = []
        for i, f in enumerate(feats):
            p = blocks.Conv2d(no * na, 1, use_bias=True, dtype=self.dtype, name=f"m_{i}")(f)
            b, h, w, _ = p.shape
            # (b,h,w,na*no) -> (b,na,h,w,no) to match torch's row ordering.
            p = p.reshape(b, h, w, na, no).transpose(0, 3, 1, 2, 4)
            raw.append(p)
            if decode:
                y = jax.nn.sigmoid(p.astype(jnp.float32))
                gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
                grid = jnp.stack([gx, gy], axis=-1)[None, None]  # (1,1,h,w,2)
                anc = jnp.asarray(self.anchors[i], jnp.float32).reshape(1, na, 1, 1, 2)
                xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * float(self.strides[i])
                wh = jnp.square(y[..., 2:4] * 2.0) * anc
                y = jnp.concatenate([xy, wh, y[..., 4:]], axis=-1)
                decoded.append(y.reshape(b, na * h * w, no))
        out = jnp.concatenate(decoded, axis=1) if decode else None
        return out, raw


def _build_layer(spec, act: str, dtype) -> Optional[nn.Module]:
    """Instantiate the linen module for one LayerSpec (None for stateless ops)."""
    name = f"model_{spec.index}"
    m, a = spec.module, spec.args
    if m == "Conv":
        # args: (c1, c2, k[, s[, p[, g]]])
        k = a[2] if len(a) > 2 else 1
        s = a[3] if len(a) > 3 else 1
        p = a[4] if len(a) > 4 else None
        return blocks.ConvBnAct(a[1], k, s, p, act=act, dtype=dtype, name=name)
    if m == "C3":
        # args: (c1, c2, n[, shortcut])
        shortcut = a[3] if len(a) > 3 else True
        return blocks.C3(a[1], n=a[2], shortcut=shortcut, act=act, dtype=dtype, name=name)
    if m == "SPPF":
        return blocks.SPPF(a[1], k=a[2] if len(a) > 2 else 5, act=act, dtype=dtype, name=name)
    if m == "SPP":
        return blocks.SPP(a[1], ks=tuple(a[2]) if len(a) > 2 else (5, 9, 13), act=act, dtype=dtype, name=name)
    if m == "Focus":
        k = a[2] if len(a) > 2 else 1
        return blocks.Focus(a[1], k, act=act, dtype=dtype, name=name)
    if m == "Bottleneck":
        return blocks.Bottleneck(a[1], act=act, dtype=dtype, name=name)
    if m == "DWConv":
        # depthwise-ish conv: groups = gcd(c1, c2) (reference common.py:52)
        k = a[2] if len(a) > 2 else 1
        s = a[3] if len(a) > 3 else 1
        return blocks.ConvBnAct(a[1], k, s, g=math.gcd(a[0], a[1]), act=act, dtype=dtype, name=name)
    if m == "GhostConv":
        k = a[2] if len(a) > 2 else 1
        s = a[3] if len(a) > 3 else 1
        g = a[4] if len(a) > 4 else 1
        return blocks.GhostConv(a[1], k, s, g=g, act=act, dtype=dtype, name=name)
    if m == "GhostBottleneck":
        k = a[2] if len(a) > 2 else 3
        s = a[3] if len(a) > 3 else 1
        return blocks.GhostBottleneck(a[1], k, s, act=act, dtype=dtype, name=name)
    if m == "BottleneckCSP":
        shortcut = a[3] if len(a) > 3 else True
        return blocks.BottleneckCSP(a[1], n=a[2], shortcut=shortcut, act=act, dtype=dtype, name=name)
    if m == "C3TR":
        shortcut = a[3] if len(a) > 3 else True
        return blocks.C3TR(a[1], n=a[2], shortcut=shortcut, act=act, dtype=dtype, name=name)
    if m == "C3Ghost":
        shortcut = a[3] if len(a) > 3 else True
        return blocks.C3Ghost(a[1], n=a[2], shortcut=shortcut, act=act, dtype=dtype, name=name)
    if m == "C3SPP":
        ks = tuple(a[2]) if len(a) > 2 else (5, 9, 13)
        return blocks.C3SPP(a[1], ks=ks, act=act, dtype=dtype, name=name)
    if m == "BatchNorm2d":
        return blocks.BatchNorm(eps=1e-3, momentum=0.03, dtype=dtype, name=name)
    if m in ("Upsample", "Concat", "Contract", "Expand"):
        return None
    raise ValueError(f"unsupported module {m}")


class YoloGraph(nn.Module):
    """Sequential-with-skips executor of a resolved GraphSpec.

    ``out_indices`` taps intermediate feature maps for the seg/det heads
    (reference Model._forward_once, yolo.py:115-134).
    """

    spec: GraphSpec
    out_indices: Tuple[int, ...] = OUT_INDICES
    act: str = "silu"
    dtype: Dtype = jnp.float32

    def setup(self):
        mods: Dict[int, nn.Module] = {}
        for ls in self.spec.layers:
            if ls.module == "Detect":
                mods[ls.index] = Detect(
                    nc=self.spec.nc,
                    anchors=self.spec.anchors,
                    strides=self.spec.strides,
                    dtype=self.dtype,
                    name=f"model_{ls.index}",
                )
            else:
                mod = _build_layer(ls, self.act, self.dtype)
                if mod is not None:
                    mods[ls.index] = mod
        self._mods = mods

    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        detect: bool = False,
        decode: bool = True,
    ):
        """Run the graph.

        Returns:
          - taps list z (if out_indices and not detect)
          - (dets, z) (if detect) where dets is the decoded (B,N,no) tensor
          - final layer output otherwise
        """
        saved: Dict[int, jax.Array] = {}
        z: List[jax.Array] = []
        dets = None
        raw = None
        y = x
        for ls in self.spec.layers:
            if ls.frm != -1:
                if isinstance(ls.frm, tuple):
                    inp = [y if j == -1 else saved[j] for j in ls.frm]
                else:
                    inp = saved[ls.frm]
            else:
                inp = y

            if ls.module == "Concat":
                y = jnp.concatenate(inp, axis=-1)
            elif ls.module == "Upsample":
                y = tnn.upsample_nearest2x(inp)
            elif ls.module == "Contract":
                y = blocks.contract(inp, ls.args[0] if ls.args else 2)
            elif ls.module == "Expand":
                y = blocks.expand(inp, ls.args[0] if ls.args else 2)
            elif ls.module == "Detect":
                dets, raw = self._mods[ls.index](inp, decode=decode)
                y = dets if dets is not None else raw
            else:
                y = self._mods[ls.index](inp, train=train)

            if ls.index in self.spec.save:
                saved[ls.index] = y
            if ls.index in self.out_indices:
                z.append(y)

        if self.out_indices:
            if detect:
                return (dets if decode else raw), z
            return z
        return y


def scale_img(x: jax.Array, ratio: float, gs: int = 32, pad_value: float = 0.447) -> jax.Array:
    """Scale an NHWC batch by ``ratio`` and pad bottom/right to gs multiples
    (reference utils/yolov5_utils.py scale_img :11-21)."""
    if ratio == 1.0:
        return x
    import math

    from comic_text_detector_tpu.ops.resize import resize_bilinear

    n, h, w, c = x.shape
    nh, nw = int(h * ratio), int(w * ratio)
    y = jax.vmap(lambda im: resize_bilinear(im, (nh, nw)))(x)
    ph = math.ceil(h * ratio / gs) * gs
    pw = math.ceil(w * ratio / gs) * gs
    return jnp.pad(y, ((0, 0), (0, ph - nh), (0, pw - nw), (0, 0)), constant_values=pad_value)


def augmented_detect(model: "YoloGraph", variables, x: jax.Array, gs: int = 32) -> jax.Array:
    """Multi-scale + flip test-time-augmented detection
    (reference Model._forward_augment / _descale_pred / _clip_augmented,
    models/yolov5/yolo.py:101-162).  Returns (B, ΣN', no) decoded rows.

    Each scale traces its own static-shape graph — TPU-friendly TTA.
    """
    img_h, img_w = x.shape[1], x.shape[2]
    scales = (1.0, 0.83, 0.67)
    flips = (None, "lr", None)
    outs = []
    for si, fi in zip(scales, flips):
        xi = x[:, :, ::-1, :] if fi == "lr" else x
        xi = scale_img(xi, si, gs=gs)
        dets, _ = model.apply(variables, xi, detect=True)
        xy = dets[..., 0:2] / si
        wh = dets[..., 2:4] / si
        if fi == "lr":
            xy = jnp.stack([img_w - xy[..., 0], xy[..., 1]], axis=-1)
        outs.append(jnp.concatenate([xy, wh, dets[..., 4:]], axis=-1))
    # clip augmented tails (reference _clip_augmented)
    nl = 3
    g = sum(4**k for k in range(nl))
    i0 = (outs[0].shape[1] // g) * 1
    outs[0] = outs[0][:, :-i0]
    i2 = (outs[-1].shape[1] // g) * (4 ** (nl - 1))
    outs[-1] = outs[-1][:, i2:]
    return jnp.concatenate(outs, axis=1)


def initialize_detect_biases(params: dict, spec: GraphSpec, img_size: int = 640) -> dict:
    """Apply the focal-loss-style prior to Detect conv biases
    (reference Model._initialize_biases, yolo.py:170-178). Pure pytree edit."""
    detect_idx = spec.layers[-1].index
    key = f"model_{detect_idx}"
    na = len(spec.anchors[0]) // 2
    nc = spec.nc
    out = jax.tree_util.tree_map(lambda v: v, params)  # shallow-ish copy
    det = dict(out[key])
    for i, s in enumerate(spec.strides):
        sub = dict(det[f"m_{i}"])
        b = jnp.asarray(sub["bias"]).reshape(na, -1)
        b = b.at[:, 4].add(math.log(8 / (img_size / s) ** 2))
        b = b.at[:, 5:].add(math.log(0.6 / (nc - 0.999999)))
        sub["bias"] = b.reshape(-1)
        det[f"m_{i}"] = sub
    out[key] = det
    return out
