"""Load the reference PyTorch implementation as a numerical oracle.

The reference at /root/reference is executed (never copied) to produce golden
outputs for parity tests — the strategy SURVEY.md §4 prescribes.  Several of
its third-party deps are absent in this image (torchvision, shapely,
pyclipper, torchsummary, wandb, onnx, trdg); we stub just enough for the
modules under test to import.
"""

from __future__ import annotations

import copy
import sys
import types

REF = "/root/reference"


def _stub(name: str, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


class _FakePolygon:
    """Minimal shapely.geometry.Polygon stand-in backed by this framework's
    geometry (convex operations — sufficient for the reference's quads)."""

    def __init__(self, points):
        import numpy as np

        self.pts = np.asarray(points, dtype=float).reshape(-1, 2)

    @property
    def area(self):
        from comic_text_detector_tpu.ops import geometry as geo

        return abs(geo.shoelace_area(self.pts))

    @property
    def length(self):
        from comic_text_detector_tpu.ops import geometry as geo

        return geo.perimeter(self.pts)

    @property
    def is_valid(self):
        return len(self.pts) >= 3 and self.area > 0

    @property
    def is_simple(self):
        return True  # reference quads are simple

    def intersects(self, other):
        from comic_text_detector_tpu.ops import geometry as geo

        return geo.convex_polygons_intersect(self.pts, other.pts)

    def intersection(self, other):
        from comic_text_detector_tpu.ops import geometry as geo

        inter = geo.clip_polygon_convex(self.pts, other.pts)
        return _FakePolygon(inter if len(inter) else [[0, 0], [0, 0], [0, 0]])

    def union(self, other):
        area = self.area + other.area - self.intersection(other).area

        class _U:
            pass

        u = _U()
        u.area = area
        return u


def _greedy_nms_torch(boxes, scores, iou_threshold):
    """torchvision.ops.nms contract: indices of kept boxes, score-descending
    greedy suppression (exact reference semantics)."""
    import numpy as np
    import torch

    b = boxes.detach().cpu().numpy()
    s = scores.detach().cpu().numpy()
    order = np.argsort(-s, kind="stable")
    suppressed = np.zeros(len(b), bool)
    keep = []
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        x1 = np.maximum(b[i, 0], b[:, 0])
        y1 = np.maximum(b[i, 1], b[:, 1])
        x2 = np.minimum(b[i, 2], b[:, 2])
        y2 = np.minimum(b[i, 3], b[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area_i = (b[i, 2] - b[i, 0]) * (b[i, 3] - b[i, 1])
        areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        iou = inter / (area_i + areas - inter + 1e-9)
        suppressed |= iou > iou_threshold
    return torch.as_tensor(keep, dtype=torch.int64)


class _FakePyclipperOffset:
    """pyclipper.PyclipperOffset stand-in backed by this framework's
    round-join polygon offset (ops/geometry.py)."""

    def __init__(self):
        self.path = None

    def AddPath(self, path, join_type=None, end_type=None):
        import numpy as np

        self.path = np.asarray(path, dtype=float).reshape(-1, 2)

    def Execute(self, delta):
        import numpy as np

        from comic_text_detector_tpu.ops import geometry as geo

        out = geo.offset_polygon(self.path, float(delta), arc_step=0.3)
        if len(out) < 3:
            return []
        return [np.round(out).astype(np.int64).tolist()]


_loaded = False


def load_reference():
    """Import the reference modules (basemodel, models.yolov5.*) with stubs."""
    global _loaded
    if _loaded:
        import basemodel  # type: ignore

        return basemodel
    try:
        import pkg_resources  # noqa: F401
    except ImportError:
        class _V:
            def __init__(self, s):
                self.parts = tuple(int(p) for p in s.split(".")[:3] if p.isdigit())

            def __ge__(self, o):
                return self.parts >= o.parts

            def __eq__(self, o):
                return self.parts == o.parts

        _stub("pkg_resources", parse_version=lambda s: _V(s))
    import numpy as _np

    # numpy-2 compat shims for the reference's io_utils aliases
    for name, val in (("bool8", _np.bool_), ("float_", _np.float64), ("int_", _np.int64)):
        if not hasattr(_np, name):
            setattr(_np, name, val)
    _stub("torchsummary", summary=lambda *a, **k: None)
    _stub("wandb", init=lambda **k: None)
    tv = _stub("torchvision")
    tv.ops = _stub("torchvision.ops", nms=_greedy_nms_torch)
    sh = _stub("shapely")
    sh.geometry = _stub("shapely.geometry", Polygon=_FakePolygon)
    _stub("pyclipper", PyclipperOffset=_FakePyclipperOffset, JT_ROUND=2, ET_CLOSEDPOLYGON=1)
    _stub("numexpr", detect_number_of_cores=lambda: 1)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import basemodel  # type: ignore  # noqa: F401

    _loaded = True
    return basemodel


def torch_cfg(cfg: dict) -> dict:
    """Convert this package's cfg dict into the reference parse_model format
    (module names are eval()'d strings there; Upsample is 'nn.Upsample')."""
    out = copy.deepcopy(cfg)
    for section in ("backbone", "head"):
        for row in out[section]:
            if row[2] == "Upsample":
                row[2] = "nn.Upsample"
            if row[2] == "Detect":
                row[3] = ["nc", "anchors"]  # parse_model eval()s these names
    return out


def build_torch_yolo(cfg: dict, seed: int = 0, fuse: bool = False, out_indices=(1, 3, 5, 7, 9)):
    """Instantiate the reference Model with randomized weights+running stats."""
    load_reference()
    import torch
    from models.yolov5.yolo import Model  # type: ignore

    torch.manual_seed(seed)
    model = Model(torch_cfg(cfg))
    model = model.float().eval()
    _randomize_bn(model, seed)
    if fuse:
        model = model.fuse()
    model.out_indices = list(out_indices)
    return model


def _randomize_bn(model, seed: int = 0):
    """Give running stats non-trivial values so mean/var mix-ups fail tests."""
    import torch

    g = torch.Generator().manual_seed(seed + 1)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.75)


def build_torch_unet(act="leaky", seed: int = 0):
    load_reference()
    import torch
    from basemodel import UnetHead  # type: ignore

    torch.manual_seed(seed)
    head = UnetHead(act=act).float().eval()
    _randomize_bn(head, seed)
    return head


def build_torch_dbhead(act="leaky", seed: int = 0, shrink_with_sigmoid=True):
    load_reference()
    import torch
    from basemodel import DBHead  # type: ignore

    torch.manual_seed(seed)
    head = DBHead(64, act=act, shrink_with_sigmoid=shrink_with_sigmoid).float().eval()
    _randomize_bn(head, seed)
    return head
