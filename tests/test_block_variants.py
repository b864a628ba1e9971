"""Parity for the YOLOv5 block-variant zoo (reference common.py:58-266):
Ghost/DWConv, Transformer blocks, C3TR/C3SPP/C3Ghost, BottleneckCSP,
Contract/Expand — built from a checkpoint-style cfg through parse_graph and
compared against the executed reference Model layer graph."""

import numpy as np
import pytest

import jax.numpy as jnp

from comic_text_detector_tpu.config import full_spec, parse_graph
from comic_text_detector_tpu.models.convert import convert_state_dict
from comic_text_detector_tpu.models.yolo import YoloGraph

from tests import oracles


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


# A compact graph touching every variant block; channel counts stay multiples
# of 8 (make_divisible) and C3TR's hidden dim divides its 4 attention heads.
VARIANT_CFG = {
    "nc": 2,
    "ch": 3,
    "depth_multiple": 1.0,
    "width_multiple": 1.0,
    "anchors": [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119]],
    "backbone": [
        [-1, 1, "Conv", [8, 3, 2]],          # 0  /2
        [-1, 1, "GhostConv", [16, 3, 2]],    # 1  /4
        [-1, 1, "C3Ghost", [16]],            # 2
        [-1, 1, "DWConv", [24, 3, 2]],       # 3  /8
        [-1, 1, "BottleneckCSP", [24]],      # 4
        [-1, 1, "GhostBottleneck", [24, 3, 1]],  # 5
        [-1, 1, "Contract", [2]],            # 6  /16, 96ch
        [-1, 1, "Expand", [2]],              # 7  /8, 24ch
        [-1, 1, "Conv", [32, 3, 2]],         # 8  /16
        [-1, 1, "C3TR", [32]],               # 9
        [-1, 1, "C3SPP", [32, [3, 5, 7]]],   # 10
    ],
    "head": [
        [[5, 10], 1, "Detect", ["nc", "anchors"]],
    ],
}


@pytest.mark.parametrize("act", ["silu", "leaky"])
def test_variant_graph_matches_reference(act):
    import torch

    oracles.load_reference()
    from models.yolov5.yolo import Model  # type: ignore

    torch.manual_seed(7)
    tcfg = oracles.torch_cfg(VARIANT_CFG)
    tm = Model(tcfg, act=act).float().eval() if _model_takes_act() else Model(tcfg).float().eval()
    if act == "leaky":
        _swap_act_leaky(tm)
    oracles._randomize_bn(tm, seed=7)
    tm.out_indices = [3, 10]

    x = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        (dets, _raw), taps = tm(x, detect=True)

    variables = convert_state_dict(tm.state_dict())
    model = YoloGraph(spec=full_spec(VARIANT_CFG), out_indices=(3, 10), act=act)
    jdets, jtaps = model.apply(variables, jnp.asarray(_nhwc(x)), detect=True)

    assert jdets.shape == tuple(dets.shape)
    np.testing.assert_allclose(np.asarray(jdets), dets.numpy(), rtol=2e-4, atol=2e-3)
    for g, r in zip(jtaps, taps):
        np.testing.assert_allclose(np.asarray(g), _nhwc(r), rtol=5e-4, atol=2e-3)


def _model_takes_act() -> bool:
    import inspect

    from models.yolov5.yolo import Model  # type: ignore

    return "act" in inspect.signature(Model.__init__).parameters


def _swap_act_leaky(tm) -> None:
    """Give every Conv module a leaky act, as a cfg-with-act='leaky' build
    would (reference common.py:38-40); composite blocks that hardcode their
    join activation (BottleneckCSP's SiLU) keep it in both frameworks."""
    import torch.nn as nn

    from models.yolov5.common import Conv  # type: ignore

    for m in tm.modules():
        if isinstance(m, Conv) and isinstance(m.act, nn.SiLU):
            m.act = nn.LeakyReLU(0.1, inplace=True)  # act=False convs stay Identity


def test_parse_graph_variant_channels():
    spec = parse_graph(VARIANT_CFG)
    by_idx = {ls.index: ls for ls in spec.layers}
    assert by_idx[2].module == "C3Ghost" and by_idx[2].args[2] == 1  # n inserted
    assert by_idx[4].module == "BottleneckCSP" and by_idx[4].args[2] == 1
    assert by_idx[6].c_out == 24 * 4  # Contract gain^2
    assert by_idx[7].c_out == 24  # Expand undoes it
    assert by_idx[10].module == "C3SPP" and len(by_idx[10].args) > 2
