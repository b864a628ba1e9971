"""Parity: JAX models vs the reference PyTorch implementation (executed as an
oracle with random weights + randomized BN running stats)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comic_text_detector_tpu.config import OUT_INDICES, YOLOV5S_CFG, backbone_spec, full_spec
from comic_text_detector_tpu.constants import TEXTDET_DET, TEXTDET_INFERENCE, TEXTDET_MASK
from comic_text_detector_tpu.models.convert import convert_state_dict
from comic_text_detector_tpu.models.heads import DBHead, UnetHead
from comic_text_detector_tpu.models.yolo import YoloGraph

from tests import oracles


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _taps(shape=(1, 3, 128, 128), seed=3):
    """Random backbone-tap tensors (torch NCHW + jax NHWC pairs) at /4../32."""
    import torch

    torch.manual_seed(seed)
    n, _, h, w = shape
    chans = [64, 128, 256, 512, 512]
    scales = [4, 8, 16, 32, 32]
    torch_taps = [torch.randn(n, c, h // s, w // s) for c, s in zip(chans, scales)]
    jax_taps = [jnp.asarray(_nhwc(t)) for t in torch_taps]
    return torch_taps, jax_taps


def test_backbone_taps_match_reference():
    import torch

    tm = oracles.build_torch_yolo(YOLOV5S_CFG, out_indices=OUT_INDICES)
    tm.model = tm.model[: max(OUT_INDICES) + 1]  # truncate like basemodel.py:170
    x = torch.rand(1, 3, 128, 128)
    with torch.no_grad():
        ref = tm(x)  # list of 5 taps
    variables = convert_state_dict(tm.state_dict())
    model = YoloGraph(spec=backbone_spec(YOLOV5S_CFG), out_indices=OUT_INDICES, act="silu")
    got = model.apply(variables, jnp.asarray(_nhwc(x)))
    assert len(got) == 5
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), _nhwc(r), rtol=5e-4, atol=1e-3)


def test_full_graph_detect_matches_reference():
    import torch

    tm = oracles.build_torch_yolo(YOLOV5S_CFG, out_indices=OUT_INDICES)
    x = torch.rand(1, 3, 128, 128)
    with torch.no_grad():
        (dets, _raw), taps = tm(x, detect=True)
    variables = convert_state_dict(tm.state_dict())
    model = YoloGraph(spec=full_spec(YOLOV5S_CFG), out_indices=OUT_INDICES, act="silu")
    jdets, jtaps = model.apply(variables, jnp.asarray(_nhwc(x)), detect=True)
    assert jdets.shape == tuple(dets.shape)
    np.testing.assert_allclose(np.asarray(jdets), dets.numpy(), rtol=2e-4, atol=2e-3)
    for g, r in zip(jtaps, taps):
        np.testing.assert_allclose(np.asarray(g), _nhwc(r), rtol=5e-4, atol=1e-3)


def test_fused_backbone_converts():
    """The reference fuses conv+bn at load (load_yolov5_ckpt fuse=True); a
    fused state dict must convert to identity-BN params and match."""
    import torch

    tm = oracles.build_torch_yolo(YOLOV5S_CFG, out_indices=OUT_INDICES, fuse=True)
    tm.model = tm.model[: max(OUT_INDICES) + 1]
    x = torch.rand(1, 3, 128, 128)
    with torch.no_grad():
        ref = tm(x)
    variables = convert_state_dict(tm.state_dict())
    model = YoloGraph(spec=backbone_spec(YOLOV5S_CFG), out_indices=OUT_INDICES, act="silu")
    got = model.apply(variables, jnp.asarray(_nhwc(x)))
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), _nhwc(r), rtol=5e-4, atol=1e-3)


@pytest.mark.parametrize("mode", [TEXTDET_MASK, TEXTDET_DET, TEXTDET_INFERENCE])
def test_unet_head_matches_reference(mode):
    import torch

    th = oracles.build_torch_unet(act="leaky")
    torch_taps, jax_taps = _taps()
    with torch.no_grad():
        ref = th(*torch_taps, forward_mode=mode)
    variables = convert_state_dict(th.state_dict())
    head = UnetHead(act="leaky")
    got = head.apply(variables, *jax_taps, forward_mode=mode)
    if mode == TEXTDET_MASK:
        np.testing.assert_allclose(np.asarray(got), _nhwc(ref), rtol=5e-4, atol=1e-3)
    elif mode == TEXTDET_DET:
        for g, r in zip(got, ref):
            np.testing.assert_allclose(np.asarray(g), _nhwc(r), rtol=5e-4, atol=1e-3)
    else:
        np.testing.assert_allclose(np.asarray(got[0]), _nhwc(ref[0]), rtol=5e-4, atol=1e-3)
        for g, r in zip(got[1], ref[1]):
            np.testing.assert_allclose(np.asarray(g), _nhwc(r), rtol=5e-4, atol=1e-3)


@pytest.mark.parametrize("train,sws", [(False, True), (True, True), (True, False)])
def test_db_head_matches_reference(train, sws):
    import torch

    th = oracles.build_torch_dbhead(act="leaky", shrink_with_sigmoid=sws)
    if train:
        th = th.train()
        # freeze running stats so train-mode BN uses batch stats in both impls
    torch_taps, jax_taps = _taps()
    f80, f40, u40 = torch_taps[1], torch_taps[2], torch.randn(1, 256, 8, 8)
    jf80, jf40 = jax_taps[1], jax_taps[2]
    ju40 = jnp.asarray(_nhwc(u40))
    with torch.no_grad():
        ref = th(f80, f40, u40)
    variables = convert_state_dict(th.state_dict())
    head = DBHead(64, act="leaky", shrink_with_sigmoid=sws)
    if train:
        got, _ = head.apply(variables, jf80, jf40, ju40, train=True, mutable=["batch_stats"])
        g, r = np.asarray(got), _nhwc(ref)
        # train mode normalizes by batch stats, which amplifies f32
        # accumulation noise; binary channel is further amplified by k=50.
        np.testing.assert_allclose(g[..., :2], r[..., :2], atol=2e-2)
        for c in range(g.shape[-1]):
            cc = np.corrcoef(g[..., c].ravel(), r[..., c].ravel())[0, 1]
            assert cc > 0.999, f"channel {c} corr {cc}"
    else:
        got = head.apply(variables, jf80, jf40, ju40)
        np.testing.assert_allclose(np.asarray(got), _nhwc(ref), rtol=5e-4, atol=5e-4)
