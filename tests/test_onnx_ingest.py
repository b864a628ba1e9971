"""ONNX deploy-checkpoint ingestion: export the executed reference TextDetBase
through the same torch.onnx path as the reference's utils/export.py:30-58,
then ingest the .onnx and check the weights land identically to the torch-ckpt
converter (and that TextDetector runs from the .onnx directly)."""

import numpy as np
import pytest

from comic_text_detector_tpu.config import YOLOV5S_CFG

from tests import oracles


def _export_reference_onnx(tmp_path, seed=11, size=128):
    """combined ckpt -> reference TextDetBase -> .onnx (no onnx package:
    torch's final onnxscript pass is a no-op for plain graphs, stub it)."""
    import torch

    oracles.load_reference()
    from basemodel import TextDetBase  # type: ignore
    from models.yolov5.yolo import Detect  # type: ignore

    blk = oracles.build_torch_yolo(YOLOV5S_CFG, seed=seed, fuse=False)
    seg = oracles.build_torch_unet(act="leaky", seed=seed + 1)
    det = oracles.build_torch_dbhead(act="leaky", seed=seed + 2)
    ckpt = {
        "blk_det": {"cfg": oracles.torch_cfg(YOLOV5S_CFG), "weights": blk.state_dict()},
        "text_seg": seg.state_dict(),
        "text_det": det.state_dict(),
    }
    pt_path = str(tmp_path / "combined.pt")
    torch.save(ckpt, pt_path)

    model = TextDetBase(pt_path, fuse=False, act="leaky").eval()
    for m in model.modules():
        if isinstance(m, Detect):
            m.inplace = False
            m.onnx_dynamic = False

    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes
    onnx_path = str(tmp_path / "comictextdetector.pt.onnx")
    try:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            torch.onnx.export(
                model,
                torch.zeros(1, 3, size, size),
                onnx_path,
                opset_version=11,
                input_names=["images"],
                output_names=["blk", "seg", "det"],
                dynamo=False,
            )
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig
    return pt_path, onnx_path, ckpt


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    return _export_reference_onnx(tmp_path_factory.mktemp("onnx"))


def test_onnx_weights_match_torch_converter(exported):
    """The .onnx export fuses Conv+BN, so param trees differ numerically from
    the unfused torch ckpt — but the tree STRUCTURE must be identical (fused
    pairs re-expand as identity BNs) and model outputs must agree."""
    import jax
    import jax.numpy as jnp

    from comic_text_detector_tpu.models.convert import convert_combined_checkpoint
    from comic_text_detector_tpu.models.detector import build_inference_model
    from comic_text_detector_tpu.models.onnx_ingest import convert_onnx_checkpoint

    pt_path, onnx_path, ckpt = exported
    want, _cfg = convert_combined_checkpoint(ckpt)
    got, cfg = convert_onnx_checkpoint(onnx_path)
    assert cfg is None

    want_flat = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_flatten_with_path(want)[0]}
    got_flat = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_flatten_with_path(got)[0]}
    assert set(want_flat) == set(got_flat), (
        sorted(set(want_flat) - set(got_flat))[:5],
        sorted(set(got_flat) - set(want_flat))[:5],
    )
    for k, v in want_flat.items():
        assert np.asarray(got_flat[k]).shape == np.asarray(v).shape, k

    model = build_inference_model(YOLOV5S_CFG, act="leaky")
    x = jnp.asarray(np.random.default_rng(3).random((1, 128, 128, 3), np.float32))
    blks_w, mask_w, lines_w = model.apply(want, x)
    blks_g, mask_g, lines_g = model.apply(got, x)
    # the export folds BN into convs, so tiny fp32 re-association noise is
    # expected (measured max ~2e-5 on sigmoid outputs)
    np.testing.assert_allclose(np.asarray(mask_g), np.asarray(mask_w), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lines_g), np.asarray(lines_w), atol=1e-4)
    np.testing.assert_allclose(np.asarray(blks_g), np.asarray(blks_w), rtol=1e-3, atol=5e-3)


def test_textdetector_runs_from_onnx(exported):
    from comic_text_detector_tpu.pipeline import TextDetector

    _pt, onnx_path, _ckpt = exported
    d = TextDetector(model_path=onnx_path, input_size=128, act="leaky")
    img = np.random.default_rng(0).integers(0, 256, (180, 140, 3), dtype=np.uint8)
    mask, mask_refined, blk_list = d(img)
    assert mask.shape == (180, 140)
    assert isinstance(blk_list, list)


def test_onnx_reader_rejects_foreign_model(tmp_path):
    """A non-TextDetBase graph must fail loudly, not mis-map weights."""
    import torch
    import torch.nn as nn

    from comic_text_detector_tpu.models.onnx_ingest import convert_onnx_checkpoint

    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes
    path = str(tmp_path / "other.onnx")
    try:
        m = nn.Sequential(nn.Conv2d(3, 4, 3)).eval()
        torch.onnx.export(m, torch.zeros(1, 3, 16, 16), path, opset_version=11, dynamo=False)
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig
    with pytest.raises(ValueError, match="conv nodes, expected"):
        convert_onnx_checkpoint(path)
