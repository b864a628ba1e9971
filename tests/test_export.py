"""Export round-trip + parity (small input size for CPU test speed)."""

import jax
import jax.numpy as jnp
import numpy as np

from comic_text_detector_tpu.export import concate_models, export_stablehlo, load_exported, parity_check
from comic_text_detector_tpu.models.detector import build_inference_model, init_variables


def test_stablehlo_roundtrip(tmp_path):
    model = build_inference_model(act="leaky")
    variables = init_variables(model, jax.random.PRNGKey(0), input_size=128)
    path = str(tmp_path / "textdetector.stablehlo")
    export_stablehlo(variables, path, input_size=128)
    ok, max_diff = parity_check(variables, path, input_size=128)
    assert ok, f"export parity diff {max_diff}"
    fn = load_exported(path)
    out = fn(np.zeros((1, 128, 128, 3), np.float32))
    assert out[0].shape[0] == 1 and out[1].shape == (1, 128, 128, 1) and out[2].shape == (1, 128, 128, 2)


def test_concate_models_shapes():
    model = build_inference_model(act="leaky")
    variables = init_variables(model, jax.random.PRNGKey(0), input_size=128)
    blk = {"params": variables["params"]["blk_det"], "batch_stats": variables["batch_stats"]["blk_det"]}
    seg = {"params": variables["params"]["text_seg"], "batch_stats": variables["batch_stats"]["text_seg"]}
    det = {"params": variables["params"]["text_det"], "batch_stats": variables["batch_stats"]["text_det"]}
    merged = concate_models(blk, seg, det)
    out = model.apply(merged, jnp.zeros((1, 128, 128, 3), jnp.float32))
    assert len(out) == 3
