"""Spatial (sequence-parallel analog) sharding: partition the image H axis
over the mesh and let XLA insert conv halo exchanges (SURVEY.md §2.2 — the
framework's 'context parallel' equivalent for oversized pages)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from comic_text_detector_tpu.models.detector import build_inference_model, init_variables
from comic_text_detector_tpu.parallel.mesh import make_mesh


@pytest.mark.slow
def test_spatial_sharded_forward_matches_single_device():
    mesh = make_mesh(8, axes=("data",))
    model = build_inference_model(act="leaky")
    variables = init_variables(model, jax.random.PRNGKey(0), input_size=128)

    x = np.random.default_rng(0).random((1, 256, 256, 3), np.float32)
    ref = model.apply(variables, jnp.asarray(x))

    xs = jax.device_put(x, NamedSharding(mesh, P(None, "data", None, None)))
    vs = jax.device_put(variables, NamedSharding(mesh, P()))
    with mesh:
        blks, mask, lines = jax.jit(model.apply)(vs, xs)
    np.testing.assert_allclose(np.asarray(mask), np.asarray(ref[1]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(blks), np.asarray(ref[0]), rtol=1e-3, atol=1e-2)
