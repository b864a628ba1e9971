"""Unit tests: NHWC primitives vs torch.nn.functional oracles."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from comic_text_detector_tpu.ops import nn as tnn


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def _to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("k,s,p,g", [(1, 1, 0, 1), (3, 1, 1, 1), (3, 2, 1, 1), (6, 2, 2, 1), (3, 1, 1, 2)])
def test_conv2d_matches_torch(rng, k, s, p, g):
    c1, c2 = 8, 12
    x = rng.standard_normal((2, 16, 16, c1), dtype=np.float32)
    w = rng.standard_normal((c2, c1 // g, k, k), dtype=np.float32) * 0.1
    b = rng.standard_normal(c2, dtype=np.float32)
    ref = F.conv2d(_nchw(x), torch.from_numpy(w), torch.from_numpy(b), stride=s, padding=p, groups=g)
    got = tnn.conv2d(jnp.asarray(x), tnn.torch_conv_kernel_to_hwio(w), jnp.asarray(b), s, p, g)
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("k,s,p", [(4, 2, 1), (2, 2, 0)])
def test_conv_transpose2d_matches_torch(rng, k, s, p):
    c1, c2 = 6, 5
    x = rng.standard_normal((2, 9, 11, c1), dtype=np.float32)
    w = rng.standard_normal((c1, c2, k, k), dtype=np.float32) * 0.1
    b = rng.standard_normal(c2, dtype=np.float32)
    ref = F.conv_transpose2d(_nchw(x), torch.from_numpy(w), torch.from_numpy(b), stride=s, padding=p)
    got = tnn.conv_transpose2d(jnp.asarray(x), tnn.torch_convt_kernel_to_hwio(w), jnp.asarray(b), s, p)
    assert got.shape[1] == ref.shape[2] and got.shape[2] == ref.shape[3]
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("k,s,p", [(5, 1, 2), (2, 2, 0), (9, 1, 4)])
def test_max_pool2d_matches_torch(rng, k, s, p):
    x = rng.standard_normal((1, 12, 12, 4), dtype=np.float32)
    ref = F.max_pool2d(_nchw(x), k, stride=s, padding=p)
    got = tnn.max_pool2d(jnp.asarray(x), k, s, p)
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), rtol=1e-6, atol=1e-6)


def test_avg_pool2d_matches_torch(rng):
    x = rng.standard_normal((1, 10, 10, 3), dtype=np.float32)
    ref = F.avg_pool2d(_nchw(x), 2, 2)
    got = tnn.avg_pool2d(jnp.asarray(x), 2, 2)
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), rtol=1e-6, atol=1e-6)


def test_upsample_nearest_matches_torch(rng):
    x = rng.standard_normal((1, 7, 5, 3), dtype=np.float32)
    ref = F.interpolate(_nchw(x), scale_factor=2, mode="nearest")
    got = tnn.upsample_nearest2x(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), rtol=1e-6, atol=1e-6)


def test_batch_norm_inference_matches_torch(rng):
    c = 16
    x = rng.standard_normal((2, 8, 8, c), dtype=np.float32)
    scale = rng.standard_normal(c, dtype=np.float32)
    bias = rng.standard_normal(c, dtype=np.float32)
    mean = rng.standard_normal(c, dtype=np.float32)
    var = rng.random(c, dtype=np.float32) + 0.5
    bn = torch.nn.BatchNorm2d(c, eps=1e-3).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(scale))
        bn.bias.copy_(torch.from_numpy(bias))
        bn.running_mean.copy_(torch.from_numpy(mean))
        bn.running_var.copy_(torch.from_numpy(var))
    ref = bn(_nchw(x))
    got = tnn.batch_norm_inference(
        jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), jnp.asarray(mean), jnp.asarray(var), 1e-3
    )
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), rtol=1e-4, atol=1e-5)


def test_activations(rng):
    x = rng.standard_normal((4, 8), dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(tnn.silu(jnp.asarray(x))), F.silu(torch.from_numpy(x)).numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(tnn.leaky_relu(jnp.asarray(x))),
        F.leaky_relu(torch.from_numpy(x), 0.1).numpy(),
        rtol=1e-6,
        atol=1e-7,
    )
