"""Pallas CC propagation kernel vs the XLA scan path (and the scipy oracle).

The fused kernel runs interpret-mode here (CPU); on TPU it is the default
backend for aligned shapes (ops/cc.py::_use_pallas).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from comic_text_detector_tpu.ops import cc


def _canon(labels: np.ndarray) -> np.ndarray:
    """Canonical renumber by first occurrence (label values differ between
    implementations; partitions must match)."""
    out = np.zeros_like(labels)
    nxt = 1
    seen = {}
    for v in labels.reshape(-1):
        if v != 0 and v not in seen:
            seen[v] = nxt
            nxt += 1
    for v, k in seen.items():
        out[labels == v] = k
    return out


@pytest.mark.parametrize("connectivity", [4, 8])
@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_cc_matches_xla(connectivity, seed):
    rng = np.random.default_rng(seed)
    # text-like blobs: union of random rectangles + salt noise
    m = np.zeros((64, 128), bool)
    for _ in range(12):
        y, x = rng.integers(0, 56), rng.integers(0, 118)
        m[y : y + rng.integers(2, 8), x : x + rng.integers(2, 10)] = True
    m |= rng.random(m.shape) > 0.9

    ref = np.asarray(cc.connected_components(jnp.asarray(m), connectivity, "xla"))
    got = np.asarray(cc.connected_components(jnp.asarray(m), connectivity, "pallas"))
    np.testing.assert_array_equal(got, ref)  # same canonical labels by construction


@pytest.mark.parametrize("connectivity", [4, 8])
def test_pallas_cc_matches_scipy(connectivity):
    from scipy import ndimage

    rng = np.random.default_rng(3)
    m = rng.random((40, 128)) > 0.55
    got = np.asarray(cc.connected_components(jnp.asarray(m), connectivity, "pallas"))
    structure = np.ones((3, 3)) if connectivity == 8 else None
    ref, _n = ndimage.label(m, structure=structure)
    np.testing.assert_array_equal(_canon(got), _canon(ref))


def test_cc_windows_local_interpret():
    """Per-window in-VMEM CC kernel (interpret mode) vs the XLA CC path."""
    import numpy as np
    import jax.numpy as jnp

    from comic_text_detector_tpu.ops.cc import connected_components
    from comic_text_detector_tpu.ops.pallas_kernels import _CC_BIG, cc_windows_local

    rng = np.random.default_rng(3)
    masks = np.zeros((3, 64, 64), np.uint8)
    masks[0] = rng.random((64, 64)) < 0.35
    # serpentine: comb with alternating connections
    masks[1, ::4, :] = 1
    masks[1, 1:4, 0] = 1
    masks[1, 5:8, -1] = 1
    # diagonal staircase
    for i in range(60):
        masks[2, i, i] = 1
    out = np.asarray(cc_windows_local(jnp.asarray(masks), True))
    for i in range(3):
        ref = np.asarray(connected_components(jnp.asarray(masks[i] > 0), 8, "xla"))
        expect = np.where(masks[i] > 0, ref.astype(np.int64) - 1, _CC_BIG)
        np.testing.assert_array_equal(out[i], expect, err_msg=f"window {i}")
