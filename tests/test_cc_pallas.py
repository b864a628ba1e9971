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


def _serpentine(s: int) -> np.ndarray:
    """Boustrophedon snake: the propagation worst case (~s/2 turns; the
    BENCH_HISTORY ~70-round pattern came from shapes like this)."""
    m = np.zeros((s, s), np.uint8)
    m[::2, :] = 1
    for r in range(0, s - 2, 2):
        col = 0 if (r // 2) % 2 == 0 else s - 1
        m[r + 1, col] = 1
    return m


def test_cc_ids_windows_local_interpret_production_scale():
    """The production ids kernel (CC + in-VMEM rank compaction) at the real
    S=256 window size, serpentine worst case + noise, interpret mode vs the
    grid-CC + cumsum/gather compaction oracle."""
    from comic_text_detector_tpu.ops import refine as R
    from comic_text_detector_tpu.ops.pallas_kernels import cc_ids_windows_local

    rng = np.random.default_rng(5)
    s = R.S
    masks = np.zeros((3, s, s), np.uint8)
    masks[0] = _serpentine(s)
    masks[1] = rng.random((s, s)) < 0.4
    masks[2, 10:250, 10:250] = 1  # one big blob + holes
    masks[2][rng.random((s, s)) < 0.1] = 0
    fg = jnp.asarray(masks > 0)
    got = np.asarray(cc_ids_windows_local(jnp.asarray(masks), True))
    ref = np.asarray(R._compact_ids(R._stacked_cc(fg, backend="grid"), fg))
    np.testing.assert_array_equal(got, ref)


def test_cc_ids_split_path_matches_oracle():
    """Whole-canvas shapes (> _FUSED_IDS_MAX_ELEMS) route through the SPLIT
    labels-kernel + XLA cumsum + min-propagate-kernel path; its ids must be
    identical to the grid-CC + compaction oracle (and hence to the fused
    kernel's numbering on small shapes)."""
    from comic_text_detector_tpu.ops import refine as R
    from comic_text_detector_tpu.ops.pallas_kernels import (
        _FUSED_IDS_MAX_ELEMS,
        cc_ids_windows_local,
    )

    h, w = 512, 640
    assert h * w > _FUSED_IDS_MAX_ELEMS  # must exercise the split routing
    rng = np.random.default_rng(11)
    masks = np.zeros((2, h, w), np.uint8)
    masks[0] = rng.random((h, w)) < 0.35
    masks[1, 40:480, 60:600] = 1
    masks[1][rng.random((h, w)) < 0.08] = 0
    fg = jnp.asarray(masks > 0)
    got = np.asarray(cc_ids_windows_local(jnp.asarray(masks), True))
    ref = np.asarray(R._compact_ids(R._stacked_cc(fg, backend="grid"), fg))
    np.testing.assert_array_equal(got, ref)


def test_take_accept_matmul_matches_gather():
    from comic_text_detector_tpu.ops import refine as R

    rng = np.random.default_rng(6)
    ids = jnp.asarray(rng.integers(0, R.CAP + 32, (2, R.S, R.S)), jnp.int32)
    accept = jnp.asarray(rng.random((2, R.CAP)) < 0.5)
    a = np.asarray(R._take_accept(ids, accept, matmul=False))
    b = np.asarray(R._take_accept(ids, accept, matmul=True))
    np.testing.assert_array_equal(b, a)


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


def test_vmem_backend_matches_xla():
    """The whole-canvas in-VMEM CC backend ('vmem' — the refine windows'
    labels-only kernel on a 1-window batch) must agree exactly with the XLA
    scan path, including 8-connectivity diagonals."""
    import numpy as np
    import jax.numpy as jnp

    from comic_text_detector_tpu.ops.cc import connected_components

    rng = np.random.default_rng(17)
    m = jnp.asarray(rng.random((64, 128)) < 0.4)
    a = np.asarray(connected_components(m, 8, "xla"))
    b = np.asarray(connected_components(m, 8, "vmem"))
    np.testing.assert_array_equal(a, b)


def test_cc_fixpoint_variants_bit_equal():
    """Every CC fixpoint variant ('chunk2', 'diag', 'diagchunk2') must emit
    ids bit-identical to 'base' — they trade per-round work against round
    count but share one fixpoint (monotone min-propagation).  Adversarial
    shapes: dense noise, thin diagonal strokes (the diag-sweep target), a
    serpentine (the many-round worst case)."""
    from comic_text_detector_tpu.ops.pallas_kernels import cc_ids_windows_local

    rng = np.random.default_rng(11)
    masks = np.zeros((4, 64, 128), np.uint8)
    masks[0] = rng.random((64, 128)) < 0.45
    for i in range(64):  # thin anti-aliased-like diagonal strokes
        masks[1, i, (2 * i) % 128] = 1
        masks[1, i, (2 * i + 1) % 128] = 1
        masks[1, i, (127 - 2 * i) % 128] = 1
    masks[2] = _serpentine(64)[:, :64].repeat(2, axis=1)
    masks[3, 5:60, 5:120] = 1
    masks[3][rng.random((64, 128)) < 0.15] = 0
    dev = jnp.asarray(masks)
    base = np.asarray(cc_ids_windows_local(dev, True, "base"))
    for v in ("chunk2", "diag", "diagchunk2"):
        np.testing.assert_array_equal(
            base, np.asarray(cc_ids_windows_local(dev, True, v)), err_msg=v
        )
