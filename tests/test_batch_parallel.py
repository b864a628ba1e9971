"""Batched pipeline + mesh sharding tests (8 virtual CPU devices)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comic_text_detector_tpu.parallel.mesh import make_mesh, replicate, shard_batch, shard_batch_spec
from comic_text_detector_tpu.pipeline.batch import BatchTextDetector
from comic_text_detector_tpu.pipeline.detector import TextDetector
from comic_text_detector_tpu.utils.io import imread


@pytest.fixture(scope="module")
def pages():
    img = imread("/root/reference/data/examples/AisazuNihaIrarenai-003.jpg")
    from comic_text_detector_tpu.ops.resize import resize_bilinear_np

    small = resize_bilinear_np(img, (img.shape[0] // 4, img.shape[1] // 4))
    return [small, small[:, ::-1].copy(), small[::-1].copy(), small]


def test_mesh_construction():
    mesh = make_mesh(8, axes=("data",))
    assert mesh.devices.shape == (8,)
    mesh2 = make_mesh(8, axes=("data", "model"))
    assert mesh2.devices.shape == (8, 1)


def test_shard_and_replicate():
    mesh = make_mesh(8)
    x = np.zeros((16, 4), np.float32)
    sx = shard_batch(mesh, x)
    assert sx.sharding.spec == jax.sharding.PartitionSpec("data", None)
    params = {"w": np.ones((3, 3), np.float32)}
    rp = replicate(mesh, params)
    assert rp["w"].sharding.spec == jax.sharding.PartitionSpec()


@pytest.mark.slow
def test_batch_detector_matches_single(pages):
    bdet = BatchTextDetector.random_init(batch_size=4, input_size=256, half=False)
    sdet = TextDetector(variables=bdet.variables, input_size=256, act="leaky")
    batch_out = bdet.process_batch(pages)
    assert len(batch_out) == 4
    m_b, mr_b, blk_b = batch_out[0]
    m_s, mr_s, blk_s = sdet(pages[0])
    assert m_b.shape == m_s.shape
    # identical device math modulo batching: masks agree tightly
    assert np.abs(m_b.astype(int) - m_s.astype(int)).mean() < 1.0
    assert len(blk_b) == len(blk_s)


def test_batch_mixed_grey_color_pages(pages):
    """A batch mixing grey-content pages (single-channel upload path) with a
    color page must match the per-page single detector exactly — the
    upload_page fast path is per-page and must not cross-contaminate."""
    rng = np.random.default_rng(5)
    grey = pages[0]  # the example page decodes with B==G==R
    assert np.array_equal(grey[..., 0], grey[..., 1])
    color = grey.copy()
    noise = rng.integers(0, 20, grey.shape[:2], np.uint8)
    color[..., 2] = np.minimum(255 - noise, color[..., 2]) + noise  # break B==G==R
    assert not np.array_equal(color[..., 1], color[..., 2])

    bdet = BatchTextDetector.random_init(
        batch_size=2, input_size=256, half=False,
        refine_backend="device", mask_transfer="packed",
    )
    sdet = TextDetector(
        variables=bdet.variables, input_size=256, act="leaky",
        refine_backend="device", mask_transfer="packed",
    )
    for (m_b, mr_b, blk_b), page in zip(bdet.process_batch([grey, color]), [grey, color]):
        m_s, mr_s, blk_s = sdet(page)
        np.testing.assert_array_equal(m_b, m_s)
        np.testing.assert_array_equal(mr_b, mr_s)
        assert len(blk_b) == len(blk_s)


@pytest.mark.slow
def test_batch_detector_sharded(pages):
    mesh = make_mesh(8)
    bdet = BatchTextDetector.random_init(batch_size=8, input_size=256, half=False, mesh=mesh)
    out = bdet.process_batch(pages + pages)
    assert len(out) == 8


@pytest.mark.slow
def test_stream(pages):
    bdet = BatchTextDetector.random_init(batch_size=2, input_size=256, half=False)
    results = list(bdet.stream(iter(pages)))
    assert len(results) == 4


def test_host_sharded_dataset():
    from comic_text_detector_tpu.parallel.loader import HostShardedDataset

    data = list(range(10))
    shards = [HostShardedDataset(data, process_index=i, process_count=3) for i in range(3)]
    seen = []
    for s in shards:
        seen += [s[i] for i in range(len(s))]
    assert sorted(seen) == data


@pytest.mark.slow
def test_seg_trainer_sharded(tmp_path):
    from comic_text_detector_tpu.training import seg_trainer
    from tests.test_training import _make_tiny_dataset

    img_dir = _make_tiny_dataset(tmp_path, n=8)
    mesh = make_mesh(8)
    hyp = {
        "data": {"train_img_dir": img_dir, "val_img_dir": img_dir, "imgsz": 128,
                 "augment": False, "save_dir": str(tmp_path / "out")},
        "train": {"epochs": 1, "batch_size": 8, "lr0": 1e-3, "lrf": 0.1,
                  "optimizer": "adam", "weight_decay": 0.0, "eval_interval": 1,
                  "accumulation_steps": 1},
    }
    out = seg_trainer.train(hyp, max_steps=1, mesh=mesh)
    assert out["steps"] == 1 and np.isfinite(out["last_loss"])


def test_device_refine_downloads_once_per_shape_group(pages, monkeypatch):
    """The refine ticket path must fetch each shape group's packed canvases
    in ONE jax.device_get (per-page row fetches each pay a device slice +
    a tunnel round trip, ~25 ms over axon).  Expected transfers for a batch:
    one for the compact infer outputs + one per distinct page shape."""
    import jax as _jax

    bdet = BatchTextDetector.random_init(
        batch_size=4, input_size=256, half=False,
        refine_backend="device", mask_transfer="packed",
    )
    tall = np.ascontiguousarray(pages[1][:-8])  # a second page SHAPE
    batch = [pages[0], tall, pages[0], tall]  # 2 distinct shapes
    n_groups = len({p.shape[:2] for p in batch})
    assert n_groups == 2

    calls = []
    real_get = _jax.device_get
    monkeypatch.setattr(_jax, "device_get", lambda x: calls.append(1) or real_get(x))
    out = bdet.process_batch(batch)
    assert len(out) == 4
    assert len(calls) == 1 + n_groups, f"expected {1 + n_groups} transfers, saw {len(calls)}"
