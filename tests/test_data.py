"""Data pipeline tests on the synthetic KITTI fixture."""

import numpy as np
import pytest

from tripled_tpu.config import DataConfig
from tripled_tpu.data.datasets import (
    KITTIInpaintDataset,
    KITTIMapDataset,
    KITTIRawDataset,
)
from tripled_tpu.data.pipeline import BatchLoader
from tripled_tpu.data.readers import readlines
from tripled_tpu.data.synthetic import make_kitti_tree


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    return make_kitti_tree(str(tmp_path_factory.mktemp("kitti")), num_frames=8)


def _make(cls, tree, is_train=True, frame_ids=(0, -1, 1), cfg=None):
    return cls(
        data_path=tree["root"],
        filenames=readlines(tree["train_split"]),
        height=64,
        width=192,
        frame_ids=frame_ids,
        cfg=cfg or DataConfig(erase_shape=(8, 8), erase_count=4),
        is_train=is_train,
        img_ext=".png",
    )


def test_kitti_raw_sample(kitti_tree):
    ds = _make(KITTIRawDataset, kitti_tree)
    rng = np.random.RandomState(0)
    s = ds.sample(0, rng)
    assert s["color"].shape == (3, 64, 192, 3)
    assert s["color_aug"].shape == (3, 64, 192, 3)
    assert s["color"].dtype == np.float32
    assert s["color"].min() >= 0 and s["color"].max() <= 1
    K = s["K"]
    np.testing.assert_allclose(K[0, 0], 0.58 * 192, rtol=1e-6)
    np.testing.assert_allclose(K @ s["inv_K"], np.eye(4), atol=1e-5)


def test_sample_determinism(kitti_tree):
    ds = _make(KITTIRawDataset, kitti_tree)
    a = ds.sample(1, np.random.RandomState(7))
    b = ds.sample(1, np.random.RandomState(7))
    np.testing.assert_array_equal(a["color_aug"], b["color_aug"])


def test_stereo_frame(kitti_tree):
    ds = _make(KITTIRawDataset, kitti_tree, frame_ids=(0, -1, 1, "s"))
    s = ds.sample(0, np.random.RandomState(3))
    assert s["color"].shape[0] == 4
    assert abs(abs(s["stereo_T"][0, 3]) - 0.015) < 1e-6


def test_inpaint_mask(kitti_tree):
    ds = _make(KITTIInpaintDataset, kitti_tree)
    s = ds.sample(0, np.random.RandomState(0))
    m = s["mask"]
    assert m.shape == (64, 192, 1)
    assert set(np.unique(m)) <= {0.0, 1.0}
    assert (m == 0).sum() > 0


def test_map_dataset(kitti_tree):
    ds = _make(KITTIMapDataset, kitti_tree)
    s = ds.sample(0, np.random.RandomState(0))
    assert s["map_mask"].shape == (2, 64, 192, 1)
    assert s["map_params"].shape == (2, 3)
    labels = s["map_params"][:, 0]
    assert (labels >= 0).all() and (labels < 16).all()


def test_velodyne_depth(kitti_tree):
    ds = _make(KITTIRawDataset, kitti_tree)
    depth = ds.get_depth(kitti_tree["scene"], 1, "l", False)
    assert depth.shape == (kitti_tree["height"], kitti_tree["width"])
    assert (depth >= 0).all()
    assert (depth > 0).sum() > 10  # some lidar returns landed in frame


def test_batch_loader_sharding(kitti_tree):
    ds = _make(KITTIRawDataset, kitti_tree)
    shards = [
        BatchLoader(ds, batch_size=2, seed=5, num_shards=2, shard_index=i,
                    num_workers=2)
        for i in range(2)
    ]
    batches0 = list(shards[0])
    batches1 = list(shards[1])
    assert len(batches0) == len(batches1) == len(ds) // 4
    b = batches0[0]
    assert b["color"].shape == (2, 3, 64, 192, 3)
    # epoch determinism
    again = list(shards[0])
    np.testing.assert_array_equal(batches0[0]["color"], again[0]["color"])
    # different epochs reshuffle
    shards[0].set_epoch(1)
    ep1 = list(shards[0])
    assert not np.array_equal(batches0[0]["color"], ep1[0]["color"])
