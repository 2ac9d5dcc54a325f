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


def test_decode_cache_bitexact(kitti_tree, monkeypatch):
    """Cache-on samples are bit-identical to the PIL (reference) decode
    path, flips included, for BOTH underlying decoders: the cache stores
    frames on the uint8/255 grid — exactly what PIL produces, and what the
    native loader matches byte-exactly after rounding
    (tests/test_native_loader.py). Unflipped frames are cached and
    mirrored with a numpy view; the native loader also mirrors after
    resizing, so flip commutes."""
    monkeypatch.setenv("TRIPLED_NATIVE_LOADER", "0")
    ref = _make(KITTIRawDataset, kitti_tree)  # PIL, no cache
    for native in ("1", "0"):
        monkeypatch.setenv("TRIPLED_NATIVE_LOADER", native)
        warm = _make(
            KITTIRawDataset,
            kitti_tree,
            cfg=DataConfig(erase_shape=(8, 8), erase_count=4, decode_cache_mb=64),
        )
        assert warm._decode_cache is not None and ref._decode_cache is None
        for idx in range(4):
            for seed in (0, 1, 2, 3):  # covers do_flip on and off
                a = ref.sample(idx, np.random.RandomState(seed))
                b = warm.sample(idx, np.random.RandomState(seed))  # fill/hit
                c = warm.sample(idx, np.random.RandomState(seed))  # hit
                np.testing.assert_array_equal(a["color"], b["color"])
                np.testing.assert_array_equal(a["color"], c["color"])
                np.testing.assert_array_equal(a["color_aug"], c["color_aug"])
        assert warm._decode_cache.used > 0


def test_decode_cache_cap(kitti_tree):
    """Insertion stops at the byte cap instead of evicting."""
    one_frame = 64 * 192 * 3  # uint8 bytes
    ds = _make(
        KITTIRawDataset,
        kitti_tree,
        cfg=DataConfig(decode_cache_mb=1),
    )
    ds._decode_cache.cap = 2 * one_frame + 1
    for idx in range(4):
        ds.sample(idx, np.random.RandomState(0))
    assert ds._decode_cache.used <= ds._decode_cache.cap
    assert len(ds._decode_cache._d) == 2


def test_device_jitter_matches_host(kitti_tree):
    """ops/jitter.py reproduces the host numpy jitter bit-closely for the
    same factors/order, and the dataset's device mode ships a param vector
    drawn from the SAME rng stream as the host path."""
    import jax.numpy as jnp

    from tripled_tpu.ops.jitter import color_jitter

    host_ds = _make(KITTIRawDataset, kitti_tree)
    dev_ds = _make(
        KITTIRawDataset,
        kitti_tree,
        cfg=DataConfig(
            erase_shape=(8, 8), erase_count=4, device_color_aug=True
        ),
    )
    checked_aug = 0
    for idx in range(4):
        for seed in range(6):
            a = host_ds.sample(idx, np.random.RandomState(seed))
            d = dev_ds.sample(idx, np.random.RandomState(seed))
            assert "color_aug" not in d and d["jitter_params"].shape == (9,)
            np.testing.assert_array_equal(a["color"], d["color"])
            dev_aug = np.asarray(
                color_jitter(
                    jnp.asarray(d["color"][None]),
                    jnp.asarray(d["jitter_params"][None]),
                )
            )[0]
            np.testing.assert_allclose(
                a["color_aug"], dev_aug, atol=2e-6,
                err_msg=f"idx={idx} seed={seed}",
            )
            checked_aug += int(d["jitter_params"][8] > 0)
    assert checked_aug > 0  # at least one sample actually jittered


def test_device_jitter_train_step(kitti_tree):
    """End-to-end: a train step consumes jitter_params and synthesizes
    color_aug on device (mono_fm smoke)."""
    import jax

    from tests.test_models import base_cfg
    from tripled_tpu.config import OptimConfig
    from tripled_tpu.models import build_model, canonicalize
    from tripled_tpu.train.optim import make_optimizer
    from tripled_tpu.train.state import create_train_state
    from tripled_tpu.train.step import make_train_step

    import dataclasses

    # match the fixture geometry (the dataset yields 64x192 frames)
    cfg = canonicalize(
        dataclasses.replace(
            base_cfg("mono_fm"),
            height=64, width=192, pose_height=64, pose_width=192,
        )
    )
    model = build_model(cfg)
    ds = _make(
        KITTIRawDataset,
        kitti_tree,
        cfg=DataConfig(device_color_aug=True),
    )
    samples = [ds.sample(i, np.random.RandomState(i)) for i in range(2)]
    batch = {
        k: np.stack([s[k] for s in samples]) for k in samples[0]
    }
    assert "jitter_params" in batch and "color_aug" not in batch
    tx, _ = make_optimizer(OptimConfig(warmup_iters=1), steps_per_epoch=10)
    state = create_train_state(model, tx, batch, seed=0)
    step = make_train_step(model, tx, donate=False)
    _, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_ship_uint8_bitexact_vs_float(kitti_tree):
    """ship_uint8 samples reproduce the float path exactly after /255:
    the frames sit on the same uint8/255 grid the decode cache (and the
    reference's post-PIL-resize ToTensor) uses."""
    f_ds = _make(
        KITTIRawDataset,
        kitti_tree,
        cfg=DataConfig(device_color_aug=True, decode_cache_mb=64),
    )
    u_ds = _make(
        KITTIRawDataset,
        kitti_tree,
        cfg=DataConfig(
            device_color_aug=True, decode_cache_mb=64, ship_uint8=True
        ),
    )
    for idx in range(4):
        for seed in range(4):
            a = f_ds.sample(idx, np.random.RandomState(seed))
            b = u_ds.sample(idx, np.random.RandomState(seed))
            assert b["color"].dtype == np.uint8
            np.testing.assert_array_equal(
                a["color"], b["color"].astype(np.float32) / 255.0
            )
            np.testing.assert_array_equal(
                a["jitter_params"], b["jitter_params"]
            )
    # eval mode: color_aug ships uint8 too
    u_eval = _make(
        KITTIRawDataset,
        kitti_tree,
        is_train=False,
        cfg=DataConfig(ship_uint8=True),
    )
    s = u_eval.sample(0, np.random.RandomState(0))
    assert s["color"].dtype == np.uint8
    assert s["color_aug"].dtype == np.uint8


def test_ship_uint8_requires_device_color_aug(kitti_tree):
    with pytest.raises(ValueError):
        _make(
            KITTIRawDataset,
            kitti_tree,
            cfg=DataConfig(ship_uint8=True),
        )


def test_ship_uint8_train_step_matches_float(kitti_tree):
    """The model normalizes uint8 inputs on device: a train step fed the
    uint8 batch produces the same loss as the float batch."""
    import dataclasses

    import jax

    from tests.test_models import base_cfg
    from tripled_tpu.config import OptimConfig
    from tripled_tpu.models import build_model, canonicalize
    from tripled_tpu.train.optim import make_optimizer
    from tripled_tpu.train.state import create_train_state
    from tripled_tpu.train.step import make_train_step

    cfg = canonicalize(
        dataclasses.replace(
            base_cfg("mono_fm"),
            height=64, width=192, pose_height=64, pose_width=192,
        )
    )
    model = build_model(cfg)

    def batch_for(data_cfg):
        ds = _make(KITTIRawDataset, kitti_tree, cfg=data_cfg)
        samples = [ds.sample(i, np.random.RandomState(i)) for i in range(2)]
        return {k: np.stack([s[k] for s in samples]) for k in samples[0]}

    fb = batch_for(DataConfig(device_color_aug=True, decode_cache_mb=64))
    ub = batch_for(
        DataConfig(device_color_aug=True, decode_cache_mb=64, ship_uint8=True)
    )
    assert ub["color"].dtype == np.uint8
    tx, _ = make_optimizer(OptimConfig(warmup_iters=1), steps_per_epoch=10)
    state = create_train_state(model, tx, fb, seed=0)
    step = make_train_step(model, tx, donate=False)
    _, mf = step(state, fb, jax.random.PRNGKey(0))
    _, mu = step(state, ub, jax.random.PRNGKey(0))
    # XLA fuses the on-device /255 into different elementwise chains than
    # the host-normalized batch sees -> float-noise-level differences
    np.testing.assert_allclose(
        float(mf["loss"]), float(mu["loss"]), rtol=1e-5
    )
