"""End-to-end: synthetic KITTI → train steps on an 8-device CPU mesh → Eigen
eval. This is the multi-device DP test the reference never had (SURVEY §4)."""

import dataclasses

import jax
import numpy as np
import pytest

from tripled_tpu.config import DataConfig, ExperimentConfig, ModelConfig, OptimConfig
from tripled_tpu.data.datasets import KITTIRawDataset
from tripled_tpu.data.readers import readlines
from tripled_tpu.data.synthetic import make_kitti_tree
from tripled_tpu.train.loop import train_mono


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    return make_kitti_tree(
        str(tmp_path_factory.mktemp("kitti_e2e")), num_frames=10, height=96,
        width=192,
    )


def _dataset(tree, training):
    return KITTIRawDataset(
        data_path=tree["root"],
        filenames=readlines(tree["train_split"]),
        height=64,
        width=128,
        frame_ids=(0, -1, 1) if training else (0,),
        cfg=DataConfig(),
        is_train=training,
        img_ext=".png",
        gt_depth_path=None if training else tree["gt_depth_path"],
    )


def test_train_and_eval_e2e(tree, tmp_path):
    assert jax.device_count() == 8, "virtual CPU mesh missing"
    cfg = ExperimentConfig(
        model=ModelConfig(
            name="mono_baseline",
            depth_num_layers=18,
            pose_num_layers=18,
            height=64,
            width=128,
            pose_height=64,
            pose_width=128,
        ),
        data=DataConfig(batch_size=8, seed=1),
        optim=OptimConfig(total_epochs=1, warmup_iters=2, learning_rate=1e-4),
        work_dir=str(tmp_path / "work"),
        validate=True,
        log_interval=1,
    )
    train_ds = _dataset(tree, True)
    val_ds = _dataset(tree, False)
    state, history = train_mono(
        cfg, train_dataset=train_ds, val_dataset=val_ds, max_steps_per_epoch=2
    )
    assert int(state.step) == 1 * min(2, len(train_ds) // 8) or int(state.step) >= 1
    assert history, "no eval metrics recorded"
    m = history[-1]
    for k in ("abs_rel", "rmse", "a1"):
        assert np.isfinite(m[k]), m
    # checkpoint round trip
    from tripled_tpu.train import checkpoint as ckpt

    restored, epoch = ckpt.restore_checkpoint(cfg.work_dir, state)
    assert epoch == 1
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )
