"""Odometry flow: KITTIOdomDataset pairs → pose net → transforms → ATE/
segment errors, on a synthetic sequence tree (the eval_pose/draw_odometry
CLI path without the CLI glue)."""

import os

import jax
import numpy as np
import pytest
from PIL import Image

from tripled_tpu.config import DataConfig, ModelConfig
from tripled_tpu.data.datasets import KITTIOdomDataset
from tripled_tpu.eval.odometry import evaluate_odometry
from tripled_tpu.eval.pose import (
    accumulate_global_poses,
    evaluate_pose_ate,
    load_kitti_poses,
    save_kitti_poses,
)
from tripled_tpu.models.net import TripleDNet
from tripled_tpu.models.registry import build_model
from tripled_tpu.ops import transformation_from_parameters


@pytest.fixture(scope="module")
def odom_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("odom")
    img_dir = root / "sequences" / "09" / "image_0"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    n = 8
    for i in range(n):
        img = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(img_dir / f"{i:06d}.png")
    lines = [f"09 {i} l" for i in range(n - 1)]
    split = root / "test_files_09.txt"
    split.write_text("\n".join(lines) + "\n")
    return root, split, n


def test_pose_flow(odom_tree, tmp_path):
    root, split, n = odom_tree
    ds = KITTIOdomDataset(
        data_path=str(root),
        filenames=split.read_text().splitlines(),
        height=64, width=96, frame_ids=(0, 1),
        cfg=DataConfig(), is_train=False, img_ext=".png",
    )
    cfg = ModelConfig(name="mono_baseline", depth_num_layers=18,
                      pose_num_layers=18, height=64, width=96,
                      pose_height=64, pose_width=96)
    model = build_model(cfg)

    s = ds.sample(0, np.random.RandomState(0))
    pair = np.concatenate([s["color_aug"][0], s["color_aug"][1]], -1)[None]
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, pair, train=False,
        method=TripleDNet.predict_pose,
    )

    @jax.jit
    def pose_fn(v, p):
        aa, t = model.apply(v, p, train=False, method=TripleDNet.predict_pose)
        return transformation_from_parameters(aa[:, 0], t[:, 0])

    transforms = []
    for i in range(len(ds)):
        s = ds.sample(i, np.random.RandomState(0))
        pair = np.concatenate([s["color_aug"][0], s["color_aug"][1]], -1)[None]
        transforms.append(np.asarray(pose_fn(variables, pair))[0])
    transforms = np.asarray(transforms)
    assert transforms.shape == (n - 1, 4, 4)
    # valid SE(3): R orthonormal, last row [0,0,0,1]
    R = transforms[:, :3, :3]
    np.testing.assert_allclose(
        np.einsum("nij,nkj->nik", R, R), np.tile(np.eye(3), (n - 1, 1, 1)),
        atol=1e-5,
    )

    # synthetic GT: forward motion
    gt = np.tile(np.eye(4), (n, 1, 1))
    gt[:, 2, 3] = np.arange(n) * 1.0
    mean_ate, std_ate = evaluate_pose_ate(transforms, gt)
    assert np.isfinite(mean_ate)

    global_poses = accumulate_global_poses(transforms)
    pred_file = tmp_path / "09_pred.txt"
    save_kitti_poses(str(pred_file), global_poses)
    back = load_kitti_poses(str(pred_file))
    np.testing.assert_allclose(back, global_poses, atol=1e-4)

    res = evaluate_odometry(gt, global_poses[:n], out_dir=str(tmp_path),
                            seq_name="09")
    assert "ate_rmse" in res and np.isfinite(res["ate_rmse"])
    assert os.path.exists(tmp_path / "09_stats.txt")
