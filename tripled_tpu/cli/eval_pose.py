"""KITTI odometry pose evaluation (`scripts/eval_pose.py` equivalent):
5-frame-track ATE on sequences 09/10.

Usage:
  python -m tripled_tpu.cli.eval_pose --config ... --checkpoint ... \
      --sequence 09 [--gt_poses_dir .../gt_pose]
"""

from __future__ import annotations

import argparse


def predict_sequence_transforms(cfg, state, model, dataset, batch_size=8):
    """Run PoseEncoder/Decoder over consecutive (cur, next) frame pairs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tripled_tpu.models.net import TripleDNet
    from tripled_tpu.ops import transformation_from_parameters

    @jax.jit
    def pose_fn(variables, pair):
        aa, t = model.apply(variables, pair, train=False,
                            method=TripleDNet.predict_pose)
        return transformation_from_parameters(aa[:, 0], t[:, 0], invert=False)

    rng = np.random.RandomState(0)
    transforms = []
    n = len(dataset)
    for start in range(0, n, batch_size):
        idx = list(range(start, min(start + batch_size, n)))
        pairs = []
        for i in idx:
            s = dataset.sample(i, rng)
            pairs.append(np.concatenate([s["color_aug"][0], s["color_aug"][1]], -1))
        pairs = np.stack(pairs)
        pad = batch_size - len(idx)
        if pad:
            pairs = np.concatenate([pairs, np.repeat(pairs[-1:], pad, 0)])
        T = np.asarray(pose_fn(state.variables, jnp.asarray(pairs)))
        if pad:
            T = T[:-pad]
        transforms.extend(list(T))
    return np.asarray(transforms)


def _load(args):
    from tripled_tpu.cli.infer import load_depth_model
    from tripled_tpu.data.datasets import KITTIOdomDataset
    from tripled_tpu.data.readers import readlines, split_file_path
    from tripled_tpu.models.registry import build_model

    cfg, state, _ = load_depth_model(args.config, args.checkpoint)
    model = build_model(cfg.model)
    split = split_file_path("odom", f"test_files_{args.sequence}.txt")
    filenames = readlines(split)
    dataset = KITTIOdomDataset(
        data_path=cfg.data.in_path,
        filenames=filenames,
        height=cfg.data.height,
        width=cfg.data.width,
        frame_ids=(0, 1),
        cfg=cfg.data,
        is_train=False,
        img_ext=".png" if cfg.data.png else ".jpg",
    )
    # frame pairs [0, 1] need is_train-like multi-frame loading
    dataset.is_train = False
    return cfg, state, model, dataset


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--sequence", default="09")
    p.add_argument("--gt_poses_dir", default="/root/reference/mono/datasets/gt_pose")
    args = p.parse_args()

    import os

    from tripled_tpu.eval.pose import evaluate_pose_ate, load_kitti_poses

    cfg, state, model, dataset = _load(args)
    transforms = predict_sequence_transforms(cfg, state, model, dataset)
    gt = load_kitti_poses(
        os.path.join(args.gt_poses_dir, f"{args.sequence}.txt")
    )
    mean_ate, std_ate = evaluate_pose_ate(transforms, gt)
    print(f"seq {args.sequence}: ATE {mean_ate:.4f} ± {std_ate:.4f}")


if __name__ == "__main__":
    main()
