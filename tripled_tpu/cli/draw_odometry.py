"""Full-trajectory odometry evaluation + plots (`scripts/draw_odometry.py`):
accumulate global poses, dump a KITTI-format pose file, run the segment-error
benchmark, save trajectory plots.

Usage:
  python -m tripled_tpu.cli.draw_odometry --config ... --checkpoint ... \
      --sequence 09 --out_dir odo_out/
"""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--sequence", default="09")
    p.add_argument("--gt_poses_dir", default="/root/reference/mono/datasets/gt_pose")
    p.add_argument("--out_dir", default="odometry_out")
    args = p.parse_args()

    from tripled_tpu.cli.eval_pose import _load, predict_sequence_transforms
    from tripled_tpu.eval.odometry import evaluate_odometry
    from tripled_tpu.eval.pose import (
        accumulate_global_poses,
        load_kitti_poses,
        save_kitti_poses,
    )

    cfg, state, model, dataset = _load(args)
    transforms = predict_sequence_transforms(cfg, state, model, dataset)
    global_poses = accumulate_global_poses(transforms)

    os.makedirs(args.out_dir, exist_ok=True)
    pred_file = os.path.join(args.out_dir, f"{args.sequence}_pred.txt")
    save_kitti_poses(pred_file, global_poses)

    gt = load_kitti_poses(os.path.join(args.gt_poses_dir, f"{args.sequence}.txt"))
    result = evaluate_odometry(
        gt, global_poses, out_dir=args.out_dir, seq_name=args.sequence
    )
    print(
        f"seq {args.sequence}: t_err {result['t_err_percent']:.2f}% "
        f"r_err {result['r_err_deg_per_m']:.4f} deg/m "
        f"ATE {result['ate_rmse']:.2f} m"
    )


if __name__ == "__main__":
    main()
