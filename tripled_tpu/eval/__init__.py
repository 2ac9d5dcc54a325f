"""Evaluation: KITTI Eigen depth protocol, odometry ATE, Make3D."""

from tripled_tpu.eval.depth_metrics import (
    compute_errors,
    eigen_crop_mask,
    evaluate_depth_predictions,
    AverageMeter,
)
from tripled_tpu.eval.evaluator import DepthEvaluator
