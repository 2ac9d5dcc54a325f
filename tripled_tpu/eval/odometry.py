"""KITTI odometry benchmark evaluation (segment errors).

Clean-room implementation of the KITTI devkit protocol mirrored by the
reference's `mono/tools/kitti_evaluation_toolkit.py:16-650`: per-segment
(100–800 m) translational % and rotational deg/m errors over all starting
frames (every 10th frame), plus scale-aligned ATE and trajectory dumps."""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

SEGMENT_LENGTHS = (100, 200, 300, 400, 500, 600, 700, 800)
STEP_SIZE = 10  # evaluate every 10th frame as a segment start


def trajectory_distances(poses: np.ndarray) -> np.ndarray:
    """Cumulative distance along the trajectory."""
    d = [0.0]
    for i in range(1, len(poses)):
        d.append(d[-1] + np.linalg.norm(poses[i][:3, 3] - poses[i - 1][:3, 3]))
    return np.asarray(d)


def _last_frame_from_len(dist: np.ndarray, first: int, length: float) -> int:
    for i in range(first, len(dist)):
        if dist[i] > dist[first] + length:
            return i
    return -1


def rotation_error(T_err: np.ndarray) -> float:
    a, b, c = T_err[0, 0], T_err[1, 1], T_err[2, 2]
    d = 0.5 * (a + b + c - 1.0)
    return float(np.arccos(np.clip(d, -1.0, 1.0)))


def translation_error(T_err: np.ndarray) -> float:
    return float(np.linalg.norm(T_err[:3, 3]))


@dataclass
class SegmentError:
    first_frame: int
    r_err: float  # rad/m
    t_err: float  # fraction of length
    length: float
    speed: float


def calc_sequence_errors(gt: np.ndarray, pred: np.ndarray) -> list[SegmentError]:
    dist = trajectory_distances(gt)
    errors = []
    for first in range(0, len(gt), STEP_SIZE):
        for length in SEGMENT_LENGTHS:
            last = _last_frame_from_len(dist, first, length)
            if last == -1 or last >= len(pred):
                continue
            pose_delta_gt = np.linalg.inv(gt[first]) @ gt[last]
            pose_delta_pred = np.linalg.inv(pred[first]) @ pred[last]
            T_err = np.linalg.inv(pose_delta_pred) @ pose_delta_gt
            r = rotation_error(T_err) / length
            t = translation_error(T_err) / length
            num_frames = last - first + 1
            speed = length / (0.1 * num_frames)
            errors.append(SegmentError(first, r, t, length, speed))
    return errors


def average_segment_errors(errors: list[SegmentError]) -> dict:
    if not errors:
        return {"t_err_percent": float("nan"), "r_err_deg_per_m": float("nan")}
    t = np.mean([e.t_err for e in errors]) * 100.0
    r = np.mean([e.r_err for e in errors]) * 180.0 / np.pi
    return {"t_err_percent": float(t), "r_err_deg_per_m": float(r)}


def per_length_errors(errors: list[SegmentError]) -> dict:
    out = {}
    for length in SEGMENT_LENGTHS:
        sub = [e for e in errors if e.length == length]
        if sub:
            out[length] = average_segment_errors(sub)
    return out


def per_speed_errors(errors: list[SegmentError], bin_size: float = 5.0) -> dict:
    """Speed-binned segment errors (m/s bins), the devkit's speed plot data
    (`mono/tools/kitti_evaluation_toolkit.py` speed-error path)."""
    out = {}
    if not errors:
        return out
    max_speed = max(e.speed for e in errors)
    b = bin_size
    while b <= max_speed + bin_size:
        sub = [e for e in errors if b - bin_size <= e.speed < b]
        if sub:
            out[b] = average_segment_errors(sub)
        b += bin_size
    return out


def scale_optimize(gt: np.ndarray, pred: np.ndarray) -> np.ndarray:
    """Optimize a global scale on the translations (monocular ambiguity)."""
    g = gt[:, :3, 3]
    p = pred[:, :3, 3]
    scale = float(np.sum(g * p) / max(np.sum(p**2), 1e-12))
    out = pred.copy()
    out[:, :3, 3] *= scale
    return out


def evaluate_odometry(
    gt_poses: np.ndarray,
    pred_poses: np.ndarray,
    align_scale: bool = True,
    out_dir: str | None = None,
    seq_name: str = "seq",
) -> dict:
    n = min(len(gt_poses), len(pred_poses))
    gt, pred = np.asarray(gt_poses)[:n], np.asarray(pred_poses)[:n]
    if align_scale:
        pred = scale_optimize(gt, pred)
    errors = calc_sequence_errors(gt, pred)
    result = average_segment_errors(errors)
    result["per_length"] = per_length_errors(errors)
    result["per_speed"] = per_speed_errors(errors)
    # ATE on positions
    diff = gt[:, :3, 3] - pred[:, :3, 3]
    result["ate_rmse"] = float(np.sqrt((diff**2).sum(-1).mean()))
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, f"{seq_name}_stats.txt"), "w") as f:
            f.write(
                f"t_err {result['t_err_percent']:.4f} %\n"
                f"r_err {result['r_err_deg_per_m']:.6f} deg/m\n"
                f"ate_rmse {result['ate_rmse']:.4f} m\n"
            )
        _plot_trajectory(gt, pred, out_dir, seq_name)
    return result


def _plot_trajectory(gt, pred, out_dir, seq_name):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.plot(gt[:, 0, 3], gt[:, 2, 3], "k-", label="GT")
    ax.plot(pred[:, 0, 3], pred[:, 2, 3], "b-", label="pred")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.legend()
    ax.set_aspect("equal")
    fig.savefig(os.path.join(out_dir, f"{seq_name}_traj.png"), dpi=100)
    plt.close(fig)
