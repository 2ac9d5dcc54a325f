"""Tests for lie algebra, alignment, conversions, trajectory IO, pose eval."""

import numpy as np
import pytest

from tripled_tpu.eval.odometry import (
    calc_sequence_errors,
    evaluate_odometry,
    rotation_error,
    translation_error,
)
from tripled_tpu.eval.pose import (
    accumulate_global_poses,
    compute_ate,
    dump_xyz,
    evaluate_pose_ate,
)
from tripled_tpu.tools import (
    align_umeyama,
    euler_from_matrix,
    euler_matrix,
    quaternion_from_matrix,
    quaternion_matrix,
    read_kitti_poses,
    read_tum_trajectory,
    se3_exp,
    se3_log,
    so3_exp,
    so3_log,
    write_kitti_poses,
    write_tum_trajectory,
)


def random_rotation(rng):
    return so3_exp(rng.randn(3))


def test_so3_roundtrip(rng_np):
    for _ in range(20):
        w = rng_np.randn(3)
        w = w / np.linalg.norm(w) * rng_np.uniform(0, np.pi - 1e-3)
        R = so3_exp(w)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-8)
        np.testing.assert_allclose(so3_log(R), w, atol=1e-6)
    # beyond the principal branch, exp(log(R)) must still reproduce R
    for _ in range(10):
        w = rng_np.randn(3) * 3.0
        R = so3_exp(w)
        np.testing.assert_allclose(so3_exp(so3_log(R)), R, atol=1e-6)


def test_se3_roundtrip(rng_np):
    for _ in range(20):
        xi = rng_np.randn(6)
        T = se3_exp(xi)
        np.testing.assert_allclose(se3_log(T), xi, atol=1e-6)


def test_quaternion_roundtrip(rng_np):
    for _ in range(20):
        R4 = np.eye(4)
        R4[:3, :3] = random_rotation(rng_np)
        q = quaternion_from_matrix(R4)
        np.testing.assert_allclose(quaternion_matrix(q)[:3, :3], R4[:3, :3],
                                   atol=1e-8)


def test_euler_roundtrip(rng_np):
    for _ in range(20):
        rpy = rng_np.uniform(-1.2, 1.2, 3)
        got = euler_from_matrix(euler_matrix(*rpy))
        np.testing.assert_allclose(got, rpy, atol=1e-8)


def test_umeyama_recovers_similarity(rng_np):
    pts = rng_np.randn(50, 3)
    R = random_rotation(rng_np)
    s_true, t_true = 2.5, np.array([1.0, -2.0, 0.5])
    model = s_true * pts @ R.T + t_true
    s, R_est, t_est = align_umeyama(model, pts)
    np.testing.assert_allclose(s, s_true, rtol=1e-8)
    np.testing.assert_allclose(R_est, R, atol=1e-8)
    np.testing.assert_allclose(t_est, t_true, atol=1e-8)


def test_trajectory_io_roundtrip(tmp_path, rng_np):
    poses = []
    for i in range(5):
        T = np.eye(4)
        T[:3, :3] = random_rotation(rng_np)
        T[:3, 3] = rng_np.randn(3)
        poses.append(T)
    poses = np.asarray(poses)

    kitti = tmp_path / "poses.txt"
    write_kitti_poses(str(kitti), poses)
    back = read_kitti_poses(str(kitti))
    np.testing.assert_allclose(back, poses, atol=1e-5)

    tum = tmp_path / "traj.txt"
    stamps = np.arange(5, dtype=float)
    write_tum_trajectory(str(tum), stamps, poses)
    s2, p2 = read_tum_trajectory(str(tum))
    np.testing.assert_allclose(s2, stamps)
    np.testing.assert_allclose(p2, poses, atol=1e-5)


def _synthetic_trajectory(n=600, rng=None):
    """Forward motion with gentle turn, 1 m per frame."""
    poses = [np.eye(4)]
    for i in range(n - 1):
        dT = np.eye(4)
        dT[:3, :3] = so3_exp(np.array([0, 0.001, 0]))
        dT[2, 3] = 1.0
        poses.append(poses[-1] @ dT)
    return np.asarray(poses)


def test_odometry_perfect_prediction():
    gt = _synthetic_trajectory()
    res = evaluate_odometry(gt, gt.copy(), align_scale=True)
    assert res["t_err_percent"] < 1e-6
    assert res["r_err_deg_per_m"] < 1e-6
    assert res["ate_rmse"] < 1e-9
    assert 100 in res["per_length"]


def test_odometry_detects_drift(rng_np):
    gt = _synthetic_trajectory()
    pred = gt.copy()
    pred[:, 2, 3] *= 1.05  # 5% forward scale drift in z only
    res = evaluate_odometry(gt, pred, align_scale=False)
    assert res["t_err_percent"] > 0.5


def test_pose_ate_zero_for_gt():
    gt = _synthetic_trajectory(100)
    rel = np.asarray(
        [np.linalg.inv(gt[i]) @ gt[i + 1] for i in range(len(gt) - 1)]
    )
    mean_ate, _ = evaluate_pose_ate(rel, gt)
    assert mean_ate < 1e-9

    # accumulate_global_poses inverts relative transforms (draw_odometry path)
    inv_rel = np.asarray([np.linalg.inv(T) for T in rel])
    glob = accumulate_global_poses(inv_rel)
    np.testing.assert_allclose(glob[:, :3, 3], gt[:, :3, 3], atol=1e-6)


def test_euler_szxy_matches_reference_transformations(rng_np):
    """euler_from_matrix_szxy vs the reference's vendored Gohlke
    transformations.py loaded at test time (axes='szxy', the odometry RPY
    plot convention)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_tr", "/root/reference/mono/tools/transformations.py"
    )
    tr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tr)

    from tripled_tpu.tools.transformations import euler_from_matrix_szxy

    for _ in range(50):
        q = rng_np.randn(4)
        q /= np.linalg.norm(q)
        M = tr.quaternion_matrix(q)
        ref = tr.euler_from_matrix(M, axes="szxy")
        got = euler_from_matrix_szxy(M)
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)


def test_odometry_plot_suite_artifacts(tmp_path, rng_np):
    """evaluate_odometry(out_dir=...) writes the full devkit artifact set
    (`kitti_evaluation_toolkit.py:203-553`)."""
    import os

    from tripled_tpu.eval.odometry import evaluate_odometry

    n = 300
    t = np.linspace(0, 6 * np.pi, n)
    gt = np.tile(np.eye(4), (n, 1, 1))
    gt[:, 0, 3] = 120 * np.sin(t / 6)
    gt[:, 2, 3] = np.linspace(0, 900, n)
    gt[:, 1, 3] = 0.3 * np.sin(t)
    pred = gt.copy()
    pred[:, :3, 3] *= 0.8  # scale drift (mono ambiguity)
    pred[:, 0, 3] += rng_np.randn(n).cumsum() * 0.05

    result = evaluate_odometry(gt, pred, out_dir=str(tmp_path), seq_name="09")
    assert np.isfinite(result["t_err_percent"])
    for suffix in (
        "stats.txt", "seq_errors.txt", "xyz.png", "xyz.pdf", "rpy.png",
        "rpy.pdf", "path.png", "path.pdf", "path_3D.png", "path_3D.pdf",
        "error_seg.png", "error_speed.png",
    ):
        p = tmp_path / f"09_{suffix}"
        assert p.exists() and p.stat().st_size > 0, suffix
    # seq_errors devkit format: 5 columns per line
    lines = (tmp_path / "09_seq_errors.txt").read_text().splitlines()
    assert lines and all(len(l.split()) == 5 for l in lines)
