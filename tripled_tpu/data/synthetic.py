"""Synthetic mini-KITTI fixture: generates an on-disk KITTI-raw-shaped tree
(images + calib + velodyne + split files + gt_depths.npz) so the full
pipeline — loader, augmentation, training, Eigen evaluation — runs end-to-end
without the real dataset. This is the fake backend the reference never had
(SURVEY §4)."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def _render_frame(t: float, h: int, w: int, rng: np.random.RandomState) -> np.ndarray:
    """A toy translating scene: gradient sky + textured moving blocks."""
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [
            0.3 + 0.4 * y / h,
            0.4 + 0.2 * np.sin((x + 40 * t) / 7.0),
            0.5 + 0.3 * np.cos((y + x + 25 * t) / 11.0),
        ],
        axis=-1,
    )
    for k in range(3):
        cx = int((0.2 + 0.3 * k) * w + 30 * t) % w
        cy = int((0.3 + 0.2 * k) * h)
        s = max(4, h // 6)
        img[max(0, cy - s) : cy + s, max(0, cx - s) : cx + s] = [
            0.2 + 0.25 * k,
            0.8 - 0.2 * k,
            0.4,
        ]
    img += rng.rand(h, w, 3) * 0.02
    return np.clip(img, 0, 1)


def make_kitti_tree(
    root: str,
    num_frames: int = 8,
    height: int = 96,
    width: int = 320,
    date: str = "2011_09_26",
    drive: str = "2011_09_26_drive_0001_sync",
    seed: int = 0,
) -> dict:
    """Create the tree and return paths dict with split-file locations."""
    rng = np.random.RandomState(seed)
    scene = os.path.join(root, date, drive)
    for sub in ("image_02/data", "image_03/data", "velodyne_points/data"):
        os.makedirs(os.path.join(scene, sub), exist_ok=True)

    for i in range(num_frames):
        img = (_render_frame(i, height, width, rng) * 255).astype(np.uint8)
        for cam in ("image_02", "image_03"):
            Image.fromarray(img).save(
                os.path.join(scene, cam, "data", f"{i:010d}.png")
            )
        # sparse forward point cloud
        pts = np.zeros((256, 4), np.float32)
        pts[:, 0] = rng.uniform(3, 40, 256)   # forward
        pts[:, 1] = rng.uniform(-8, 8, 256)   # left
        pts[:, 2] = rng.uniform(-1.5, 1.5, 256)
        pts[:, 3] = 1.0
        pts.tofile(os.path.join(scene, "velodyne_points/data", f"{i:010d}.bin"))

    # calibration (identity-ish rectification, fx/fy from normalized KITTI K)
    fx, fy = 0.58 * width, 1.92 * height
    cx, cy = 0.5 * width, 0.5 * height
    date_dir = os.path.join(root, date)
    with open(os.path.join(date_dir, "calib_cam_to_cam.txt"), "w") as f:
        eye3 = "1 0 0 0 1 0 0 0 1"
        f.write(f"R_rect_00: {eye3}\n")
        f.write(f"S_rect_02: {width} {height}\n")
        for cam in (2, 3):
            f.write(
                f"P_rect_0{cam}: {fx} 0 {cx} 0 0 {fy} {cy} 0 0 0 1 0\n"
            )
    with open(os.path.join(date_dir, "calib_velo_to_cam.txt"), "w") as f:
        # velodyne (fwd,left,up) -> camera (right,down,fwd)
        f.write("R: 0 -1 0 0 0 -1 1 0 0\n")
        f.write("T: 0 0 0\n")
    with open(os.path.join(date_dir, "calib_imu_to_velo.txt"), "w") as f:
        f.write("R: 1 0 0 0 1 0 0 0 1\nT: 0 0 0\n")

    # split files
    splits = os.path.join(root, "splits", "synthetic")
    os.makedirs(splits, exist_ok=True)
    rel = f"{date}/{drive}"
    train_lines = [f"{rel} {i} l" for i in range(1, num_frames - 1)]
    val_lines = [f"{rel} {i} l" for i in range(1, num_frames - 1)]
    with open(os.path.join(splits, "train_files.txt"), "w") as f:
        f.write("\n".join(train_lines) + "\n")
    with open(os.path.join(splits, "val_files.txt"), "w") as f:
        f.write("\n".join(val_lines) + "\n")

    # synthetic GT depths at native res (plane + blocks, loosely matching)
    gt = []
    for i in range(1, num_frames - 1):
        y = np.linspace(1, 0.2, height)[:, None]
        d = 5.0 / np.maximum(y, 0.05)
        gt.append(np.broadcast_to(d, (height, width)).astype(np.float32))
    gt_path = os.path.join(root, "gt_depths.npz")
    np.savez_compressed(gt_path, data=np.asarray(gt, dtype=object))

    return {
        "root": root,
        "scene": rel,
        "splits_dir": os.path.join(root, "splits"),
        "train_split": os.path.join(splits, "train_files.txt"),
        "val_split": os.path.join(splits, "val_files.txt"),
        "gt_depth_path": gt_path,
        "height": height,
        "width": width,
        "num_frames": num_frames,
    }
