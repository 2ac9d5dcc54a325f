"""Synthetic model-input construction (for init, benches, compile checks)."""

from __future__ import annotations

import numpy as np

from tripled_tpu.config import ModelConfig
from tripled_tpu.models.registry import canonicalize


def kitti_intrinsics(batch: int, height: int, width: int) -> np.ndarray:
    K = np.tile(np.eye(4, dtype=np.float32), (batch, 1, 1))
    K[:, 0, 0] = 0.58 * width
    K[:, 1, 1] = 1.92 * height
    K[:, 0, 2] = 0.5 * width
    K[:, 1, 2] = 0.5 * height
    return K


def dummy_train_inputs(cfg: ModelConfig, batch: int, seed: int = 0) -> dict:
    """A full train-mode input dict for `cfg` (all optional keys present that
    the variant consumes), with fixed shapes derived from the config."""
    c = canonicalize(cfg)
    rng = np.random.RandomState(seed)
    f = len(c.frame_ids)
    h, w = c.height, c.width
    K = kitti_intrinsics(batch, h, w)
    inputs = {
        "color": rng.rand(batch, f, h, w, 3).astype(np.float32),
        "color_aug": rng.rand(batch, f, h, w, 3).astype(np.float32),
        "K": K,
        "inv_K": np.linalg.inv(K).astype(np.float32),
    }
    mask = np.ones((batch, h, w, 1), np.float32)
    eh, ew = max(h // 8, 2), max(w // 8, 2)
    mask[:, h // 4 : h // 4 + eh, w // 4 : w // 4 + ew] = 0.0
    inputs["mask"] = mask
    if "s" in c.frame_ids:
        T = np.tile(np.eye(4, dtype=np.float32), (batch, 1, 1))
        T[:, 0, 3] = 0.015
        inputs["stereo_T"] = T
    if c.map_pose:
        inputs["map_mask"] = (
            rng.rand(batch, f - 1, h, w, 1) > 0.5
        ).astype(np.float32)
        mp = np.zeros((batch, f - 1, 3), np.float32)
        mp[..., 0] = rng.randint(0, max(c.map_output, 1), (batch, f - 1))
        mp[..., 1:] = 0.5
        inputs["map_params"] = mp
    return inputs
