"""Online refinement: resume mono_fm on the test sequence (ref cfg_kitti_fm_refine)."""
import dataclasses

from _common import kitti_experiment

config = kitti_experiment(
    "mono_fm", depth_layers=50, height=320, width=1024, remat=True, split="test",
    total_epochs=60, perception_weight=1e-3, smoothness_weight=1e-3,
)
