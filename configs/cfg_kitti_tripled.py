"""TripleDNet flagship: mono_fm_joint_inpaint_disentangle, R50, 320x1024,
disentangle last stage, auto_res 5e-3, 20 epochs (ref cfg_kitti_tripleD.py).

bs6/chip with encoder remat is the single-v5e sweet spot (778 imgs/s;
bs6 without remat and bs12 with remat both exceed HBM). The reference used
bs3 per GPU x 4 GPUs."""
from _common import kitti_experiment

config = kitti_experiment(
    "mono_fm_joint_inpaint_disentangle", depth_layers=50,
    height=320, width=1024, remat=True, batch_size=12, dataset="kitti_inpaint",
    erase_count=16, total_epochs=20, lr_steps=(10, 20),
    dis=1e-3, cvt=1e-3, perception_weight=1e-3, smoothness_weight=1e-3,
    auto_res_weight=5e-3,
    disentangle_layers=(False, False, False, False, True),
    skip_connection_multiplier=1.0,
    depth_disentangle_type="use_half",
)
