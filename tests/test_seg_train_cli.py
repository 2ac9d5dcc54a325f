"""Segmentation training CLI end-to-end on a tiny synthetic KITTI-seg tree."""

import os
import sys

import numpy as np
from PIL import Image


def _make_seg_tree(root, n=10, h=64, w=96):
    img_dir = os.path.join(root, "training", "image_2")
    lab_dir = os.path.join(root, "training", "semantic")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        lab = rng.randint(0, 34, (h, w)).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, f"{i:06d}_10.png"))
        Image.fromarray(lab).save(os.path.join(lab_dir, f"{i:06d}_10.png"))
    return root


def test_train_segmentation_cli(tmp_path, monkeypatch):
    root = _make_seg_tree(str(tmp_path / "kitti_seg"))
    cfg_file = tmp_path / "cfg.py"
    cfg_file.write_text(
        "import dataclasses\n"
        "from tripled_tpu.config import DataConfig, ExperimentConfig, "
        "ModelConfig, OptimConfig\n"
        "config = ExperimentConfig(\n"
        "    model=ModelConfig(depth_num_layers=18, height=64, width=96),\n"
        f"    data=DataConfig(name='kitti', in_path={root!r}, height=64,\n"
        "                    width=96, batch_size=2),\n"
        "    optim=OptimConfig(total_epochs=1, warmup_iters=1),\n"
        f"    work_dir={str(tmp_path / 'work')!r},\n"
        "    log_interval=1,\n"
        ")\n"
    )
    monkeypatch.setattr(
        sys, "argv",
        ["train_segmentation", "--config", str(cfg_file),
         "--max_steps_per_epoch", "2", "--model", "BaseSegmentationDepth"],
    )
    from tripled_tpu.cli.train_segmentation import main

    main()
    assert os.path.exists(tmp_path / "work" / "ckpt" / "epoch_1")
    assert os.path.exists(tmp_path / "work" / "metrics.jsonl")
