"""Segmentation evaluation CLI (`scripts/eval_segmentation.py` equivalent —
working, unlike the reference whose segmentation models are missing).

Usage:
  python -m tripled_tpu.cli.eval_segmentation --config configs/cfg_kitti_fm_joint_inpaint_segmentation.py \
      --checkpoint work/seg/ckpt/epoch_N [--model FixSegmentationDepth]
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--model", default="FixSegmentationDepth")
    p.add_argument("--num_classes", type=int, default=20)
    args = p.parse_args()

    import jax
    import numpy as np

    from tripled_tpu.config import load_config
    from tripled_tpu.data.seg_datasets import get_test_segmentation_dataset
    from tripled_tpu.eval.segmentation_metrics import SegmentationRunningScore
    from tripled_tpu.models.segmentation import build_segmentation_model
    from tripled_tpu.train import checkpoint as ckpt
    from tripled_tpu.train.optim import make_optimizer
    from tripled_tpu.train.state import create_train_state

    cfg = load_config(args.config)
    dataset = get_test_segmentation_dataset(cfg.data, val=False)
    model = build_segmentation_model(cfg.model, args.model, args.num_classes)

    rng = np.random.RandomState(0)
    sample = dataset.sample(0, rng)
    init_batch = {
        "image": sample["image"][None],
        "label": sample.get(
            "label", np.zeros(sample["image"].shape[:2], np.int32)
        )[None],
    }
    tx, _ = make_optimizer(cfg.optim, steps_per_epoch=1)
    state = create_train_state(model, tx, jax.device_put(init_batch), seed=0)
    state, _ = ckpt.restore_checkpoint(args.checkpoint, state)

    @jax.jit
    def predict(variables, image):
        return model.apply(variables, {"image": image}, train=False)

    scores = SegmentationRunningScore(args.num_classes)
    for i in range(len(dataset)):
        s = dataset.sample(i, rng)
        if "label" not in s:
            continue
        log_probs = np.asarray(predict(state.variables, s["image"][None]))
        pred = log_probs.argmax(-1)[0]
        scores.update(s["label"][None], pred[None])
    m = scores.get_scores()
    print(f" miou: {m['meaniou']:8.3f} | acc: {m['meanacc']:8.3f}", flush=True)


if __name__ == "__main__":
    main()
