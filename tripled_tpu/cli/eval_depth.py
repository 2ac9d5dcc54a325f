"""KITTI Eigen depth evaluation CLI (`scripts/eval_depth.py` +
`eval_depth_pp.py` equivalents; --pp enables flip post-processing).

Usage:
  python -m tripled_tpu.cli.eval_depth --config configs/cfg_kitti_fm.py \
      --checkpoint work/fm/ckpt/epoch_40 --gt_path .../gt_depths.npz [--pp]
"""

from __future__ import annotations

import argparse
import dataclasses


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", default=None, help="Orbax checkpoint dir")
    p.add_argument("--torch_checkpoint", default=None,
                   help="reference .pth checkpoint (imported via torch_import)")
    p.add_argument("--gt_path", default=None)
    p.add_argument("--split_file", default=None)
    p.add_argument("--pp", action="store_true", help="flip post-processing")
    p.add_argument("--batch_size", type=int, default=8)
    args = p.parse_args()

    from tripled_tpu.config import load_config
    from tripled_tpu.data.get_dataset import get_dataset
    from tripled_tpu.eval.depth_metrics import METRIC_NAMES
    from tripled_tpu.eval.evaluator import DepthEvaluator
    from tripled_tpu.models.registry import build_model
    from tripled_tpu.train.optim import make_optimizer
    from tripled_tpu.train.state import create_train_state
    from tripled_tpu.train.step import make_predict_fn
    from tripled_tpu.train import checkpoint as ckpt

    cfg = load_config(args.config)
    if args.gt_path:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, gt_depth_path=args.gt_path)
        )
    dataset = get_dataset(cfg.data, training=False, split_file=args.split_file)

    import jax

    from tripled_tpu.utils.inputs import dummy_train_inputs

    model = build_model(cfg.model)
    tx, _ = make_optimizer(cfg.optim, steps_per_epoch=1)
    init_inputs = jax.device_put(dummy_train_inputs(cfg.model, batch=1))
    state = create_train_state(model, tx, init_inputs, seed=0)
    if args.torch_checkpoint:
        from tripled_tpu.utils.torch_import import import_reference_checkpoint

        v = import_reference_checkpoint(args.torch_checkpoint, state.variables)
        import dataclasses as _dc

        state = _dc.replace(
            state, params=v["params"],
            batch_stats=v.get("batch_stats", state.batch_stats),
        )
    elif args.checkpoint:
        state, _ = ckpt.restore_checkpoint(args.checkpoint, state)
    else:
        raise SystemExit("need --checkpoint or --torch_checkpoint")

    evaluator = DepthEvaluator(
        make_predict_fn(model),
        dataset,
        batch_size=args.batch_size,
        stereo_scale=cfg.data.stereo_scale,
        flip_post_process=args.pp,
    )
    metrics = evaluator.run(state.variables)
    print(
        "Scaling ratios | med: {:0.3f} | std: {:0.3f}".format(
            metrics["scale_ratio_med"], metrics["scale_ratio_std"]
        )
    )
    print(("{:>9}| " * 7).format(*METRIC_NAMES))
    print(("&{:.3f} " * 7).format(*[metrics[k] for k in METRIC_NAMES]) + "\\\\")
    print(f"eval fps: {metrics['eval_fps']:.2f}")


if __name__ == "__main__":
    main()
